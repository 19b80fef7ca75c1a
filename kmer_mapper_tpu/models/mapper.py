"""The flagship model: the end-to-end jittable k-mer mapping step.

One ``step`` consumes a fixed-shape chunk of framed reads (2-bit packed codes
+ uint16 read lengths) and folds its k-mer hits into the persistent per-slot
count state, entirely on device:

    packed codes -> unpack -> rolling (lo, hi) hash [-> revcomp hash]
                 -> window mask (ragged reads) -> cuckoo probe (2 row gathers)
                 -> count accumulate

The table ("weights") and the counts ("optimizer state") are device-resident;
the count buffer is donated so accumulation is in-place. All shapes are static,
so the step compiles once per run, and nothing in the hot loop synchronizes
with the host — per-chunk statistics are tiny device scalars fetched only at
finalization. This is the XLA analog of the reference's per-chunk worker
``map_cpu`` (``kmer_mapper/command_line_interface.py:32-56``) and GPU loop
``map_gpu`` (``:59-79``).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..index.kmer_index import TpuKmerIndex
from ..ops import encode, hashing, probe


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    """Static (compile-time) configuration of the mapping step."""

    k: int = 31
    buf: int = 1 << 21  # chunk capacity in bases; multiple of 16
    max_reads: int = 1 << 15  # max reads per chunk
    revcomp: bool = False  # also count reverse complements (GPU-path -r flag)
    accumulate: str = "scatter"  # see ops.probe.ACCUMULATORS

    def __post_init__(self):
        assert 1 <= self.k <= 31
        assert self.buf % encode.BASES_PER_WORD == 0
        assert self.accumulate in probe.ACCUMULATORS

    @property
    def packed_words(self) -> int:
        # buf bases plus up to 31 bases of window tail padding
        return self.buf // encode.BASES_PER_WORD + 2


def chunk_step(
    rows: jnp.ndarray,  # uint32[n_buckets, 8] cuckoo table
    counts: jnp.ndarray,  # uint32[n_slots] — donated
    packed: jnp.ndarray,  # uint32[packed_words] 2-bit codes
    lengths: jnp.ndarray,  # uint16[max_reads]; padding entries are 0
    n_bases: jnp.ndarray,  # int32 scalar
    *,
    config: MapperConfig,
    seed1: int,
    seed2: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (counts', n_valid_windows uint32)."""
    k, buf = config.k, config.buf
    codes = encode.unpack_codes(packed)[: buf + k]
    lengths = lengths.astype(jnp.int32)
    starts = jnp.cumsum(lengths) - lengths  # exclusive prefix sum
    valid = hashing.window_mask(starts, n_bases, k, buf)
    n_valid = jnp.sum(valid.astype(jnp.uint32))
    accumulate = probe.ACCUMULATORS[config.accumulate]

    def probe_and_count(counts, q_lo, q_hi):
        bucket, mask = probe.probe_hits(rows, q_lo, q_hi, seed1, seed2)
        return accumulate(counts, bucket, mask, valid)

    lo, hi = hashing.rolling_kmer_hash(codes, k)
    counts = probe_and_count(counts, lo, hi)
    if config.revcomp:
        rlo, rhi = hashing.rolling_revcomp_hash(codes, k)
        counts = probe_and_count(counts, rlo, rhi)
    return counts, n_valid


def make_step(config: MapperConfig, seed1: int, seed2: int):
    """Compile the chunk step; count state donated for in-place accumulation."""
    fn = functools.partial(chunk_step, config=config, seed1=seed1, seed2=seed2)
    return jax.jit(fn, donate_argnums=(1,))


class KmerMapper:
    """Device-resident mapper: index table on device + streaming accumulation.

    Programmatic equivalent of the reference's ``map_bnp`` inner loop; feed
    packed chunks via :meth:`map_chunk`, then :meth:`node_counts`. The feed
    path never blocks on the device (async dispatch), so host framing overlaps
    device compute.
    """

    def __init__(self, index: TpuKmerIndex, config: MapperConfig, device=None):
        self.index = index
        self.config = config
        put = functools.partial(jax.device_put, device=device)
        self.rows = put(index.table.rows)
        self.counts = put(jnp.zeros(index.table.n_slots, dtype=jnp.uint32))
        self._step = make_step(config, index.table.seed1, index.table.seed2)
        self._stats: list[jnp.ndarray] = []  # per-chunk n_valid device scalars
        self._total_kmers = 0
        self.n_invalid_bases = 0

    def map_chunk(
        self, packed: np.ndarray, lengths: np.ndarray, n_bases: int, n_invalid: int = 0
    ) -> None:
        self.counts, n_valid = self._step(
            self.rows,
            self.counts,
            jnp.asarray(packed),
            jnp.asarray(lengths),
            jnp.int32(n_bases),
        )
        self._stats.append(n_valid)
        self.n_invalid_bases += n_invalid

    @property
    def n_kmers_mapped(self) -> int:
        if self._stats:
            self._total_kmers += sum(int(x) for x in jax.device_get(self._stats))
            self._stats = []
        return self._total_kmers

    def map_hashes(self, kmers: np.ndarray) -> None:
        """Count pre-computed uint64 kmer hashes (library API parity with
        ``map_kmers_to_graph_index`` / ``counter.count``)."""
        from ..ops.u32hash import split_u64

        lo, hi = split_u64(np.asarray(kmers, dtype=np.uint64))
        bucket, mask = probe.probe_hits(
            self.rows,
            jnp.asarray(lo),
            jnp.asarray(hi),
            self.index.table.seed1,
            self.index.table.seed2,
        )
        acc = probe.ACCUMULATORS[self.config.accumulate]
        self.counts = acc(self.counts, bucket, mask, jnp.ones(len(lo), dtype=bool))
        self._stats.append(jnp.uint32(len(lo)))

    def slot_counts(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.counts))

    def node_counts(self, max_frequency: int = 1000) -> np.ndarray:
        """Final per-node hit counts, uint32[max_node_id + 1]."""
        return self.index.node_counts(self.slot_counts(), max_frequency=max_frequency)

    def kmer_counts(self) -> tuple[np.ndarray, np.ndarray]:
        """Counter view: (unique_kmers, counts) — CounterKmerIndex parity."""
        return self.index.kmer_counts(self.slot_counts())
