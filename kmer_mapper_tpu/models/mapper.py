"""The flagship model: the end-to-end jittable k-mer mapping step.

One ``step`` consumes a fixed-shape chunk of framed reads (ASCII bytes + read
start offsets) and folds its k-mer hits into the persistent per-slot count
state, entirely on device:

    ASCII -> 2-bit encode -> rolling (lo, hi) hash [-> revcomp hash]
          -> window mask (ragged reads) -> bucket probe -> count accumulate

The table ("weights") and the counts ("optimizer state") are device-resident;
the count buffer is donated so accumulation is in-place. All shapes are static,
so the step compiles once and is reused for every chunk of a run — the XLA
analog of the reference's per-chunk worker ``map_cpu``
(``kmer_mapper/command_line_interface.py:32-56``) and GPU loop ``map_gpu``
(``:59-79``).
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
    buf: int = 1 << 21  # chunk capacity in bases
    max_reads: int = 1 << 16  # max reads per chunk
    revcomp: bool = False  # also count reverse complements (GPU-path -r flag)
    accumulate: str = "scatter"  # "scatter" | "sorted"

    def __post_init__(self):
        assert 1 <= self.k <= 31
        assert self.accumulate in probe.ACCUMULATORS


def chunk_step(
    key_lo: jnp.ndarray,
    key_hi: jnp.ndarray,
    counts: jnp.ndarray,  # uint32[n_slots] — donated
    ascii_buf: jnp.ndarray,  # uint8[buf + k] (padded past buf with any valid base)
    read_starts: jnp.ndarray,  # int32[max_reads]; padding entries >= buf + k
    n_bases: jnp.ndarray,  # int32 scalar
    *,
    config: MapperConfig,
    max_probe: int,
    seed: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (counts', n_valid_windows uint32, n_invalid_bases uint32)."""
    k, buf = config.k, config.buf
    codes, invalid = encode.encode_bases(ascii_buf)
    n_invalid = jnp.sum(
        jnp.where(jnp.arange(buf + k) < n_bases, invalid.astype(jnp.uint32), 0)
    )
    lo, hi = hashing.rolling_kmer_hash(codes, k)
    valid = hashing.window_mask(read_starts, n_bases, k, buf)
    n_valid = jnp.sum(valid.astype(jnp.uint32))
    accumulate = probe.ACCUMULATORS[config.accumulate]
    slots = probe.probe_slots(key_lo, key_hi, lo, hi, max_probe, seed)
    counts = accumulate(counts, slots, valid)
    if config.revcomp:
        rlo, rhi = hashing.rolling_revcomp_hash(codes, k)
        rslots = probe.probe_slots(key_lo, key_hi, rlo, rhi, max_probe, seed)
        counts = accumulate(counts, rslots, valid)
    return counts, n_valid, n_invalid


def make_step(config: MapperConfig, max_probe: int, seed: int):
    """Compile the chunk step; count state donated for in-place accumulation."""
    fn = functools.partial(chunk_step, config=config, max_probe=max_probe, seed=seed)
    return jax.jit(fn, donate_argnums=(2,))


class KmerMapper:
    """Device-resident mapper: index table on device + streaming accumulation.

    Programmatic equivalent of the reference's ``map_bnp`` inner loop; feed
    framed chunks via :meth:`map_chunk`, then :meth:`node_counts`.
    """

    def __init__(self, index: TpuKmerIndex, config: MapperConfig, device=None):
        self.index = index
        self.config = config
        put = functools.partial(jax.device_put, device=device)
        self.key_lo = put(index.table.key_lo)
        self.key_hi = put(index.table.key_hi)
        self.counts = put(jnp.zeros(index.table.n_slots, dtype=jnp.uint32))
        self._step = make_step(config, index.table.max_probe, index.table.seed)
        self.n_kmers_mapped = 0
        self.n_invalid_bases = 0

    def map_chunk(
        self, ascii_buf: np.ndarray, read_starts: np.ndarray, n_bases: int
    ) -> None:
        self.counts, n_valid, n_invalid = self._step(
            self.key_lo,
            self.key_hi,
            self.counts,
            jnp.asarray(ascii_buf),
            jnp.asarray(read_starts),
            jnp.int32(n_bases),
        )
        # scalars are tiny; fetching them keeps host-side totals without sync
        # pressure (jax is async — these block only on this chunk's completion)
        self.n_kmers_mapped += int(n_valid)
        self.n_invalid_bases += int(n_invalid)

    def map_hashes(self, kmers: np.ndarray) -> None:
        """Count pre-computed uint64 kmer hashes (library API parity with
        ``map_kmers_to_graph_index`` / ``counter.count``)."""
        from ..ops.u32hash import split_u64

        lo, hi = split_u64(np.asarray(kmers, dtype=np.uint64))
        slots = probe.probe_slots(
            self.key_lo,
            self.key_hi,
            jnp.asarray(lo),
            jnp.asarray(hi),
            self.index.table.max_probe,
            self.index.table.seed,
        )
        acc = probe.ACCUMULATORS[self.config.accumulate]
        self.counts = acc(self.counts, slots, jnp.ones(len(lo), dtype=bool))
        self.n_kmers_mapped += len(lo)

    def slot_counts(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.counts))

    def node_counts(self, max_frequency: int = 1000) -> np.ndarray:
        """Final per-node hit counts, uint32[max_node_id + 1]."""
        return self.index.node_counts(self.slot_counts(), max_frequency=max_frequency)

    def kmer_counts(self) -> tuple[np.ndarray, np.ndarray]:
        """Counter view: (unique_kmers, counts) — CounterKmerIndex parity."""
        return self.index.kmer_counts(self.slot_counts())
