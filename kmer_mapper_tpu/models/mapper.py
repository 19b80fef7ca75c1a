"""The flagship model: the end-to-end jittable k-mer mapping step.

One ``step`` consumes a fixed-shape chunk of framed reads (2-bit packed codes
+ uint16 read lengths) and folds its k-mer hits into the persistent per-slot
count state, entirely on device:

    packed codes -> unpack -> rolling (lo, hi) hash [-> revcomp hash]
                 -> window mask (ragged reads) -> probe + count

Two probe strategies (``MapperConfig.probe``):
  * ``"stream"`` (default on TPU) — sort queries by bucket and stream the
    table through a Pallas MXU kernel; no gathers/scatters (ops/stream_probe).
  * ``"gather"`` — per-round XLA row gathers + scatter-add accumulate
    (ops/probe); the CPU-fallback and pre-hashed-query path.

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
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..index.kmer_index import TpuKmerIndex
from ..ops import encode, hashing, probe, stream_probe

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    """Static (compile-time) configuration of the mapping step."""

    k: int = 31
    buf: int = 1 << 21  # chunk capacity in bases; multiple of 16
    max_reads: int = 1 << 15  # max reads per chunk
    revcomp: bool = False  # also count reverse complements (GPU-path -r flag)
    probe: str = "gather"  # "stream" | "gather"; default_config picks per backend
    accumulate: str = "scatter"  # gather-probe accumulator (see ops.probe)
    interpret: bool = False  # run Pallas kernels in interpreter mode (CPU)
    super_batch: int = 1  # chunks folded into one dispatch (lax.scan): amortizes
    # per-dispatch runtime latency without growing the per-chunk sort
    stream_cap: int = 0  # stream-kernel query tile size (0 = DEFAULT_CAP)
    group: int = 0  # adjacent chain blocks served by one widened one-hot tile
    # (0 = stream_probe.DEFAULT_GROUP). Measured negative at the default table
    # density (~1.6K queries/block), but large tables spread the same queries
    # over more blocks (under-filled tiles), where widening pays. Stream
    # probe only; mutually exclusive with aug > 1.
    aug: int = 1  # chain-augmentation width: the device table row for bucket b
    # also carries buckets b+1..b+aug-1 (wrapped in the chain block), so one
    # scheduled kernel round covers aug chain positions — most blocks then
    # need a single pass over their query window instead of one per chain
    # round (see stream_probe.py / layout.aug_keys). Stream probe only.
    streams: int = 1  # sorted query streams per kernel schedule (stream
    # probe): the chunk's queries split into S independently sorted segments
    # served by one tile schedule — XLA's flat sort is fastest below ~2^24
    # elements while the kernel's tile count per chunk is ~constant, so big
    # chunks keep the small-sort rate. The plane path splits its window
    # combos (plane_hash_mixed); the ragged step splits the query array
    # (stream_probe.mix_pad_segments); results are bit-identical either way.
    read_len: int = 0  # all reads have exactly this length (0 = ragged). With
    # fixed-length reads (the Illumina case) the k-1 invalid windows per read
    # form a static pattern, so the ~20% dead window slots are sliced away
    # before the sort instead of being masked through it — no window_mask, no
    # per-read cumsum. KmerMapper verifies each chunk and falls back to the
    # ragged step when a chunk does not match.

    def __post_init__(self):
        assert 1 <= self.k <= 31
        assert self.buf % encode.BASES_PER_WORD == 0
        assert self.probe in ("stream", "gather")
        assert self.accumulate in probe.ACCUMULATORS
        assert self.super_batch >= 1
        if self.stream_cap >= 128 and self.stream_cap % 128:
            raise ValueError("stream_cap must be a multiple of 128 (or < 128)")
        assert 1 <= self.aug <= 8
        assert self.aug == 1 or self.probe == "stream"
        assert self.group >= 0
        assert self.aug == 1 or self.group in (0, 1), (
            "chain augmentation requires group == 1"
        )
        if self.read_len:
            assert self.k <= self.read_len <= self.buf
            assert self.super_batch == 1, "read_len requires super_batch == 1"
        assert 1 <= self.streams <= 8
        assert self.streams == 1 or self.probe == "stream", (
            "streams > 1 requires the stream probe"
        )

    @property
    def packed_words(self) -> int:
        # buf bases plus up to 31 bases of window tail padding
        return self.buf // encode.BASES_PER_WORD + 2


def chunk_step(
    key_lo: jnp.ndarray,  # probe="stream": uint32[8, n_buckets] PLANE layout
    # (stream_probe.plane_keys); probe="gather": uint32[n_buckets, 8]
    key_hi: jnp.ndarray,
    counts: jnp.ndarray,  # uint32[n_slots] — donated; PLANE order
    # (stream_probe.slot_to_plane) on both probe paths
    packed: jnp.ndarray,  # uint32[packed_words] 2-bit codes
    lengths: jnp.ndarray,  # uint16[max_reads]; padding entries are 0
    n_bases: jnp.ndarray,  # int32 scalar
    *,
    config: MapperConfig,
    max_probe: int,
    seed: int,
    block_probe=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (counts', n_valid_windows uint32)."""
    k, buf = config.k, config.buf
    lo, hi = hashing.rolling_kmer_hash_packed(packed, k)  # buf windows exactly
    if config.read_len:
        # fixed-length reads at stride L: valid windows are a static pattern
        # (the first L-k+1 of each read's L positions) — slice them out
        # instead of sorting masked-off slots (~20% of the array at 151 bp)
        L = config.read_len
        R, W = buf // L, L - k + 1
        n_reads = n_bases // jnp.int32(L)
        lo = lo[: R * L].reshape(R, L)[:, :W].reshape(R * W)
        hi = hi[: R * L].reshape(R, L)[:, :W].reshape(R * W)
        valid = (
            lax.broadcasted_iota(jnp.int32, (R, W), 0) < n_reads
        ).reshape(R * W)
        n_valid = (n_reads * W).astype(jnp.uint32)
    else:
        lengths = lengths.astype(jnp.int32)
        starts = jnp.cumsum(lengths) - lengths  # exclusive prefix sum
        valid = hashing.window_mask(starts, n_bases, k, buf)
        n_valid = jnp.sum(valid.astype(jnp.uint32))
    if config.probe == "stream":
        # revcomp queries ride the same sort + single table sweep
        q_lo, q_hi, q_valid = lo, hi, valid
        if config.revcomp:
            rlo, rhi = hashing.revcomp_lo_hi(lo, hi, k)
            q_lo = jnp.concatenate([lo, rlo])
            q_hi = jnp.concatenate([hi, rhi])
            q_valid = jnp.concatenate([valid, valid])
        counts = stream_probe.stream_probe_count(
            key_lo, key_hi, counts, q_lo, q_hi, q_valid,
            seed, max_probe,
            cap=config.stream_cap or stream_probe.DEFAULT_CAP,
            interpret=config.interpret,
            block_probe=block_probe,
            group=config.group,
            streams=config.streams,
        )
    else:
        accumulate = probe.ACCUMULATORS[config.accumulate]

        gpb = stream_probe.plane_gpb(key_lo.shape[0])

        def probe_and_count(counts, q_lo, q_hi):
            bucket, mask = probe.probe_hits(key_lo, key_hi, q_lo, q_hi, max_probe, seed)
            return accumulate(counts, bucket, mask, valid, plane_gpb=gpb)

        counts = probe_and_count(counts, lo, hi)
        if config.revcomp:
            rlo, rhi = hashing.revcomp_lo_hi(lo, hi, k)
            counts = probe_and_count(counts, rlo, rhi)
    return counts, n_valid


def plane_chunk_step(
    key_lo: jnp.ndarray,
    key_hi: jnp.ndarray,
    counts: jnp.ndarray,  # donated
    packed: jnp.ndarray,  # uint32[packed_words], STRIDE-padded reads
    n_reads: jnp.ndarray,  # int32 scalar
    *,
    config: MapperConfig,
    max_probe: int,
    seed: int,
    block_probe=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-read-length fast step over stride-padded packing.

    Replaces ``chunk_step``'s rolling hash + window slice with
    ``hashing.plane_hash_mixed`` (contiguous word-plane shift/ORs; see its
    docstring for the measured win) when the chunk was packed with
    ``pack_for_device(..., read_len=L)``. Returns (counts', n_valid)."""
    assert config.probe == "stream" and config.read_len
    cap = config.stream_cap or stream_probe.DEFAULT_CAP
    seg_bounds = None
    if config.streams > 1:
        m_lo, m_hi, seg_bounds = hashing.plane_hash_mixed(
            packed, config.k, config.read_len, n_reads, seed, pad_to=cap,
            revcomp=config.revcomp, segments=config.streams,
        )
    else:
        m_lo, m_hi = hashing.plane_hash_mixed(
            packed, config.k, config.read_len, n_reads, seed, pad_to=cap,
            revcomp=config.revcomp,
        )
    counts = stream_probe.stream_probe_count_mixed(
        key_lo, key_hi, counts, m_lo, m_hi, max_probe,
        cap=cap, interpret=config.interpret, block_probe=block_probe,
        group=config.group, seg_bounds=seg_bounds,
    )
    W = config.read_len - config.k + 1
    n_valid = (n_reads * W).astype(jnp.uint32)
    return counts, n_valid


def make_plane_step(config: MapperConfig, max_probe: int, seed: int, block_probe=None):
    """Compile the stride-packed fixed-read-length step (counts donated)."""
    fn = functools.partial(
        plane_chunk_step, config=config, max_probe=max_probe, seed=seed,
        block_probe=block_probe,
    )
    return jax.jit(fn, donate_argnums=(2,))


def make_step(config: MapperConfig, max_probe: int, seed: int, block_probe=None):
    """Compile the chunk step; count state donated for in-place accumulation.

    With ``config.super_batch > 1`` the step takes stacked inputs
    (packed[S, W], lengths[S, R], n_bases[S]) and scans the per-chunk step
    inside one executable, returning per-chunk n_valid[S]."""
    fn = functools.partial(
        chunk_step, config=config, max_probe=max_probe, seed=seed,
        block_probe=block_probe,
    )
    if config.super_batch == 1:
        return jax.jit(fn, donate_argnums=(2,))

    def scanned(key_lo, key_hi, counts, packed_s, lengths_s, n_bases_s):
        def body(counts, xs):
            packed, lengths, n_bases = xs
            counts, n_valid = fn(key_lo, key_hi, counts, packed, lengths, n_bases)
            return counts, n_valid

        return jax.lax.scan(body, counts, (packed_s, lengths_s, n_bases_s))

    return jax.jit(scanned, donate_argnums=(2,))


def auto_stream_cap(
    buf: int,
    n_buckets: int,
    read_len: int = 0,
    k: int = 31,
    valid_frac: float | None = None,
    streams: int = 1,
    group: int = 1,
) -> int:
    """Stream-kernel tile size fitted to the expected queries per chain
    block, times 1.40. The plane-layout kernel's CSE-free v5e sweep
    (scripts/r9_cfg_sweep.py: 64 Mi chunks, 8192 blocks, S=4, per-block
    mean ~1640) measured 355/378/406/400/391/352 Mkmers/s at caps
    1792/2048/2304/2560/2816/3072 — a sharp optimum at ~1.40x the mean.
    (The pre-plane kernel peaked at 1.05x with an 8192-lane S*cap VMEM
    ceiling; the compact plane layout freed VMEM and moved both. Round-3
    16 Mi sweep for reference: 272/292/286/254 at 1024/1792/2048/4096.)

    ``buf`` is the query-slot count before invalid-window thinning;
    ``valid_frac`` overrides the expected valid fraction (1.0 for pre-hashed
    query batches where every slot is a real query). ``group > 1`` (widened
    tiles on huge tables) makes each tile serve that many chain blocks, so
    the cap fits the per-GROUP query mean."""
    n_blocks = max(1, n_buckets // (128 * max(1, group)))
    if valid_frac is None:
        valid_frac = (read_len - k + 1) / read_len if read_len > k else 0.8
    mean_q = buf * valid_frac / n_blocks
    cap = int(np.ceil(mean_q * 1.40 / 128.0)) * 128
    # multi-stream tiles are streams*cap lanes wide and the kernel's VMEM
    # intermediates scale with that width — bound the TOTAL at 10240 lanes
    # (12288 still compiles on the plane kernel but is past the measured
    # falloff; the pre-plane padded kernel OOMed scoped VMEM above 8192)
    ceiling = max(128, (10240 // streams) // 128 * 128)
    return max(min(512, ceiling), min(ceiling, cap))


def chunk_is_fixed(lengths, n_bases, read_len: int) -> bool:
    """True iff the chunk is exactly n whole reads of ``read_len`` (so the
    fixed-stride window slicing in chunk_step is valid). Shared by the
    single-chip and sharded mappers' fast-path checks."""
    nb = int(n_bases)
    if nb % read_len:
        return False
    n = nb // read_len
    lengths = np.asarray(lengths)
    return bool(np.all(lengths[:n] == read_len)) and not np.any(lengths[n:])


def default_config(**kwargs) -> MapperConfig:
    """MapperConfig with backend-appropriate defaults: the stream kernel runs
    compiled on TPU and in interpreter mode elsewhere (CPU tests/fallback)."""
    on_tpu = jax.default_backend() == "tpu"
    kwargs.setdefault("probe", "stream" if on_tpu else "gather")
    if kwargs["probe"] == "stream":
        kwargs.setdefault("interpret", not on_tpu)
        # aug stays 1: chain augmentation measured NEGATIVE on v5e at every
        # density (283.7 vs 303.5 Mk/s at the default load's lambda=2.6 —
        # chains are too rare to repay the wider per-tile compare — and
        # 240-242 vs 296 on a dense lambda=5.15/max_probe=15 table even
        # though augmentation is what makes such tables streamable at all).
        # Use aug>=2 explicitly to stream deep-chain (max_probe > 8) tables.
        # stream_cap stays 0 here: KmerMapper auto-sizes it per index (the
        # optimum tracks the mean queries per chain block — see auto_stream_cap)
    # super_batch deliberately stays 1: measured on v5e, folding chunks into a
    # lax.scan costs ~15-20% (carry handling) — larger buffers amortize better
    return MapperConfig(**kwargs)


class KmerMapper:
    """Device-resident mapper: index table on device + streaming accumulation.

    Programmatic equivalent of the reference's ``map_bnp`` inner loop; feed
    packed chunks via :meth:`map_chunk`, then :meth:`node_counts`. The feed
    path never blocks on the device (async dispatch), so host framing overlaps
    device compute.
    """

    def __init__(self, index: TpuKmerIndex, config: MapperConfig, device=None):
        self.index = index
        if config.probe == "stream" and config.aug == 1 and not config.group:
            # human-scale tables run group=2: per-block windows are so thin
            # (~400 queries/block at 128 Mi) that round-slack tiles dominate
            # the schedule, and pairing chain blocks halves them for less
            # than the taller tile body costs (150M-key drill, 128 Mi S=1:
            # group=1/2/4 = 158.0/160.7/126.9 Mk/s, r8_scale_drill.py)
            if index.table.n_buckets >= stream_probe.HUMAN_SCALE_BUCKETS:
                config = dataclasses.replace(config, group=2)
        if config.probe == "stream" and config.aug == 1:
            # with self-contained schedule entries this is 1 through ~400M
            # buckets; kept so truly extreme tables widen groups to the
            # smallest feasible power of two instead of failing (the tile
            # then serves `group` adjacent chain blocks; bit-identical)
            needed = stream_probe.min_feasible_group(
                index.table.n_buckets, streams=config.streams
            )
            if needed > max(1, config.group):
                logger.info(
                    "huge table (%d buckets): widening stream-kernel groups "
                    "to %d chain blocks so the schedule fits SMEM",
                    index.table.n_buckets, needed,
                )
                config = dataclasses.replace(config, group=needed)
        if config.probe == "stream" and not config.stream_cap:
            # with multi-stream tiles the tile width serves ONE stream's
            # per-block share, so the cap fits buf/streams worth of queries
            config = dataclasses.replace(
                config,
                stream_cap=auto_stream_cap(
                    config.buf // config.streams, index.table.n_buckets,
                    config.read_len, config.k, streams=config.streams,
                    group=max(1, config.group),
                ),
            )
        self.config = config
        put = functools.partial(jax.device_put, device=device)
        # device counts are flat PLANE order on both probe paths, blocked by
        # gpb = group * chain block (zeros are order-agnostic;
        # slot_counts()/load_state translate at the edges)
        self._gpb = stream_probe.plane_gpb(
            index.table.n_buckets,
            max(1, config.group) if config.probe == "stream" else 1,
        )
        if config.probe == "stream":
            # the stream kernel consumes the PLANE layout ((n, 8) pads 16x
            # on TPU; see stream_probe.plane_keys) with chain augmentation
            # folded in; the (n, 8) arrays the gather/membership probes read
            # are materialized lazily
            if config.aug > 1:
                aug_lo, aug_hi = index.table.aug_keys(config.aug)
            else:
                aug_lo, aug_hi = index.table.key_lo, index.table.key_hi
            p_lo, p_hi = stream_probe.plane_keys(
                aug_lo, aug_hi, group=max(1, config.group)
            )
            self.key_lo = put(p_lo)
            self.key_hi = put(p_hi)
            self._plain = None
        else:
            self.key_lo = put(index.table.key_lo)
            self.key_hi = put(index.table.key_hi)
            self._plain = (self.key_lo, self.key_hi)
        self.counts = put(jnp.zeros(index.table.n_slots, dtype=jnp.uint32))
        block_probe = (
            index.table.block_max_probe() if config.probe == "stream" else None
        )
        self._step = make_step(
            config, index.table.max_probe, index.table.seed, block_probe
        )
        # stride-packed fast step (pack_for_device(read_len=L) buffers); jit
        # is lazy so this compiles only if strided chunks actually arrive
        self._plane_step = (
            make_plane_step(
                config, index.table.max_probe, index.table.seed, block_probe
            )
            if config.probe == "stream" and config.read_len
            else None
        )
        self._ragged_step = None  # lazy twin for chunks that break read_len
        self._stats: list[jnp.ndarray] = []  # per-chunk n_valid device scalars
        self._pending: list = []  # host-buffered chunks awaiting a super-batch
        self._total_kmers = 0
        self.n_invalid_bases = 0
        self._device = device
        self._hash_steps: dict = {}  # padded-length -> jitted map_hashes step

    def _chunk_is_fixed(self, lengths, n_bases: int) -> bool:
        return chunk_is_fixed(lengths, n_bases, self.config.read_len)

    def reset_counts(self) -> None:
        """Zero the accumulated state so one device-resident table can serve
        repeated library calls without a rebuild (KAGE calls
        ``map_kmers_to_graph_index`` per batch, ``mapper.pyx:19``)."""
        self.flush()
        self.counts = jax.device_put(
            jnp.zeros(self.index.table.n_slots, dtype=jnp.uint32), device=self._device
        )
        self._stats = []
        self._total_kmers = 0
        self.n_invalid_bases = 0

    def map_chunk(
        self,
        packed: np.ndarray,
        lengths: np.ndarray,
        n_bases: int,
        n_invalid: int = 0,
        strided: bool = False,
    ) -> None:
        """Fold one packed chunk into the count state.

        ``strided=True`` marks a buffer packed by ``pack_for_device(...,
        read_len=L)`` with every read padded to ``hashing.read_stride(L)``
        bases (all reads exactly L long, ``n_bases`` = L * n_reads): it takes
        the word-plane fast step. Continuous buffers (default) take the
        interleaved-hash step as before."""
        self.n_invalid_bases += n_invalid
        if strided:
            assert self._plane_step is not None, (
                "strided chunks require probe='stream' and config.read_len"
            )
            assert self.config.super_batch == 1
            n_reads = n_bases // self.config.read_len
            self.counts, n_valid = self._plane_step(
                self.key_lo,
                self.key_hi,
                self.counts,
                jnp.asarray(packed),
                jnp.int32(n_reads),
            )
            self._stats.append(n_valid)
            return
        if self.config.super_batch == 1:
            step = self._step
            if self.config.read_len and not self._chunk_is_fixed(lengths, n_bases):
                # a chunk with off-length reads (mixed-length file, split long
                # reads, ...) takes the ragged step; results are identical
                if self._ragged_step is None:
                    # streams carries over: the ragged step segments the
                    # query array itself (stream_probe.mix_pad_segments)
                    cfg = dataclasses.replace(self.config, read_len=0)
                    self._ragged_step = make_step(
                        cfg,
                        self.index.table.max_probe,
                        self.index.table.seed,
                        self.index.table.block_max_probe()
                        if cfg.probe == "stream"
                        else None,
                    )
                step = self._ragged_step
            self.counts, n_valid = step(
                self.key_lo,
                self.key_hi,
                self.counts,
                jnp.asarray(packed),
                jnp.asarray(lengths),
                jnp.int32(n_bases),
            )
            self._stats.append(n_valid)
            return
        self._pending.append((packed, lengths, np.int32(n_bases)))
        if len(self._pending) == self.config.super_batch:
            self._dispatch_pending()

    def _dispatch_pending(self) -> None:
        if not self._pending:
            return
        s = self.config.super_batch
        packed_s = np.zeros((s, self.config.packed_words), dtype=np.uint32)
        lengths_s = np.zeros((s, self.config.max_reads), dtype=np.uint16)
        n_bases_s = np.zeros(s, dtype=np.int32)
        for i, (p, ln, nb) in enumerate(self._pending):
            packed_s[i], lengths_s[i], n_bases_s[i] = p, ln, nb
        self._pending = []
        self.counts, n_valid = self._step(
            self.key_lo,
            self.key_hi,
            self.counts,
            jnp.asarray(packed_s),
            jnp.asarray(lengths_s),
            jnp.asarray(n_bases_s),
        )
        self._stats.append(jnp.sum(n_valid))

    def flush(self) -> None:
        """Dispatch any buffered sub-batch (padded with empty chunks)."""
        self._dispatch_pending()

    @property
    def n_kmers_mapped(self) -> int:
        self.flush()
        if self._stats:
            # one stacked transfer (per-scalar fetches cost an RTT each)
            fetched = jax.device_get(jnp.stack(self._stats))
            self._total_kmers += int(np.asarray(fetched, dtype=np.uint64).sum())
            self._stats = []
        return self._total_kmers

    # below this, the sort+stream path's fixed costs beat the gather probe
    STREAM_HASH_MIN = 1 << 17

    def map_hashes(self, kmers: np.ndarray) -> None:
        """Count pre-computed uint64 kmer hashes (library API parity with
        ``map_kmers_to_graph_index`` / ``counter.count``).

        Large batches on TPU ride the sort+stream kernel (the gather probe
        tops out ~15 Mkmers/s vs >100 for the stream path); lengths are padded
        to powers of two so repeated calls reuse a few compiled steps."""
        from ..ops.u32hash import split_u64

        kmers = np.asarray(kmers, dtype=np.uint64)
        n = len(kmers)
        lo, hi = split_u64(kmers)
        table = self.index.table
        # compiled stream kernel on TPU; interpret-mode configs (CPU tests)
        # can exercise the same branch. Gather-mode mappers keep the gather
        # probe (their key arrays are in the row layout, not the kernel's
        # plane layout).
        stream_ok = self.config.probe == "stream" and (
            jax.default_backend() == "tpu" or self.config.interpret
        )
        if n >= self.STREAM_HASH_MIN and stream_ok:
            npad = 1 << max(0, (n - 1)).bit_length()
            valid = np.zeros(npad, dtype=bool)
            valid[:n] = True
            step = self._hash_steps.get(npad)
            if step is None:
                block_probe = self.index.table.block_max_probe()
                # batches past the XLA sort cliff (~2^24 elements) sort as
                # ~16Mi segments served by multi-stream kernel tiles, like
                # the chunk paths (see MapperConfig.streams)
                streams = max(1, min(8, npad >> 24))

                def run(key_lo, key_hi, counts, q_lo, q_hi, q_valid):
                    return stream_probe.stream_probe_count(
                        key_lo, key_hi, counts, q_lo, q_hi, q_valid,
                        table.seed, table.max_probe, block_probe=block_probe,
                        cap=auto_stream_cap(
                            npad // streams, table.n_buckets,
                            valid_frac=1.0, streams=streams,
                            group=max(1, self.config.group),
                        ),
                        interpret=self.config.interpret,
                        streams=streams,
                        group=self.config.group,
                    )

                step = self._hash_steps[npad] = jax.jit(run, donate_argnums=(2,))
            self.counts = step(
                self.key_lo,
                self.key_hi,
                self.counts,
                jnp.asarray(np.pad(lo, (0, npad - n))),
                jnp.asarray(np.pad(hi, (0, npad - n))),
                jnp.asarray(valid),
            )
            self._stats.append(jnp.uint32(n))
            return
        plain_lo, plain_hi = self._plain_keys()
        bucket, mask = probe.probe_hits(
            plain_lo,
            plain_hi,
            jnp.asarray(lo),
            jnp.asarray(hi),
            table.max_probe,
            table.seed,
        )
        acc = probe.ACCUMULATORS[self.config.accumulate]
        self.counts = acc(
            self.counts, bucket, mask, jnp.ones(len(lo), dtype=bool),
            plane_gpb=self._gpb,
        )
        self._stats.append(jnp.uint32(len(lo)))

    def in_index(self, kmers: np.ndarray) -> np.ndarray:
        """Membership per uint64 kmer hash, uint8[n] (no frequency filter) —
        parity with the reference's ``in_graph_index``
        (``kmer_mapper/mapper.pyx:81-130``), on device."""
        from ..ops.u32hash import split_u64

        lo, hi = split_u64(np.asarray(kmers, dtype=np.uint64))
        table = self.index.table
        plain_lo, plain_hi = self._plain_keys()
        slots = probe.probe_slots(
            plain_lo,
            plain_hi,
            jnp.asarray(lo),
            jnp.asarray(hi),
            table.max_probe,
            table.seed,
        )
        return np.asarray(jax.device_get(slots >= 0)).astype(np.uint8)

    def _plain_keys(self):
        """Un-augmented key arrays for the gather/membership probes (the step
        arrays may be chain-augmented, which the gather probe does not read)."""
        if self._plain is None:
            self._plain = (
                jax.device_put(self.index.table.key_lo, device=self._device),
                jax.device_put(self.index.table.key_hi, device=self._device),
            )
        return self._plain

    def save_state(self, path) -> None:
        """Checkpoint the accumulated counts + totals (resume long runs)."""
        np.savez(
            path,
            counts=self.slot_counts(),
            n_kmers=np.int64(self.n_kmers_mapped),
            n_invalid=np.int64(self.n_invalid_bases),
        )

    def load_state(self, path) -> None:
        with np.load(path, allow_pickle=False) as data:
            # checkpoints store the external slot order; the device buffer
            # lives in plane order (see __init__)
            self.counts = jax.device_put(
                stream_probe.slot_to_plane(
                    data["counts"], self.index.table.n_buckets, self._gpb
                )
            )
            self._stats = []
            self._pending = []
            self._total_kmers = int(data["n_kmers"])
            self.n_invalid_bases = int(data["n_invalid"])

    def slot_counts(self) -> np.ndarray:
        self.flush()
        return stream_probe.plane_to_slot(
            np.asarray(jax.device_get(self.counts)),
            self.index.table.n_buckets,
            self._gpb,
        )

    def node_counts(self, max_frequency: int = 1000) -> np.ndarray:
        """Final per-node hit counts, uint32[max_node_id + 1]."""
        return self.index.node_counts(self.slot_counts(), max_frequency=max_frequency)

    def kmer_counts(self) -> tuple[np.ndarray, np.ndarray]:
        """Counter view: (unique_kmers, counts) — CounterKmerIndex parity."""
        return self.index.kmer_counts(self.slot_counts())
