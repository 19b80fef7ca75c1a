"""End-to-end mapping pipeline: file -> framed chunks -> device step -> node counts.

The driver equivalent of the reference's ``map_bnp``
(``kmer_mapper/command_line_interface.py:82-152``), restructured for TPU:

* The reference's process-pool + POSIX-shared-memory map-reduce
  (``additative_shared_array_map_reduce``, ``:124-130``) becomes a host
  producer thread (read + frame + pack into fixed-shape pinned buffers) feeding
  an asynchronously-dispatched jitted device step through a bounded queue —
  the same producer/consumer backpressure (queue_size_factor) without IPC,
  since the "reduce" is an on-device accumulator.
* All shapes are static, so the step compiles once and chunk N+1's host work
  overlaps chunk N's device work (JAX dispatch is async).
"""
from __future__ import annotations

import logging
import os
import queue
import threading
import time
from typing import Iterable, Iterator

import numpy as np

from .index.kmer_index import TpuKmerIndex, load_index
from .io import readers
from .models.mapper import KmerMapper, MapperConfig, chunk_is_fixed, default_config
from .utils.timing import log_memory_usage_now, span

logger = logging.getLogger(__name__)

#: rough size multiplier for progress estimation of gzipped input
#: (reference heuristic, command_line_interface.py:92-93)
GZIP_EXPANSION = 6.5


def _producer(chunk_iter: Iterator, out_queue: queue.Queue, stop: threading.Event):
    try:
        for item in chunk_iter:
            while not stop.is_set():
                try:
                    out_queue.put(item, timeout=0.2)
                    break
                except queue.Full:
                    continue
            if stop.is_set():
                return
        out_queue.put(None)
    except BaseException as exc:  # surface reader errors on the consumer side
        out_queue.put(exc)


def prefetch(iterator: Iterator, depth: int = 4) -> Iterator:
    """Run an iterator in a background thread with bounded lookahead
    (the host-side analog of the reference's queue_size_factor backpressure)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    thread = threading.Thread(target=_producer, args=(iterator, q, stop), daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def map_file(
    index: TpuKmerIndex | str,
    reads_path: str,
    k: int = 31,
    chunk_size: int = 2_500_000,
    max_frequency: int = 1000,
    map_reverse_complements: bool = False,
    accumulate: str = "scatter",
    queue_depth: int = 4,
    progress: bool = True,
    device=None,
    strict_bases: bool = False,
    profile_dir: str | None = None,
    reader_workers: int = 1,
) -> np.ndarray:
    """Map all k-mers of a FASTA/FASTQ(.gz) file against the index; returns the
    per-node hit-count vector (uint32[max_node_id+1]).

    CLI/driver parity: ``map_bnp`` (``command_line_interface.py:82-152``).
    With ``strict_bases`` any non-ACGTN base raises (bionumpy's DNAEncoding
    behavior, SURVEY §3.4); the default encodes them as A with a warning.
    ``profile_dir`` captures a ``jax.profiler`` device trace of the mapping
    loop (one step annotation per chunk) viewable in TensorBoard/Perfetto —
    the structured upgrade of the reference's DEBUG perf_counter spans.
    ``reader_workers`` frames uncompressed input with that many parallel
    host workers (the reference's ``-t``; see ``io/parallel_reader.py``)."""
    t_start = time.perf_counter()
    index = load_index(index)
    mapper, packed = make_mapper_and_chunks(
        index,
        reads_path,
        k=k,
        chunk_size=chunk_size,
        map_reverse_complements=map_reverse_complements,
        accumulate=accumulate,
        device=device,
        reader_workers=reader_workers,
    )

    n_bytes = os.stat(reads_path).st_size
    if reads_path.endswith(".gz"):
        n_bytes = int(n_bytes * GZIP_EXPANSION)
    # bases per raw byte: FASTQ carries quality + headers (~0.48), FASTA ~0.95
    fmt = readers.detect_format(reads_path)
    approx_bases = int(n_bytes * (0.48 if fmt == "fastq" else 0.95))
    approx_chunks = max(1, approx_bases // mapper.config.buf)
    logger.info("N bytes of reads: %d (~%d device buffers)", n_bytes, approx_chunks)

    t_map = time.perf_counter()
    n_chunks = 0
    chunk_iter = prefetch(packed, depth=queue_depth)
    bar = None
    if progress:
        try:  # tqdm progress over estimated chunk count (reference :94,114)
            import tqdm

            bar = tqdm.tqdm(total=max(approx_chunks, 1), unit="chunk", smoothing=0.1)
        except ImportError:
            pass
    import contextlib

    from .utils import profiling

    with profiling.trace(profile_dir) if profile_dir else contextlib.nullcontext():
        for packed_codes, lengths, n_bases, n_reads, n_invalid, strided in chunk_iter:
            if strict_bases and n_invalid:
                raise ValueError(
                    f"{n_invalid} invalid (non-ACGTN) bases in input "
                    "(--strict-bases; the reference's DNAEncoding would raise too)"
                )
            with profiling.step_annotation("map_chunk") if profile_dir else contextlib.nullcontext():
                mapper.map_chunk(packed_codes, lengths, n_bases, n_invalid, strided=strided)
            n_chunks += 1
            if bar is not None:
                bar.update(min(1, bar.total - bar.n))
            elif progress and n_chunks % 200 == 0:
                logger.info(
                    "chunk %d/~%d (%.1f%%)",
                    n_chunks,
                    approx_chunks,
                    100 * min(1.0, n_chunks / approx_chunks),
                )
        if profile_dir:
            _ = mapper.n_kmers_mapped  # drain async work inside the trace
    if bar is not None:
        bar.close()
    n_kmers = mapper.n_kmers_mapped  # blocks until the last dispatched step ran
    logger.info(
        "Time spent only on hashing and counting hashes: %.4f",
        time.perf_counter() - t_map,
    )
    if mapper.n_invalid_bases:
        logger.warning(
            "%d invalid (non-ACGTN) bases were encoded as A", mapper.n_invalid_bases
        )
    with span("node count finalization", logging.INFO):
        node_counts = mapper.node_counts(max_frequency=max_frequency)
    log_memory_usage_now("after mapping")
    n_hits = int(mapper.slot_counts().sum())
    logger.info(
        "Mapped %d kmers (%d index hits, %.1f%%) from %d chunks in %.3f sec total",
        n_kmers,
        n_hits,
        100 * n_hits / max(1, n_kmers),
        n_chunks,
        time.perf_counter() - t_start,
    )
    return node_counts


def make_mapper_and_chunks(
    index: TpuKmerIndex,
    reads_path: str,
    k: int,
    chunk_size: int,
    map_reverse_complements: bool,
    accumulate: str,
    device=None,
    reader_workers: int = 1,
) -> tuple[KmerMapper, Iterable]:
    """Build the device mapper plus the packed host chunk iterator.

    The device buffer is 64 Mi bases regardless of ``chunk_size`` (the
    reference's 2.5 MB default is a CPU-pool tuning knob; on TPU the
    fixed-read-length path sorts the chunk as multi-stream segments and the
    kernel's per-chunk tile count is ~constant — see ``_buf_floor``; tables
    whose schedule needs group >= 4 ride 128 Mi). On CPU (tests/fallback)
    the buffer follows chunk_size directly.

    If the file's reads are uniform-length (the Illumina case — detected from
    a peek at the first records, confirmed per buffer), the step compiles with
    ``read_len`` set and conforming buffers arrive directly in the word-plane
    strided layout from the frame+pack pass (native C++ or numpy — no separate
    restride pass); non-uniform chunks take a ragged twin step with identical
    results."""
    floor, paged = _buf_floor(index, k)
    buf = _round_up(min(max(chunk_size, floor), max(floor, 64 << 20)), 1 << 13)
    if paged:
        logger.info(
            "large index (%d buckets): the kernel schedule is HBM-paged "
            "(device buffer %d Mi bases)", index.table.n_buckets, buf >> 20,
        )

    def make_config(read_len):
        return default_config(
            k=k,
            buf=buf,
            max_reads=max(1024, buf // 32),
            revcomp=map_reverse_complements,
            accumulate=accumulate,
            read_len=read_len,
            streams=_pick_streams(read_len, paged, buf, k, index.table.n_buckets),
        )
    rl_hint = 0
    if default_config(k=k).probe == "stream":  # only the stream path consumes
        rl_hint = _peek_read_len(reads_path, k)  # the strided layout
    chunks = iter(
        packed_chunk_iterator(
            reads_path, make_config(rl_hint), chunk_size, reader_workers
        )
    )
    first = next(chunks, None)
    mapper = KmerMapper(
        index, make_config(rl_hint or _detect_read_len(first, k)), device=device
    )
    if first is None:
        return mapper, iter(())
    import itertools

    return mapper, _strided_chunks(itertools.chain([first], chunks), mapper.config)


def _strided_chunks(packed_iter, config: MapperConfig):
    """Normalize packed chunks to 6-tuples (+``strided``), restriding fixed
    uniform-read_len buffers into the word-plane layout on the fly.

    Producers pack continuously (the native loader always; ``pack_for_device``
    unless asked otherwise); when the mapper runs the fixed-read-length stream
    path, conforming buffers are restrided here — inside the prefetch
    thread's pull, so the host word shifts overlap device compute. Buffers
    that are not uniform ``read_len`` reads pass through continuous and take
    the ragged step (identical results)."""
    use_plane = bool(config.read_len) and config.probe == "stream"
    rows = readers.strided_rows(config.buf, config.read_len) if use_plane else 0
    for tup in packed_iter:
        if len(tup) == 6:  # pack_for_device(read_len=...) already decided
            yield tup
            continue
        packed, lengths, n_bases, n_reads, n_invalid = tup
        strided = (
            use_plane
            and chunk_is_fixed(lengths, n_bases, config.read_len)
        )
        if strided:
            packed = readers.restride_packed(
                packed, n_bases // config.read_len, config.read_len, rows
            )
        yield packed, lengths, n_bases, n_reads, n_invalid, strided


def packed_chunk_iterator(
    reads_path: str, config: MapperConfig, chunk_size: int, reader_workers: int = 1
):
    """Framed + packed device buffers for a reads file: the native C++ loader
    when available (see ``io/native.py``), else the numpy framer. Both are
    bit-identical.

    ``reader_workers > 1`` frames an uncompressed file as that many
    byte-region workers in parallel (``io/parallel_reader.py``) — the host
    analog of the reference's ``-t`` process pool. Chunk boundaries then
    differ from the sequential reader's (each region packs greedily from its
    own record-aligned start) but every buffer maps independently and counts
    are additive, so results are identical. Gzipped inputs stay sequential
    (not seekable; BGZF decode is already multi-core)."""
    from .io import native as native_mod

    fmt = readers.detect_format(reads_path)

    def stream_iter(stream):
        if native_mod.available():
            yield from native_mod.pack_stream_native(
                stream, fmt, config.buf, config.max_reads, config.k,
                block_bytes=chunk_size, read_len=config.read_len,
            )
            return
        try:
            chunks = readers.read_chunks(stream, fmt=fmt, min_chunk_size=chunk_size)
            yield from readers.pack_for_device(
                chunks, config.buf, config.max_reads, config.k,
                read_len=config.read_len,
            )
        finally:
            stream.close()

    if reader_workers > 1 and not str(reads_path).endswith(".gz"):
        from .io import parallel_reader

        return parallel_reader.parallel_packed_iterator(
            reads_path,
            fmt,
            lambda region: stream_iter(
                parallel_reader.RangeReader(reads_path, *region)
            ),
            reader_workers,
        )
    return stream_iter(readers.open_bytes(reads_path))


def map_file_sharded(
    index: TpuKmerIndex | str,
    reads_path: str,
    k: int = 31,
    chunk_size: int = 2_500_000,
    max_frequency: int = 1000,
    map_reverse_complements: bool = False,
    index_parallel: int = 1,
    n_devices: int | None = None,
    queue_depth: int = 4,
    strict_bases: bool = False,
    profile_dir: str | None = None,
    reader_workers: int = 1,
) -> np.ndarray:
    """Multi-device mapping over a (data, index) mesh: chunks fan out over the
    data axis, the table shards over the index axis (for multi-GB indexes),
    counts are combined on device at finalization. Single-host multi-chip; for
    multi-host, run one pipeline per host on its own file shard and sum the
    node-count vectors. ``strict_bases``/``profile_dir``/``reader_workers``
    as in ``map_file`` — multi-chip feeds are exactly where one framing core
    (~485 Mkmers/s worth of bases) stops being enough."""
    import contextlib

    from .models.mapper import default_config
    from .parallel import ShardedKmerMapper, batch_packed_chunks, make_mesh
    from .utils import profiling

    index = load_index(index)
    mesh = make_mesh(n_devices=n_devices, index_parallel=index_parallel)
    floor, paged = _buf_floor(index, k, n_shards=index_parallel)
    buf = _round_up(min(max(chunk_size, floor), max(floor, 64 << 20)), 1 << 13)

    def make_config(read_len):
        # same multi-stream default as map_file (per-shard schedules decide
        # paged-ness and feasibility: shards of a big table often fit SMEM)
        n_local = max(128, index.table.n_buckets // max(1, index_parallel))
        return default_config(
            k=k,
            buf=buf,
            max_reads=max(1024, buf // 32),
            revcomp=map_reverse_complements,
            read_len=read_len,
            streams=_pick_streams(read_len, paged, buf, k, n_local),
        )
    config = make_config(0)
    packed = iter(
        packed_chunk_iterator(reads_path, config, chunk_size, reader_workers)
    )
    # same uniform-read-length detection as map_file; batches that break
    # uniformity later take the sharded mapper's ragged twin step
    first = next(packed, None)
    if first is not None:
        import itertools

        packed = itertools.chain([first], packed)
        config = make_config(_detect_read_len(first, k))
    mapper = ShardedKmerMapper(index, config, mesh)
    batches = batch_packed_chunks(
        packed, mapper.n_data, config.packed_words, config.max_reads
    )
    t = time.perf_counter()
    n_batches = 0
    with profiling.trace(profile_dir) if profile_dir else contextlib.nullcontext():
        for batch in prefetch(batches, depth=queue_depth):
            if strict_bases and batch[3]:
                raise ValueError(
                    f"{batch[3]} invalid (non-ACGTN) bases in input "
                    "(--strict-bases; the reference's DNAEncoding would raise too)"
                )
            mapper.map_batch(*batch)
            n_batches += 1
        if profile_dir:
            _ = mapper.n_kmers_mapped
    logger.info(
        "Mapped %d kmers in %d batches over mesh %s in %.3f sec",
        mapper.n_kmers_mapped,
        n_batches,
        dict(mesh.shape),
        time.perf_counter() - t,
    )
    return mapper.node_counts(max_frequency=max_frequency)


def map_sequences(
    index: TpuKmerIndex,
    sequences: list[str],
    k: int = 31,
    max_frequency: int = 1000,
    **kwargs,
) -> np.ndarray:
    """Programmatic API: map in-memory sequences (library parity with calling
    ``map_bnp`` with an in-memory index + small input)."""
    flat = "".join(sequences)
    chunk = readers.SequenceChunk(
        bases=np.frombuffer(flat.encode(), dtype=np.uint8),
        read_starts=(np.cumsum([0] + [len(s) for s in sequences[:-1]])).astype(np.int64),
    )
    buf = _round_up(max(len(flat), 1 << 10), 1 << 10)
    config = default_config(k=k, buf=buf, max_reads=max(16, len(sequences)), **kwargs)
    mapper = KmerMapper(index, config)
    for packed, lengths, n_bases, _, n_invalid in readers.pack_for_device(
        iter([chunk]), config.buf, config.max_reads, config.k
    ):
        mapper.map_chunk(packed, lengths, n_bases, n_invalid)
    return mapper.node_counts(max_frequency=max_frequency)


def _pick_streams(read_len: int, paged: bool, buf: int, k: int, n_local: int) -> int:
    """Production multi-stream default (v5e sweeps, BASELINE.md): the 64 Mi
    chunk sorts as independent ~2^24-sized segments served by fused
    multi-stream kernel tiles — XLA's sort is fastest below ~2^24 elements
    while kernel tiles per chunk are ~constant.

    All four S-choices re-attested at the round-5 plane-layout kernel with
    the retuned 1.40x cap (BASELINE.md round-5 section; the pre-retune
    rates in older notes are superseded):

    * fixed-read-length (word-plane) chunks: S=4 on SMEM-schedule tables
      (402.9 vs 394.3/377.6 Mk/s at S=2/6, rtt-subtracted; ~53.8M
      windows/chunk), S=2 on paged tables (319.3 vs 253.9/296.3 at S=1/S=4
      on the 4.19M-bucket table — thin per-block windows make S=4's
      tighter cap inflate the tile count);
    * ragged chunks: S=6 on SMEM-schedule tables (262.6 vs 238.0 at S=4 —
      all 67M buf slots are window candidates, so more segments reach the
      sort sweet spot), S=4 on paged tables (188.9 vs 165.2 at S=2 on the
      12.8M-key table; S=6 is SMEM-infeasible there);
    * HUMAN-SCALE tables (>= 2^25 buckets per chip, reachable since the
      self-contained-schedule kernel made group=1 feasible there): S=1 —
      per-block windows are so thin (~400 queries/block at 128 Mi) that
      extra streams only widen tiles and add sub-pass overhead (150M-key
      drill at group=1: S=1/2/4 = 158.0/140.0/117.8 Mk/s,
      r8_scale_drill.py). Ragged input gets the same gate by the same
      thin-window argument (extrapolated, not separately measured);

    clamped by ``stream_probe.max_feasible_streams`` (with self-contained
    schedule entries that bound is ~40 — it only binds in monkeypatched
    tests, but keeps the policy mechanically safe)."""
    if buf < 64 << 20 or default_config(k=k).probe != "stream":
        return 1
    from .ops import stream_probe

    if n_local >= stream_probe.HUMAN_SCALE_BUCKETS:
        return 1
    desired = (2 if paged else 4) if read_len else (4 if paged else 6)
    return max(1, min(desired, stream_probe.max_feasible_streams(n_local)))


def _detect_read_len(first_chunk, k: int) -> int:
    """Uniform read length of a packed chunk (0 if ragged/empty/too short):
    decides whether the step compiles with the fixed-read_len window slicing
    (the Illumina case; see MapperConfig.read_len)."""
    if first_chunk is None:
        return 0
    _, lengths, n_bases, n_reads, _ = first_chunk[:5]
    L = int(lengths[0]) if n_reads else 0
    if L >= k and n_bases == n_reads * L and np.all(lengths[:n_reads] == L):
        return L
    return 0


def _peek_read_len(reads_path: str, k: int, peek_bytes: int = 512 << 10) -> int:
    """Uniform read length of the file's FIRST records (0 if ragged, empty,
    unreadable, or shorter than k): frames the first ``peek_bytes`` of
    (decompressed) input host-side so the packers can be asked for the
    word-plane strided layout from buffer one — the C++ frame+pack pass then
    emits it directly, with per-buffer conformance still re-checked (a
    nonconforming buffer anywhere falls back to the continuous layout and the
    mapper's ragged twin step; results are identical either way)."""
    try:
        stream = readers.open_bytes(reads_path)
        try:
            block = stream.read(peek_bytes)
        finally:
            stream.close()
        fmt = readers.detect_format(reads_path, peek=block[:1])
        framer = readers._FastaFramer() if fmt == "fasta" else readers._FastqFramer()
        chunk, _ = framer.frame(
            np.frombuffer(block, dtype=np.uint8), eof=len(block) < peek_bytes
        )
    except (OSError, ValueError):
        return 0
    if chunk.n_reads == 0:
        return 0
    lengths = chunk.read_lengths
    L = int(lengths[0])
    return L if L >= k and np.all(lengths == L) else 0


def _buf_floor(
    index: TpuKmerIndex | None = None, k: int = 31, n_shards: int = 1
) -> tuple[int, bool]:
    """(device buffer floor in bases, schedule-is-paged). On TPU the floor is
    64 Mi: fixed-read-length files sort it as 4 multi-stream segments (the
    v5e optimum, 353 Mk/s); large paged tables amortize their ~constant
    per-chunk kernel tile count (210 vs 151 Mk/s at 64 vs 16 Mi,
    r3_large_table.py); ragged single-stream files lose only ~3% vs their own
    32 Mi optimum — not worth a second compile shape. Human-scale tables
    (>= 2^25 buckets ≈ 128M keys per chip) keep a 128 Mi floor: measured on
    the 150M-key drill both pre- and post- the self-contained-schedule
    kernel (r8_scale_drill.py: group=4 era 127.5 vs 110.4 Mk/s at
    128 vs 64 Mi; the group=1 4.19M-bucket table gained only +1.8% from
    128 Mi — hence the bucket-count gate). The paged-ness flag (the kernel's
    own planner at a 32 Mi probe; the first shard's block span approximates
    a sharded index) picks the stream count in make_config."""
    import jax

    if jax.default_backend() != "tpu":
        return 1 << 16, False
    floor = 64 << 20
    if index is None:
        return floor, False
    from .models.mapper import auto_stream_cap
    from .ops import stream_probe

    t = index.table
    n_local = max(128, t.n_buckets // max(1, n_shards))
    if n_local >= stream_probe.HUMAN_SCALE_BUCKETS:
        floor = 128 << 20
    cap = auto_stream_cap(32 << 20, t.n_buckets, 0, k)
    n_q = 32 << 20  # query slots before invalid thinning (upper bound)
    try:
        plan = stream_probe.plan_schedule(
            n_local,
            n_q + (-n_q) % cap + 2 * cap,
            cap=cap,
            max_probe=t.max_probe,
            block_probe=t.block_max_probe()[: n_local // min(128, n_local)],
        )
        paged = not plan.use_meta
    except ValueError:
        paged = True  # beyond even the paged single-chip schedule
    return floor, paged


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m
