"""Host-feed bounds on this box (round-4, VERDICT item 7).

Measures, interleaved best-of-N (this box's burstable vCPU varies 3-9x run to
run — only interleaved comparisons are meaningful, see CLAUDE.md):

  a) native frame+pack CONTINUOUS + kmh_restride pass (the round-3 path)
  b) native frame+pack emitting the STRIDED layout directly (round-4)
  c) numpy framer (KMT_NO_NATIVE) for scale
  d) parallel_reader workers=1 vs the sequential reader on the same file
     (bounds the per-worker region setup/scan overhead; real scaling needs a
     multi-core host)

Usage: python scripts/r8_host_feed.py   Env: MB (default 64), TRIALS (3).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

MB = int(os.environ.get("MB", 64))
TRIALS = int(os.environ.get("TRIALS", 3))
L = 151
K = 31


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_file(path, n_bases):
    rng = np.random.default_rng(0)
    n_reads = n_bases // L
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "wb") as f:
        for start in range(0, n_reads, 100_000):
            cnt = min(100_000, n_reads - start)
            block = lut[rng.integers(0, 4, (cnt, L))]
            qual = np.full(L, ord("F"), np.uint8)
            parts = []
            for i in range(cnt):
                parts.append(b"@r%d\n" % (start + i))
                parts.append(block[i].tobytes())
                parts.append(b"\n+\n")
                parts.append(qual.tobytes())
                parts.append(b"\n")
            f.write(b"".join(parts))
    return n_reads


def time_iter(fn):
    t0 = time.perf_counter()
    n_bases = 0
    n_chunks = 0
    for tup in fn():
        n_bases += tup[2]
        n_chunks += 1
    return time.perf_counter() - t0, n_bases, n_chunks


def main():
    from kmer_mapper_tpu.io import native, readers
    from kmer_mapper_tpu.io.parallel_reader import (RangeReader,
                                                    parallel_packed_iterator)

    assert native.available(), "needs the native loader"
    path = "/tmp/r8_feed.fq"
    n_bases = MB << 20
    if not os.path.exists(path) or os.path.getsize(path) < n_bases:
        log(f"writing {MB} MB-of-bases fixture ...")
        make_file(path, n_bases)
    buf, max_reads = 16 << 20, (16 << 20) // 32
    rows = readers.strided_rows(buf, L)

    def continuous_plus_restride():
        def run():
            for p, ln, nb, nr, ninv in native.pack_stream_native(
                open(path, "rb"), "fastq", buf, max_reads, K
            ):
                q = readers.restride_packed(p, nb // L, L, rows)
                yield q, ln, nb, nr, ninv

        return run

    def strided_direct():
        def run():
            yield from native.pack_stream_native(
                open(path, "rb"), "fastq", buf, max_reads, K, read_len=L
            )

        return run

    def numpy_framer():
        def run():
            os.environ["KMT_NO_NATIVE"] = "1"
            try:
                chunks = readers.read_chunks(open(path, "rb"), fmt="fastq")
                yield from readers.pack_for_device(chunks, buf, max_reads, K,
                                                   read_len=L)
            finally:
                del os.environ["KMT_NO_NATIVE"]

        return run

    def par_one():
        def run():
            def region_fn(region):
                return native.pack_stream_native(
                    RangeReader(path, *region), "fastq", buf, max_reads, K,
                    read_len=L,
                )

            yield from parallel_packed_iterator(path, "fastq", region_fn, 1)

        return run

    cases = {
        "native continuous + restride": continuous_plus_restride(),
        "native strided direct": strided_direct(),
        "numpy framer (strided)": numpy_framer(),
        "parallel_reader workers=1 (strided)": par_one(),
    }
    best = {k: 1e18 for k in cases}
    for t in range(TRIALS):
        for name, fn in cases.items():
            dt, nb, nc = time_iter(fn)
            best[name] = min(best[name], dt)
            log(f"trial {t} {name}: {dt:.2f}s ({nb / dt / 1e6:.0f} Mbases/s, {nc} chunks)")
    log("")
    for name, dt in best.items():
        log(f"BEST {name}: {dt:.2f}s = {n_bases / dt / 1e6:.0f} Mbases/s")


if __name__ == "__main__":
    main()
