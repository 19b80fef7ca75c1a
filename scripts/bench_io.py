"""Host data-loader throughput (reference tests/test_reading.py analog).

Measures the native C++ framer+packer vs the numpy fallback on synthetic
FASTA/FASTQ (plain and gzipped). Host-only; no accelerator involved.
"""
import gzip
import io
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kmer_mapper_tpu.io import native, readers  # noqa: E402

MAX_BASES = 4 << 20
MAX_READS = MAX_BASES // 64
K = 31


def synth(n_reads=300_000, read_len=151, fastq=True):
    rng = np.random.default_rng(0)
    seqs = rng.choice(np.frombuffer(b"ACGT", np.uint8), (n_reads, read_len))
    parts = []
    for i in range(n_reads):
        if fastq:
            parts.append(
                b"@r%d\n" % i + seqs[i].tobytes() + b"\n+\n" + b"I" * read_len + b"\n"
            )
        else:
            parts.append(b">r%d\n" % i + seqs[i].tobytes() + b"\n")
    return b"".join(parts)


def bench(name, fn, n_bytes):
    t = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t
    nb = sum(o[2] for o in out)
    print(
        f"{name:28s} {dt:6.2f}s  {n_bytes / dt / 1e6:7.0f} MB/s raw  "
        f"{nb / dt / 1e6:6.0f} Mbases/s"
    )


def main():
    for fastq in (True, False):
        fmt = "fastq" if fastq else "fasta"
        data = synth(fastq=fastq)
        print(f"--- {fmt}: {len(data) / 1e6:.0f} MB ---")
        if native.available():
            bench(
                f"native {fmt}",
                lambda: list(
                    native.pack_stream_native(
                        io.BytesIO(data), fmt, MAX_BASES, MAX_READS, K, 2_500_000
                    )
                ),
                len(data),
            )
        bench(
            f"numpy {fmt}",
            lambda: list(
                readers.pack_for_device(
                    readers.read_chunks(io.BytesIO(data), fmt=fmt, min_chunk_size=2_500_000),
                    MAX_BASES,
                    MAX_READS,
                    K,
                )
            ),
            len(data),
        )
        gz = gzip.compress(data, compresslevel=4)
        if native.available():
            bench(
                f"native {fmt}.gz",
                lambda: list(
                    native.pack_stream_native(
                        gzip.open(io.BytesIO(gz)), fmt, MAX_BASES, MAX_READS, K, 2_500_000
                    )
                ),
                len(data),
            )


if __name__ == "__main__":
    main()
