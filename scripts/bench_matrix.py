"""BASELINE.json config matrix: measured numbers for BASELINE.md.

Covers the five benchmark configurations on whatever accelerator JAX provides:
  1. toy .fa against a toy .npz index, single chunk (correctness + latency)
  2. gzipped FASTQ streaming (host decode + device map)
  3. k sweep (16/21/31) with reverse complements and N-masking
  4. large HBM-resident index
  5. index sharded over available devices (ICI all-reduce of counts)

Writes a markdown table to stdout; diagnostics to stderr. Heavier than
bench.py — run manually.
"""
import gzip
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_reads_file(path, rng, n_reads, read_len=151, gz=False, fastq=False, with_n=False):
    alphabet = list("ACGTN") if with_n else list("ACGT")
    p = np.array([0.24, 0.24, 0.24, 0.24, 0.04]) if with_n else None
    lines = []
    for i in range(n_reads):
        seq = "".join(rng.choice(alphabet, read_len, p=p))
        if fastq:
            lines.append(f"@r{i}\n{seq}\n+\n{'I' * read_len}\n")
        else:
            lines.append(f">r{i}\n{seq}\n")
    data = "".join(lines)
    if gz:
        with gzip.open(path, "wt") as f:
            f.write(data)
    else:
        Path(path).write_text(data)
    return str(path)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from kmer_mapper_tpu import oracle, pipeline
    from kmer_mapper_tpu.index import kmer_index as ki

    tmp = Path("/tmp/kmt_bench")
    tmp.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []

    def run(name, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        rows.append((name, dt, out))
        log(f"{name}: {dt:.2f}s ({out})")

    # config 1: toy
    arrays = ki.build_toy_index(n_unique=2000, k=31, n_nodes=500, seed=1)
    idx_path = tmp / "toy.npz"
    ki.save_reference_npz(idx_path, arrays)
    reads1 = make_reads_file(tmp / "toy.fa", rng, 2000)
    run("1 toy fa + toy npz", lambda: f"sum={pipeline.map_file(str(idx_path), reads1, k=31).sum()}")

    # shared large synthetic index built from read kmers
    reads2 = make_reads_file(tmp / "big.fq.gz", rng, 60_000, gz=True, fastq=True)
    sample = make_reads_file(tmp / "sample.fa", rng, 3000)

    def build_big(n_unique):
        codes = oracle.encode_bytes(
            np.frombuffer("".join("ACGT"[c] for c in rng.integers(0, 4, 500_000)).encode(), np.uint8)
        )
        kmers = oracle.kmer_hashes(codes, 31)
        entry = np.unique(np.concatenate([
            rng.integers(0, 1 << 62, n_unique, dtype=np.uint64), rng.choice(kmers, n_unique)]))
        nodes = rng.integers(0, 3_000_000, len(entry)).astype(np.int32)
        return ki.TpuKmerIndex.from_entries(entry, nodes)

    big = build_big(4_000_000)
    log(f"big index: {big.n_unique} unique, table {big.table.nbytes/1e6:.0f} MB")

    # config 2: gz fastq streaming
    run("2 gz fastq streaming", lambda: f"sum={pipeline.map_file(big, reads2, k=31).sum()}")

    # config 3: k sweep with revcomp + N
    readsN = make_reads_file(tmp / "n.fa", rng, 20_000, with_n=True)
    for k in (16, 21, 31):
        run(
            f"3 k={k} revcomp+N",
            lambda k=k: f"sum={pipeline.map_file(big, readsN, k=k, map_reverse_complements=True).sum()}",
        )

    # config 4: large HBM index (reuse big at larger read volume)
    reads4 = make_reads_file(tmp / "vol.fa", rng, 120_000)
    run("4 large index volume", lambda: f"sum={pipeline.map_file(big, reads4, k=31).sum()}")

    # config 5: sharded over available devices
    n_dev = len(jax.devices())
    if n_dev >= 2:
        run(
            f"5 sharded x{n_dev}",
            lambda: f"sum={pipeline.map_file_sharded(big, reads4, k=31, n_devices=n_dev, index_parallel=min(2, n_dev)).sum()}",
        )
    else:
        log("5 sharded: skipped (single device)")

    print("| config | wall (s) | result |")
    print("|---|---|---|")
    for name, dt, out in rows:
        print(f"| {name} | {dt:.2f} | {out} |")


if __name__ == "__main__":
    main()
