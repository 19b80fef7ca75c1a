"""KAGE library-surface throughput: repeated map_kmers_to_graph_index calls.

The reference's production call surface is per-batch library calls
(``kmer_mapper/mapper.pyx:19``), not the file pipeline. Measures warm
repeated-call throughput on pre-hashed kmer batches (the map_hashes stream
path) against a 4M-unique index, plus the TpuCounter count/get_node_counts
cycle. Round-2 verdict: this path's cap was mis-sized and never benchmarked.

Usage: python scripts/r3_library_surface.py [BATCH_LOG2=23]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    batch = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 23)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from kmer_mapper_tpu import compat
    from kmer_mapper_tpu.index import kmer_index as ki

    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << 62, 4_000_000, dtype=np.uint64))
    nodes = rng.integers(0, 3_000_000, len(keys)).astype(np.int32)
    t = time.perf_counter()
    index = ki.TpuKmerIndex.from_entries(keys, nodes)
    log(f"index built in {time.perf_counter()-t:.1f}s ({index.table.n_buckets} buckets)")
    max_node_id = int(nodes.max())

    # distinct batches (CSE-free) ~50% hits
    batches = [
        np.concatenate(
            [rng.choice(keys, batch // 2), rng.integers(0, 1 << 62, batch // 2, dtype=np.uint64)]
        )
        for _ in range(4)
    ]

    t = time.perf_counter()
    out = compat.map_kmers_to_graph_index(index, max_node_id, batches[0])
    log(f"first call (compile): {time.perf_counter()-t:.1f}s, hits {out.sum()}")

    best = 0.0
    for trial in range(3):
        t = time.perf_counter()
        for b in batches:
            out = compat.map_kmers_to_graph_index(index, max_node_id, b)
        dt = time.perf_counter() - t
        best = max(best, 4 * batch / dt)
        log(f"trial {trial}: {4 * batch / dt / 1e6:.1f} Mkmers/s (incl. host->device + finalize)")

    # TpuCounter cycle (gpu_counter parity surface)
    counter = compat.TpuCounter.from_kmers_and_nodes(keys, nodes, 31)
    counter.initialize_cuda(0)
    counter.count(batches[0])
    t = time.perf_counter()
    for b in batches:
        counter.count(b)
    nc = counter.get_node_counts(min_nodes=max_node_id)
    dt = time.perf_counter() - t
    log(f"TpuCounter: {4 * batch / dt / 1e6:.1f} Mkmers/s incl. node finalize ({nc.sum()} hits)")
    print(f"RESULT library batch={batch} best={best/1e6:.1f} Mk/s")


if __name__ == "__main__":
    main()
