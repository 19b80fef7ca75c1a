"""KAGE library-surface throughput: repeated map_kmers_to_graph_index calls.

The reference's production call surface is per-batch library calls
(``kmer_mapper/mapper.pyx:19``), not the file pipeline. Measures warm
repeated-call throughput on pre-hashed kmer batches (the map_hashes stream
path) against a 4M-unique index, plus the TpuCounter count/get_node_counts
cycle. Round-2 verdict: this path's cap was mis-sized and never benchmarked.

Usage: python scripts/r3_library_surface.py [BATCH_LOG2=23]
Env: SKIP_CALL_SURFACE=1 (device-only: big batches ship 100s of MB per call
over the ~50 MB/s axon tunnel), N_DEV (device-resident distinct batches, 8).
"""
import os
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

    best = 0.0
    if not os.environ.get("SKIP_CALL_SURFACE"):
        t = time.perf_counter()
        out = compat.map_kmers_to_graph_index(index, max_node_id, batches[0])
        log(f"first call (compile): {time.perf_counter()-t:.1f}s, hits {out.sum()}")

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

    # DEVICE-side library rate: the exact per-call step map_hashes compiles
    # (pre-hashed stream_probe_count, valid_frac=1 cap fit), chained over 8
    # DISTINCT device-resident batches in one jit (CSE-free, no host->device
    # — in this environment the host tunnel runs ~50 MB/s, ~100x slower than
    # a real TPU VM's PCIe, so the call-surface number above is a transport
    # artifact, not the device cost)
    import jax.numpy as jnp

    from kmer_mapper_tpu.models.mapper import auto_stream_cap
    from kmer_mapper_tpu.ops import stream_probe
    from kmer_mapper_tpu.ops.u32hash import split_u64

    table = index.table
    bp = table.block_max_probe()
    # mirror KmerMapper.map_hashes: batches past the XLA sort cliff (~2^24
    # elements) sort as ~16Mi segments served by multi-stream kernel tiles
    # (STREAMS env overrides, for measuring the unsegmented comparison)
    streams = int(os.environ.get("STREAMS", 0)) or max(1, min(8, batch >> 24))
    cap = auto_stream_cap(
        batch // streams, table.n_buckets, valid_frac=1.0, streams=streams
    )
    n_dev = int(os.environ.get("N_DEV", 8))
    dev = []
    for _ in range(n_dev):
        b = np.concatenate(
            [rng.choice(keys, batch // 2),
             rng.integers(0, 1 << 62, batch // 2, dtype=np.uint64)]
        )
        lo, hi = split_u64(b)
        dev.append((jax.device_put(lo), jax.device_put(hi)))
    valid = jax.device_put(np.ones(batch, dtype=bool))

    def window(key_lo, key_hi, counts, qs, valid):
        for lo, hi in qs:
            counts = stream_probe.stream_probe_count(
                key_lo, key_hi, counts, lo, hi, valid,
                table.seed, table.max_probe, block_probe=bp, cap=cap,
                streams=streams,
            )
        return counts, counts[:8].sum()

    win = jax.jit(window, donate_argnums=(2,))
    # the stream kernel consumes the PLANE layout + plane-order counts,
    # exactly as KmerMapper.__init__/map_hashes prepare them
    p_lo, p_hi = stream_probe.plane_keys(table.key_lo, table.key_hi)
    key_lo = jax.device_put(p_lo)
    key_hi = jax.device_put(p_hi)
    counts = jax.device_put(
        jnp.asarray(
            stream_probe.slot_to_plane(
                np.zeros(table.n_slots, dtype=np.uint32), table.n_buckets
            )
        )
    )
    t = time.perf_counter()
    counts, tot = win(key_lo, key_hi, counts, dev, valid)
    _ = int(jax.device_get(tot))
    log(f"device window compile+first {time.perf_counter()-t:.1f}s")
    dev_best = 0.0
    for trial in range(3):
        t = time.perf_counter()
        counts, tot = win(key_lo, key_hi, counts, dev, valid)
        _ = int(jax.device_get(tot))
        r = n_dev * batch / (time.perf_counter() - t)
        dev_best = max(dev_best, r)
        log(f"device trial {trial}: {r/1e6:.1f} Mkmers/s")
    print(
        f"RESULT library batch={batch} call_surface={best/1e6:.1f} "
        f"device={dev_best/1e6:.1f} Mk/s"
    )


if __name__ == "__main__":
    main()
