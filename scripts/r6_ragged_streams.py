"""Ragged-path multi-stream sweep (round-3 session 7).

The fixed-read-length plane path sorts 64 Mi chunks as S independent
segments (353 -> 371 Mk/s, sessions 4b-6); the RAGGED step (mixed-length
files, split long reads) still did ONE flat sort of all buf window slots —
67M elements at 64 Mi, past XLA's ~2^24 sort cliff. This sweeps
MapperConfig.streams on the ragged step (stream_probe.mix_pad_segments)
with the CSE-free 8-distinct-chunk window methodology.

Usage: python scripts/r6_ragged_streams.py [streams ...] (default 1 2 4 6)
Env: KMT_BENCH_BUF (bytes, default 64Mi), STEPS (8), N_UNIQUE (4M).
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

K = 31
READ_LEN = 151
BUF = int(os.environ.get("KMT_BENCH_BUF", 64 << 20))
STEPS = int(os.environ.get("STEPS", 8))
N_UNIQUE = int(os.environ.get("N_UNIQUE", 4_000_000))
N_WINDOWS = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    sweep = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 6]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from kmer_mapper_tpu import oracle
    from kmer_mapper_tpu.index import kmer_index as ki
    from kmer_mapper_tpu.io.readers import pack_for_device
    from kmer_mapper_tpu.models.mapper import (
        auto_stream_cap, chunk_step, default_config,
    )
    from bench import make_read_chunk

    rng = np.random.default_rng(0)
    chunks = [make_read_chunk(rng, BUF) for _ in range(STEPS)]
    sample_kmers = oracle.kmer_hashes(
        oracle.encode_bytes(chunks[0].bases[: READ_LEN * 5000]), K
    )
    entry_kmers = np.unique(
        np.concatenate(
            [
                rng.integers(0, 1 << 62, N_UNIQUE // 2, dtype=np.uint64),
                rng.choice(sample_kmers, N_UNIQUE // 2),
            ]
        )
    )
    nodes = rng.integers(0, 3_000_000, len(entry_kmers)).astype(np.int32)
    index = ki.TpuKmerIndex.from_entries(entry_kmers, nodes)
    table = index.table
    bp = table.block_max_probe()
    log(
        f"{len(entry_kmers)} keys -> {table.n_buckets} buckets "
        f"({table.n_buckets // 128} blocks), max_probe={table.max_probe}"
    )
    # round-4 plane layout: the stream kernel consumes plane_keys output
    # (device tables keyed (n_groups, W, gpb)); raw table.key_lo is no
    # longer a valid kernel input (see KmerMapper.__init__)
    from kmer_mapper_tpu.ops import stream_probe

    p_lo, p_hi = stream_probe.plane_keys(table.key_lo, table.key_hi)
    key_lo = jax.device_put(p_lo)
    key_hi = jax.device_put(p_hi)

    for streams in sweep:
        cap = auto_stream_cap(
            BUF // streams, table.n_buckets, streams=streams
        )
        config = default_config(
            k=K, buf=BUF, max_reads=BUF // 64, streams=streams,
            stream_cap=cap, probe="stream",
        )
        packed = [
            next(iter(pack_for_device(
                iter([c]), config.buf, config.max_reads, K
            )))
            for c in chunks
        ]
        resident = [
            (jax.device_put(p), jax.device_put(ln), jnp.int32(nb))
            for p, ln, nb, _, _ in packed
        ]
        step = functools.partial(
            chunk_step, config=config, max_probe=table.max_probe,
            seed=table.seed, block_probe=bp,
        )

        def window(key_lo, key_hi, counts, resident):
            total = jnp.uint32(0)
            for i in range(STEPS):
                p, ln, nb = resident[i]
                counts, n_valid = step(key_lo, key_hi, counts, p, ln, nb)
                total = total + n_valid
            return counts, total

        window_fn = jax.jit(window, donate_argnums=(2,))
        counts = jax.device_put(jnp.zeros(table.n_slots, dtype=jnp.uint32))
        t = time.perf_counter()
        counts, total = window_fn(key_lo, key_hi, counts, resident)
        km = int(jax.device_get(total))
        log(f"S={streams} cap={cap} compile+first {time.perf_counter() - t:.1f}s")
        best = 0.0
        for _ in range(N_WINDOWS):
            t = time.perf_counter()
            counts, total = window_fn(key_lo, key_hi, counts, resident)
            _ = int(jax.device_get(total))
            best = max(best, km / (time.perf_counter() - t))
        print(f"RESULT S={streams} cap={cap} {best / 1e6:.1f} Mk/s", flush=True)


if __name__ == "__main__":
    main()
