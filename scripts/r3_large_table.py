"""Large-table (paged-schedule fallback) throughput, CSE-free.

A 16M-unique-key index at the default load builds ~4M buckets (268 MB table):
the per-tile schedule arrays no longer fit SMEM, so stream_count pages the
schedule HBM->VMEM->SMEM (same per-tile reads and DMA lookahead as the SMEM
mode) — exactly the regime of real multi-GB KAGE indexes (round-2 verdict:
unmeasured). Same window methodology as bench.py.

Usage: python scripts/r3_large_table.py [N_UNIQUE_MILLIONS=16] [AUG=1] [CAP=0] [GROUP=0]
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

K = 31
READ_LEN = 151
BUF = int(os.environ.get("KMT_BENCH_BUF", 16 << 20))
STEPS = int(os.environ.get("STEPS", 8))  # distinct chunks per jitted window
N_WINDOWS = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    n_unique_m = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    aug = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cap_arg = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    grp = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from kmer_mapper_tpu import oracle
    from kmer_mapper_tpu.index import layout
    from kmer_mapper_tpu.io.readers import pack_for_device
    from kmer_mapper_tpu.models.mapper import (
        auto_stream_cap,
        chunk_step,
        default_config,
    )
    from kmer_mapper_tpu.ops import stream_probe
    from bench import make_read_chunk

    rng = np.random.default_rng(0)
    chunks = [make_read_chunk(rng, BUF) for _ in range(STEPS)]
    sample_codes = oracle.encode_bytes(chunks[0].bases[: READ_LEN * 20000])
    sample_kmers = oracle.kmer_hashes(sample_codes, K)
    n_unique = n_unique_m * 1_000_000
    t = time.perf_counter()
    entry_kmers = np.unique(
        np.concatenate(
            [
                rng.integers(0, 1 << 62, n_unique * 3 // 4, dtype=np.uint64),
                rng.choice(sample_kmers, n_unique // 4),
            ]
        )
    )
    table = layout.build_table(entry_kmers)
    bp = table.block_max_probe()
    log(
        f"{len(entry_kmers)} keys -> {table.n_buckets} buckets, table "
        f"{table.nbytes/1e6:.0f} MB, max_probe={table.max_probe}, "
        f"block rounds mean={bp.mean():.2f}, built {time.perf_counter()-t:.1f}s"
    )

    streams = int(os.environ.get("STREAMS", "1"))
    # exactly the KmerMapper auto-cap call (streams bounds the lane ceiling,
    # group widens the per-tile block span) so this measures production config
    cap = cap_arg or auto_stream_cap(
        BUF // streams, table.n_buckets, READ_LEN,
        streams=streams, group=max(1, grp),
    )
    config = default_config(
        k=K, buf=BUF, max_reads=BUF // 64, read_len=READ_LEN,
        stream_cap=cap, aug=aug, group=grp, streams=streams,
    )
    # confirm which schedule mode this size lands in (the kernel's own plan)
    n_q = BUF // READ_LEN * (READ_LEN - K + 1)
    plan = stream_probe.plan_schedule(
        table.n_buckets, n_q + (-n_q) % cap + 2 * cap, cap=cap,
        max_probe=table.max_probe, aug=aug, group=grp, block_probe=bp,
        streams=streams,
    )
    g, use_meta = plan.group, plan.use_meta
    log(
        f"cap={cap} n_groups={plan.n_groups} group={g} t_pad={plan.t_pad} "
        f"-> schedule mode: {'meta' if use_meta else 'PAGED'}"
    )

    # the production stream path now rides the word-plane strided layout
    # (KMT_PLANE=0 reverts to the interleave+slice step for A/B runs)
    use_plane = config.probe == "stream" and os.environ.get("KMT_PLANE", "1") == "1"
    packed = [
        next(iter(pack_for_device(
            iter([c]), config.buf, config.max_reads, K,
            read_len=READ_LEN if use_plane else 0,
        )))
        for c in chunks
    ]
    # round-4 plane layout: the stream kernel consumes plane_keys output
    # (see KmerMapper.__init__); group must match config.group
    if aug > 1:
        aug_lo, aug_hi = table.aug_keys(aug)
    else:
        aug_lo, aug_hi = table.key_lo, table.key_hi
    p_lo, p_hi = stream_probe.plane_keys(aug_lo, aug_hi, group=max(1, grp))
    key_lo = jax.device_put(p_lo)
    key_hi = jax.device_put(p_hi)
    counts = jax.device_put(jnp.zeros(table.n_slots, dtype=jnp.uint32))
    if use_plane:
        from kmer_mapper_tpu.models.mapper import plane_chunk_step

        resident = [
            (jax.device_put(p), jnp.int32(nb // READ_LEN))
            for p, ln, nb, _, _, _ in packed
        ]
        step0 = functools.partial(
            plane_chunk_step, config=config, max_probe=table.max_probe,
            seed=table.seed, block_probe=bp,
        )

        def window(key_lo, key_hi, counts, resident):
            total = jnp.uint32(0)
            for i in range(STEPS):
                p, nr = resident[i]
                counts, n_valid = step0(key_lo, key_hi, counts, p, nr)
                total = total + n_valid
            return counts, total
    else:
        resident = [
            (jax.device_put(p), jax.device_put(ln), jnp.int32(nb))
            for p, ln, nb, _, _ in packed
        ]
        step = functools.partial(
            chunk_step, config=config, max_probe=table.max_probe, seed=table.seed,
            block_probe=bp,
        )

        def window(key_lo, key_hi, counts, resident):
            total = jnp.uint32(0)
            for i in range(STEPS):
                p, ln, nb = resident[i]
                counts, n_valid = step(key_lo, key_hi, counts, p, ln, nb)
                total = total + n_valid
            return counts, total

    window_fn = jax.jit(window, donate_argnums=(2,))
    t = time.perf_counter()
    counts, total = window_fn(key_lo, key_hi, counts, resident)
    kmers_per_window = int(jax.device_get(total))
    log(f"compile+first {time.perf_counter()-t:.1f}s ({kmers_per_window} kmers)")
    best = 0.0
    for w in range(N_WINDOWS):
        t = time.perf_counter()
        counts, total = window_fn(key_lo, key_hi, counts, resident)
        _ = int(jax.device_get(total))
        r = kmers_per_window / (time.perf_counter() - t)
        best = max(best, r)
        log(f"window {w}: {r/1e6:.1f} Mkmers/s")
    print(
        f"RESULT n_unique={len(entry_kmers)} buckets={table.n_buckets} "
        f"buf={BUF >> 20}Mi aug={aug} cap={cap} group={g} streams={streams} "
        f"mode={'meta' if use_meta else 'paged'} best={best/1e6:.1f} Mk/s"
    )


if __name__ == "__main__":
    main()
