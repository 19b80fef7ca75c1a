"""(max_load, aug) sweep of the composed chunk step, CSE-free windows.

Chain augmentation (layout.aug_keys) prices chains at a wider per-tile
compare instead of extra scheduled round tiles, which should move the
optimal table density: fewer, denser blocks mean fewer tiles, less table
DMA, and less per-block boundary waste. Measures the same window as
bench.py at a given (max_load, aug, [cap]).

Usage: python scripts/r3_aug_sweep.py MAX_LOAD AUG [CAP] [N_BUCKETS] [PROBE_LIMIT]
(N_BUCKETS forces the table size past the pow2 default; PROBE_LIMIT raises
layout.MAX_PROBE_LIMIT so dense tables build instead of growing back.)
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
N_UNIQUE = 4_000_000
STEPS = 8
N_WINDOWS = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    max_load = float(sys.argv[1])
    aug = int(sys.argv[2])
    cap_arg = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    n_buckets_arg = int(sys.argv[4]) if len(sys.argv) > 4 else None
    probe_limit = int(sys.argv[5]) if len(sys.argv) > 5 else None

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
    from bench import make_read_chunk

    rng = np.random.default_rng(0)
    chunks = [make_read_chunk(rng, BUF) for _ in range(STEPS)]
    sample_codes = oracle.encode_bytes(chunks[0].bases[: READ_LEN * 5000])
    sample_kmers = oracle.kmer_hashes(sample_codes, K)
    entry_kmers = np.unique(
        np.concatenate(
            [
                rng.integers(0, 1 << 62, N_UNIQUE // 2, dtype=np.uint64),
                rng.choice(sample_kmers, N_UNIQUE // 2),
            ]
        )
    )
    t = time.perf_counter()
    table = layout.build_table(
        entry_kmers, max_load=max_load, n_buckets=n_buckets_arg,
        max_probe_limit=probe_limit or layout.MAX_PROBE_LIMIT,
    )
    bp = table.block_max_probe()
    log(
        f"load={max_load} aug={aug}: {table.n_buckets} buckets "
        f"(lambda={len(entry_kmers)/table.n_buckets:.2f}/bucket), "
        f"max_probe={table.max_probe}, block rounds mean={bp.mean():.2f} "
        f"p99={np.percentile(bp, 99):.0f}, built {time.perf_counter()-t:.1f}s"
    )

    cap = cap_arg or auto_stream_cap(BUF, table.n_buckets, READ_LEN)
    config = default_config(
        k=K, buf=BUF, max_reads=BUF // 64, read_len=READ_LEN,
        stream_cap=cap, aug=aug,
    )
    log(f"cap={cap} sched-rounds mean={np.ceil(bp/aug).mean():.2f}")
    packed = [
        next(iter(pack_for_device(iter([c]), config.buf, config.max_reads, K)))
        for c in chunks
    ]
    if aug > 1:
        key_lo, key_hi = (jax.device_put(a) for a in table.aug_keys(aug))
    else:
        key_lo = jax.device_put(table.key_lo)
        key_hi = jax.device_put(table.key_hi)
    counts = jax.device_put(jnp.zeros(table.n_slots, dtype=jnp.uint32))
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
    print(f"RESULT load={max_load} aug={aug} cap={cap} best={best/1e6:.1f} Mk/s")


if __name__ == "__main__":
    main()
