"""Where does the REAL stream kernel spend its ~2.3 us/tile (vs the 551 ns an
equivalent microbench body costs — r3_iter_floor.py)?

Times stream_count standalone (sort done once, outside the window) under
kernel variants:

  prod      the production kernel as-is (max_probe=2, cond-gated round 2)
  mp1       max_probe forced to 1 (no cond, no roll, no second round) —
            counting is wrong for the ~2% chained blocks; timing only
  uncond    max_probe=2 but rounds run unconditionally (no lax.cond)

If mp1 ~= microbench, the cond/roll chain is the 4x. If mp1 is still slow,
the gap is in the window logic / dynamic counts RMW / DMA alignment.
"""
import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kmer_mapper_tpu.index import layout
from kmer_mapper_tpu.ops import stream_probe
from kmer_mapper_tpu.ops.u32hash import split_u64

N = 16 << 20
REPS = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << 62, 4_000_000, dtype=np.uint64))
    table = layout.build_table(keys)
    bp = table.block_max_probe()
    log(f"n_buckets={table.n_buckets} max_probe={table.max_probe} "
        f"chained={int((bp > 1).sum())}/{len(bp)}")
    queries = np.concatenate([
        rng.choice(keys, N // 2),
        rng.integers(0, 1 << 62, N - N // 2, dtype=np.uint64),
    ])
    qlo, qhi = split_u64(queries)
    klo, khi = jnp.asarray(table.key_lo), jnp.asarray(table.key_hi)
    sb, slo, shi = jax.jit(
        lambda a, b, v: stream_probe.sort_queries(a, b, v, table.n_buckets, table.seed)
    )(jnp.asarray(qlo), jnp.asarray(qhi), jnp.ones(N, bool))
    bpb = min(layout.CHAIN_BLOCK, table.n_buckets)
    off = jax.jit(
        lambda s: stream_probe.block_offsets(s, table.n_buckets, bpb)
    )(sb)
    counts = jnp.zeros(table.n_slots, jnp.uint32)
    n_tiles = int(jax.device_get(
        jnp.sum(jnp.where(
            off[1:] > off[:-1],
            (off[1:] - (off[:-1] & ~jnp.int32(127)) + 1023) // 1024,
            0,
        ))
    ))
    log(f"n_tiles={n_tiles}")

    variants = {
        "prod": dict(max_probe=table.max_probe, block_probe=np.asarray(bp)),
        "mp1": dict(max_probe=1, block_probe=np.ones_like(np.asarray(bp))),
        "uncond": dict(
            max_probe=table.max_probe,
            block_probe=np.full_like(np.asarray(bp), 1_000_000),
        ),
    }
    # uncond: block_probe huge -> p < probe_limit always true -> XLA folds the
    # cond? No: probe_limit is data. Instead make every cond take the True
    # branch so timing includes an unconditional round 2. The cond itself
    # still executes; compare against mp1 to separate cond overhead from the
    # round-2 compute.
    f_rtt = jax.jit(lambda x: x[0] + jnp.uint32(1))
    _ = int(jax.device_get(f_rtt(counts)))
    rtt = 1e9
    for _ in range(5):
        t = time.perf_counter()
        _ = int(jax.device_get(f_rtt(counts)))
        rtt = min(rtt, time.perf_counter() - t)
    log(f"rtt {rtt * 1e3:.1f} ms")

    for name, kw in variants.items():
        def chain(kl, kh, c, sb, slo, shi, off, _kw=kw):
            for _ in range(REPS):
                c = stream_probe.stream_count(
                    kl, kh, c, sb, slo, shi, off, _kw["max_probe"],
                    block_probe=jnp.asarray(_kw["block_probe"]),
                )
            return c.sum()

        f = jax.jit(chain)
        try:
            t = time.perf_counter()
            s = int(jax.device_get(f(klo, khi, counts, sb, slo, shi, off)))
            log(f"{name:7s} compile+first {time.perf_counter() - t:.1f}s sum={s}")
            best = 1e9
            for _ in range(3):
                t = time.perf_counter()
                s = int(jax.device_get(f(klo, khi, counts, sb, slo, shi, off)))
                best = min(best, (time.perf_counter() - t - rtt) / REPS)
            log(f"{name:7s} {best * 1e3:7.2f} ms  ({best / n_tiles * 1e9:6.0f} ns/tile, "
                f"{N / best / 1e6:5.0f} Mq/s)")
        except Exception as e:  # noqa: BLE001
            log(f"{name:7s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
