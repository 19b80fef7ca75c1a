"""Follow-up to r7_sort_context.py: isolate WHY 4 segment sorts in one jit
run at 2.16 ns/elem while one runs at 1.67 (flat floor 1.52).

  flat4    4 sorts of pre-materialized resident pairs in ONE jit
           -> 1.52: producers are the problem; 2.16: multi-sort scheduling
  barrier  the production 'four' shape with lax.optimization_barrier between
           the fused producers and each sort (forces a flat materialized
           sort input, cuts producer<->sort fusion)
  barrier1 single fused sort + barrier (does the barrier recover 1.52 from
           1.67?)

Usage: python scripts/r7b_sort_fix.py   Env: STEPS (default 8).

Memory note: ``flat_in`` keeps STEPS x 4 x 2 resident u32 arrays of ~13.79M
elements (~440 MB HBM per step, ~3.5 GB at the default STEPS=8) alongside the
other inputs — fine on a 16 GB v5e, but raising STEPS much past 16 will OOM.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

STEPS = int(os.environ.get("STEPS", 8))
N_WINDOWS = 3
PIECES = 31
R = 444_600
PAD = 2 * 1792


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from kmer_mapper_tpu.ops.u32hash import feistel_mix

    n = PIECES * R + PAD
    rng = np.random.default_rng(0)
    flat_in = [
        [
            (
                jax.device_put(rng.integers(0, 1 << 32, n, dtype=np.uint32)),
                jax.device_put(rng.integers(0, 1 << 32, n, dtype=np.uint32)),
            )
            for _ in range(4)
        ]
        for _ in range(STEPS)
    ]
    packed_in = [
        jax.device_put(rng.integers(0, 1 << 32, (10, R), dtype=np.uint32))
        for _ in range(STEPS)
    ]
    inv = jnp.uint32(0xFFFFFFFF)

    def produce_pieces(planes, seed):
        valid = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape(R) < R - 7
        los, his = [], []
        for i in range(PIECES):
            p, j = i % 16, i // 16
            w0 = planes[j % 10]
            w1 = planes[(j + 1) % 10]
            w2 = planes[(j + 2) % 10]
            s2 = 2 * p
            if s2:
                lo = (w0 >> s2) | (w1 << (32 - s2))
                hi = ((w1 >> s2) | (w2 << (32 - s2))) & jnp.uint32((1 << 30) - 1)
            else:
                lo, hi = w0, w1 & jnp.uint32((1 << 30) - 1)
            m_lo, m_hi = feistel_mix(lo, hi, seed=seed, xp=jnp)
            los.append(jnp.where(valid, m_lo, inv))
            his.append(jnp.where(valid, m_hi, inv))
        tail = jnp.full(PAD, inv, jnp.uint32)
        return jnp.concatenate(los + [tail]), jnp.concatenate(his + [tail])

    def consume(a, b):
        return a[::4096].astype(jnp.uint32).sum() + b[::4096].astype(jnp.uint32).sum()

    def win_flat4(steps):
        t = jnp.uint32(0)
        for quad in steps:
            for lo, hi in quad:
                slo, shi = lax.sort(
                    (lo, hi), dimension=0, num_keys=1, is_stable=False
                )
                t = t + consume(slo, shi)
        return t

    def win_barrier(steps):
        t = jnp.uint32(0)
        for planes in steps:
            for s in range(4):
                lo, hi = produce_pieces(jnp.roll(planes, s, axis=0), seed=3 + s)
                lo, hi = lax.optimization_barrier((lo, hi))
                slo, shi = lax.sort(
                    (lo, hi), dimension=0, num_keys=1, is_stable=False
                )
                t = t + consume(slo, shi)
        return t

    def win_barrier1(steps):
        t = jnp.uint32(0)
        for planes in steps:
            lo, hi = produce_pieces(planes, seed=3)
            lo, hi = lax.optimization_barrier((lo, hi))
            slo, shi = lax.sort((lo, hi), dimension=0, num_keys=1, is_stable=False)
            t = t + consume(slo, shi)
        return t

    f_rtt = jax.jit(lambda x: x[0] + jnp.uint32(1))
    z = jnp.zeros(4, jnp.uint32)
    _ = int(jax.device_get(f_rtt(z)))
    rtt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        _ = int(jax.device_get(f_rtt(z)))
        rtt = min(rtt, time.perf_counter() - t0)
    log(f"rtt {rtt * 1e3:.1f} ms  n={n}")

    cases = {
        "flat4": (win_flat4, flat_in, 4),
        "barrier": (win_barrier, packed_in, 4),
        "barrier1": (win_barrier1, packed_in, 1),
    }
    for name, (fn, data, segs) in cases.items():
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        _ = int(jax.device_get(jfn(data)))
        log(f"{name:9s} compile+first {time.perf_counter() - t0:.1f}s")
        best = 1e9
        for _ in range(N_WINDOWS):
            t0 = time.perf_counter()
            _ = int(jax.device_get(jfn(data)))
            best = min(best, time.perf_counter() - t0 - rtt)
        per_sort = best / STEPS / segs
        log(
            f"{name:9s} {per_sort * 1e3:8.2f} ms/segment-sort  "
            f"{per_sort / n * 1e9:6.2f} ns/elem"
        )


if __name__ == "__main__":
    main()
