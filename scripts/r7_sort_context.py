"""Why does the production per-segment sort run ~2.2 ns/elem when the flat
microbench says 1.55? (round-3 session 9)

The r5_budget dissection at HEAD attributes ~117 ms/chunk to the sort stage
(4 x ~13.9M-element 2-operand sorts should cost ~83 ms at the r3_seg_sort
flat rate). Candidate explanations, each isolated here on 8-distinct-buffer
CSE-free windows:

  flat    sort of a pre-materialized (n,) pair            -- the quoted floor
  concat  sort of jnp.concatenate of 31 device-resident pieces + tail
  fused   sort of 31 elementwise-PRODUCED pieces (shift/OR + feistel + where
          from one packed buffer), i.e. the production plane-hash producer
  four    4 independent 'fused' segment sorts in ONE jit (the production
          shape: plane_hash_mixed(segments=4) + per-segment lax.sort)

Usage: python scripts/r7_sort_context.py   Env: STEPS (default 8).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

STEPS = int(os.environ.get("STEPS", 8))
N_WINDOWS = 3
PIECES = 31
R = 444_600  # reads per segment at 64 Mi / 160-base stride / 4 segments
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

    # distinct device-resident inputs per step (the CSE trap)
    flat_in = [
        (
            jax.device_put(rng.integers(0, 1 << 32, n, dtype=np.uint32)),
            jax.device_put(rng.integers(0, 1 << 32, n, dtype=np.uint32)),
        )
        for _ in range(STEPS)
    ]
    piece_in = [
        [
            (
                jax.device_put(rng.integers(0, 1 << 32, R, dtype=np.uint32)),
                jax.device_put(rng.integers(0, 1 << 32, R, dtype=np.uint32)),
            )
            for _ in range(PIECES)
        ]
        for _ in range(STEPS)
    ]
    # one packed word buffer per step; 'fused' derives 31 pieces from it the
    # way plane_hash_mixed does (shift/OR over columns + feistel + where)
    packed_in = [
        jax.device_put(
            rng.integers(0, 1 << 32, (10, R), dtype=np.uint32)
        )
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

    def win_flat(steps):
        t = jnp.uint32(0)
        for lo, hi in steps:
            slo, shi = lax.sort((lo, hi), dimension=0, num_keys=1, is_stable=False)
            t = t + consume(slo, shi)
        return t

    def win_concat(steps):
        t = jnp.uint32(0)
        tail = jnp.full(PAD, inv, jnp.uint32)
        for pieces in steps:
            lo = jnp.concatenate([p[0] for p in pieces] + [tail])
            hi = jnp.concatenate([p[1] for p in pieces] + [tail])
            slo, shi = lax.sort((lo, hi), dimension=0, num_keys=1, is_stable=False)
            t = t + consume(slo, shi)
        return t

    def win_fused(steps):
        t = jnp.uint32(0)
        for planes in steps:
            lo, hi = produce_pieces(planes, seed=3)
            slo, shi = lax.sort((lo, hi), dimension=0, num_keys=1, is_stable=False)
            t = t + consume(slo, shi)
        return t

    def win_four(steps):
        # 4 segments derived from one 4x-taller packed buffer, sorted
        # independently inside the same jit -- the production shape
        t = jnp.uint32(0)
        for planes in steps:
            for s in range(4):
                # one seed across segments (production plane_hash_mixed shares
                # the table's single seed); the jnp.roll alone makes the four
                # subgraphs distinct, so CSE can't dedupe them
                lo, hi = produce_pieces(jnp.roll(planes, s, axis=0), seed=3)
                slo, shi = lax.sort(
                    (lo, hi), dimension=0, num_keys=1, is_stable=False
                )
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
    log(f"rtt {rtt * 1e3:.1f} ms  n={n} ({n / 1e6:.2f}M/segment)")

    cases = {
        "flat": (win_flat, flat_in, 1),
        "concat": (win_concat, piece_in, 1),
        "fused": (win_fused, packed_in, 1),
        "four": (win_four, packed_in, 4),
    }
    for name, (fn, data, segs) in cases.items():
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        _ = int(jax.device_get(jfn(data)))
        log(f"{name:7s} compile+first {time.perf_counter() - t0:.1f}s")
        best = 1e9
        for _ in range(N_WINDOWS):
            t0 = time.perf_counter()
            _ = int(jax.device_get(jfn(data)))
            best = min(best, time.perf_counter() - t0 - rtt)
        per_sort = best / STEPS / segs
        log(
            f"{name:7s} {per_sort * 1e3:8.2f} ms/segment-sort  "
            f"{per_sort / n * 1e9:6.2f} ns/elem"
        )


if __name__ == "__main__":
    main()
