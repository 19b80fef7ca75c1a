"""Segmented (batched) lax.sort cost vs flat, CSE-free (distinct inputs).

The production 16 Mi chunk sorts ~13.44M (m_lo, m_hi) pairs in one flat
2-operand sort (~21.5 ms honest). If a batched sort over [S, n/S] rows is
materially cheaper (the 16->64 Mi scaling suggested per-elem cost grows
faster than log n), the kernel can consume S per-block windows instead of
one, trading a few extra scheduled tiles for the sort's log factor.

Run on the real TPU:  python scripts/r3_seg_sort.py
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = (16 << 20) // 151 * 121  # 13,443,947 valid windows per 16 Mi chunk
STEPS = 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    arrs = [
        tuple(
            jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.int64).astype(np.uint32))
            for _ in range(2)
        )
        for _ in range(STEPS)
    ]
    f_rtt = jax.jit(lambda x: x[0] + jnp.uint32(1))
    _ = int(jax.device_get(f_rtt(arrs[0][0])))
    rtt = 1e9
    for _ in range(5):
        t = time.perf_counter()
        _ = int(jax.device_get(f_rtt(arrs[0][0])))
        rtt = min(rtt, time.perf_counter() - t)
    log(f"rtt {rtt * 1e3:.1f} ms  (n={N})")

    def mk(S):
        m = N // S * S  # truncate to a multiple (microbench only)

        def f(arrs):
            acc = jnp.uint32(0)
            for lo, hi in arrs:
                if S == 1:
                    out = lax.sort((lo, hi), dimension=0, num_keys=1, is_stable=False)
                    acc = acc + out[0][0] + out[1][-1]
                else:
                    lo2 = lo[:m].reshape(S, m // S)
                    hi2 = hi[:m].reshape(S, m // S)
                    out = lax.sort((lo2, hi2), dimension=1, num_keys=1, is_stable=False)
                    acc = acc + out[0][0, 0] + out[1][-1, -1]
            return acc

        return jax.jit(f)

    for S in (1, 2, 4, 8, 16, 32, 64):
        try:
            f = mk(S)
            t = time.perf_counter()
            _ = int(jax.device_get(f(arrs)))
            log(f"S={S:<3d} compile+first {time.perf_counter() - t:.1f}s")
            best = 1e9
            for _ in range(3):
                t = time.perf_counter()
                _ = int(jax.device_get(f(arrs)))
                best = min(best, (time.perf_counter() - t - rtt) / STEPS)
            log(f"S={S:<3d} {best * 1e3:7.1f} ms  ({best / N * 1e9:5.2f} ns/elem)")
        except Exception as e:  # noqa: BLE001
            log(f"S={S:<3d} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
