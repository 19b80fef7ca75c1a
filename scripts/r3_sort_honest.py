"""Honest (CSE-free) lax.sort costs: 8 DISTINCT arrays chained in one jit.

The r2 'payload operands are free' conclusion came from windows where XLA
CSE-deduped repeated sorts; re-measure with distinct inputs.

Variants at n = 53.76M u32 elements (the production fixed-path sort size):
  k1p0   sort (b,)               key only
  k1p1   sort (b, lo)            1 payload
  k1p2   sort (b, lo, hi)        2 payloads — production
  k2p1   sort (b, lo, hi) nk=2   2 keys
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = (64 << 20) // 151 * 121
STEPS = 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    arrs = [
        tuple(
            jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.int64).astype(np.uint32))
            for _ in range(3)
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

    def mk(variant):
        def f(arrs):
            acc = jnp.uint32(0)
            for b, lo, hi in arrs:
                if variant == "k1p0":
                    ops, nk = (b,), 1
                elif variant == "k1p1":
                    ops, nk = (b, lo), 1
                elif variant == "k1p2":
                    ops, nk = (b, lo, hi), 1
                else:
                    ops, nk = (b, lo, hi), 2
                out = lax.sort(ops, dimension=0, num_keys=nk, is_stable=False)
                acc = acc + sum(o[0] + o[-1] for o in out)
            return acc

        return jax.jit(f)

    for variant in ("k1p0", "k1p1", "k1p2", "k2p1"):
        try:
            f = mk(variant)
            t = time.perf_counter()
            _ = int(jax.device_get(f(arrs)))
            log(f"{variant:5s} compile+first {time.perf_counter() - t:.1f}s")
            best = 1e9
            for _ in range(3):
                t = time.perf_counter()
                _ = int(jax.device_get(f(arrs)))
                best = min(best, (time.perf_counter() - t - rtt) / STEPS)
            log(f"{variant:5s} {best * 1e3:7.1f} ms  ({best / N * 1e9:5.2f} ns/elem)")
        except Exception as e:  # noqa: BLE001
            log(f"{variant:5s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
