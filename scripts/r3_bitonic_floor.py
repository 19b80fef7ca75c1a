"""Speed-of-light check for a custom Pallas bitonic/merge sort (VERDICT
candidate (a)): measure ONE compare-exchange stage's cost on v5e and
multiply by the stage count a bitonic sort needs.

A (m_lo, m_hi) compare-exchange at distance d (d >= 128, pairs as row
slices) is: cmp = a_lo <= b_lo; 4 selects. The kernel only needs the array
sorted to +-127 positions (the stream kernel's windows can absorb row-level
slack), which skips the 7 sub-128-distance stages of every merge level, but
a full sort still needs ~ sum_{l=8..24}(l-7) ~ 170+ stages at n = 13.4M.
If one stage costs S ms, a Pallas sort is bounded below by ~170*S_vpu plus
HBM passes — compare against XLA's measured flat sort (~20.8 ms).

Run: python scripts/r3_bitonic_floor.py
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = (16 << 20) // 151 * 121
STEPS = 8
D = 1 << 20  # compare-exchange distance (any d >= 128 behaves alike on rows)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    arrs = [
        tuple(
            jnp.asarray(rng.integers(0, 1 << 32, N // (2 * D) * (2 * D), dtype=np.int64).astype(np.uint32))
            for _ in range(2)
        )
        for _ in range(STEPS)
    ]
    m = arrs[0][0].shape[0]

    def one_stage(lo, hi):
        # pairs (i, i+D) within aligned 2D-blocks — the bitonic-merge shape
        lo2 = lo.reshape(-1, 2, D)
        hi2 = hi.reshape(-1, 2, D)
        a_lo, b_lo = lo2[:, 0], lo2[:, 1]
        a_hi, b_hi = hi2[:, 0], hi2[:, 1]
        swap = a_lo > b_lo
        n_lo = jnp.stack([jnp.where(swap, b_lo, a_lo), jnp.where(swap, a_lo, b_lo)], 1)
        n_hi = jnp.stack([jnp.where(swap, b_hi, a_hi), jnp.where(swap, a_hi, b_hi)], 1)
        return n_lo.reshape(-1), n_hi.reshape(-1)

    def mk(n_stages):
        def f(arrs):
            acc = jnp.uint32(0)
            for lo, hi in arrs:
                for _ in range(n_stages):
                    lo, hi = one_stage(lo, hi)
                acc = acc + jnp.sum(lo[::65536] ^ hi[::65536])
            return acc

        return jax.jit(f)

    f_rtt = jax.jit(lambda x: x[0] + jnp.uint32(1))
    _ = int(jax.device_get(f_rtt(arrs[0][0])))

    results = {}
    for n_stages in (1, 4):
        f = mk(n_stages)
        t = time.perf_counter()
        _ = int(jax.device_get(f(arrs)))
        log(f"stages={n_stages}: compile+first {time.perf_counter()-t:.1f}s")
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            _ = int(jax.device_get(f(arrs)))
            best = min(best, (time.perf_counter() - t) / STEPS)
        results[n_stages] = best
        log(f"stages={n_stages}: {best*1e3:7.2f} ms/chunk")
    per_stage = (results[4] - results[1]) / 3
    est = 170 * per_stage * 1e3
    log(
        f"per-stage {per_stage*1e3:.3f} ms ({per_stage/m*1e12:.1f} ps/elem); "
        f"~170-stage bitonic sort floor ~= {est:.1f} ms vs XLA flat sort 20.8 ms"
    )
    print(f"RESULT per_stage_ms={per_stage*1e3:.3f} bitonic_est_ms={est:.1f}")


if __name__ == "__main__":
    main()
