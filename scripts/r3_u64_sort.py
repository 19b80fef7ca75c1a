"""Last untested sort variant: ONE uint64 operand vs the production
(u32 key, u32 payload) variadic lax.sort.

The mixed-key layout already cut the sort to 2 operands (key m_lo + payload
m_hi, ~1.55 ns/elem at 13.4M — its measured variadic floor). If XLA:TPU's
u64 sort were priced like a single operand, packing (m_lo << 32 | m_hi) into
one u64 (order-compatible: m_lo is the high word, so u64 order == m_lo order
with m_hi tie-break — same bucket grouping) would shave the payload cost.
Plausibly it is instead emulated as (hi, lo) u32 pairs = the same 2-operand
sort plus pack/unpack. Measure, don't guess.

Windows chain DISTINCT inputs (CSE trap). Requires jax x64.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 13_440_000
D = 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    los = [rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32) for _ in range(D)]
    his = [rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32) for _ in range(D)]
    d_lo = [jax.device_put(x) for x in los]
    d_hi = [jax.device_put(x) for x in his]

    def win_pair(lo, hi):
        acc = jnp.uint32(0)
        for i in range(D):
            slo, shi = jax.lax.sort((lo[i], hi[i]), dimension=0, num_keys=1, is_stable=False)
            acc = acc + slo[::4096].sum() + shi[::4096].sum()
        return acc

    def win_u64(lo, hi):
        acc = jnp.uint32(0)
        for i in range(D):
            w = (lo[i].astype(jnp.uint64) << jnp.uint64(32)) | hi[i].astype(jnp.uint64)
            s = jax.lax.sort((w,), dimension=0, is_stable=False)[0]
            acc = acc + (s[::4096] >> jnp.uint64(32)).astype(jnp.uint32).sum() + (
                s[::4096].astype(jnp.uint32)
            ).sum()
        return acc

    def win_u64_presplit(lo, hi):
        # u64 sort, then unpack back to the kernel's two u32 arrays (the form
        # stream_count consumes) — charges the full unpack relayout
        acc = jnp.uint32(0)
        for i in range(D):
            w = (lo[i].astype(jnp.uint64) << jnp.uint64(32)) | hi[i].astype(jnp.uint64)
            s = jax.lax.sort((w,), dimension=0, is_stable=False)[0]
            slo = (s >> jnp.uint64(32)).astype(jnp.uint32)
            shi = s.astype(jnp.uint32)
            acc = acc + slo[::4096].sum() + shi[::4096].sum()
        return acc

    for name, fn in (("pair", win_pair), ("u64", win_u64), ("u64+unpack", win_u64_presplit)):
        f = jax.jit(fn)
        t = time.perf_counter()
        _ = int(jax.device_get(f(d_lo, d_hi)))
        log(f"{name:10s} compile+first {time.perf_counter()-t:.1f}s")
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            _ = int(jax.device_get(f(d_lo, d_hi)))
            best = min(best, time.perf_counter() - t)
        per = best / D / N * 1e9
        log(f"{name:10s} {per:6.2f} ns/elem ({best/D*1e3:.1f} ms per {N/1e6:.1f}M)")
        print(f"RESULT {name} {per:.2f} ns/elem")


if __name__ == "__main__":
    main()
