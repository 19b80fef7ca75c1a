"""Does lax.sort cost scale with key width? The stream kernel only needs
queries grouped by CHAIN_BLOCK-aligned block (bucket >> 7: 14 bits at the
production table size), not by full bucket — if a u16 key sorts faster than
u32, the sort stage shrinks with zero semantic change (the full bucket rides
as a payload, or is recomputed in-kernel).

Variants (16.8M elements, payloads lo/hi u32, unstable, num_keys=1):
  u32b   key = full bucket (u32)            — production today
  u32k   key = block id as u32              — same width, fewer distinct
  u16k   key = block id as u16
  u8k    key = bucket >> 13 as u8 (256 groups; just to map width scaling)
  u16k3  u16 key + THREE u32 payloads (bucket carried, not recomputed)
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = 16 << 20


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.integers(0, 1 << 21, N, dtype=np.int64).astype(np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.int64).astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int64).astype(np.uint32))

    def mk(variant):
        def f(b, lo, hi):
            if variant == "u32b":
                ops = (b, lo, hi)
            elif variant == "u32k":
                ops = (b >> 7, lo, hi)
            elif variant == "u16k":
                ops = ((b >> 7).astype(jnp.uint16), lo, hi)
            elif variant == "u8k":
                ops = ((b >> 13).astype(jnp.uint8), lo, hi)
            elif variant == "u16k3":
                ops = ((b >> 7).astype(jnp.uint16), b, lo, hi)
            out = lax.sort(ops, dimension=0, num_keys=1, is_stable=False)
            return sum(o[0].astype(jnp.uint32) + o[-1].astype(jnp.uint32) for o in out)

        return jax.jit(f)

    f_rtt = jax.jit(lambda x: x[0] + jnp.uint32(1))
    _ = int(jax.device_get(f_rtt(b)))
    rtt = 1e9
    for _ in range(5):
        t = time.perf_counter()
        _ = int(jax.device_get(f_rtt(b)))
        rtt = min(rtt, time.perf_counter() - t)
    log(f"rtt {rtt * 1e3:.1f} ms")
    for variant in ("u32b", "u32k", "u16k", "u8k", "u16k3"):
        try:
            f = mk(variant)
            t = time.perf_counter()
            _ = int(jax.device_get(f(b, lo, hi)))
            log(f"{variant:6s} compile+first {time.perf_counter() - t:.1f}s")
            best = 1e9
            for _ in range(3):
                t = time.perf_counter()
                _ = int(jax.device_get(f(b, lo, hi)))
                best = min(best, time.perf_counter() - t - rtt)
            log(f"{variant:6s} {best * 1e3:7.2f} ms  ({best / N * 1e9:5.2f} ns/elem)")
        except Exception as e:  # noqa: BLE001
            log(f"{variant:6s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
