"""Round-2 design probe: cost of sort variants on the real TPU.

Measures, at 16 Mi queries (one production chunk):
  a) 3-operand sort (bucket, lo, hi) num_keys=1   -- the round-1 grouping
  b) 2-operand sort (mlo, mhi)     num_keys=2     -- mixed-key candidate
  c) 2-operand sort (mlo, mhi)     num_keys=1     -- grouping-only variant
  d) 1-operand sort (mlo)                          -- lower bound
  e) bucket_of + where (the key prep the mixed design removes)

Timing per CLAUDE.md gotchas: chain REPS iterations inside one jit and fetch
a data-dependent scalar (block_until_ready is unreliable over the tunnel).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = 16 << 20
REPS = 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = int(np.asarray(jax.device_get(out)).ravel()[0])  # compile+run
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        out = f(*args)
        _ = int(np.asarray(jax.device_get(out)).ravel()[0])
        dt = (time.perf_counter() - t) / REPS
        best = min(best, dt)
    log(f"{name:34s} {best * 1e3:8.2f} ms/rep   ({best / N * 1e9:.2f} ns/elem)")
    return best


def chain(body):
    """Run body REPS times with a data dependency between iterations."""

    def run(*arrays):
        def step(carry, _):
            arrs = tuple(a ^ carry for a in arrays)
            r = body(*arrs)
            carry = r[0][0] if isinstance(r, tuple) else r[0]
            return carry.astype(jnp.uint32), None

        carry, _ = lax.scan(step, jnp.uint32(0), None, length=REPS)
        return carry

    return run


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    rng = np.random.default_rng(0)
    lo = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 21, N, dtype=np.uint64).astype(np.uint32))

    timed(
        "3-op sort (b,lo,hi) nk=1",
        chain(lambda b, lo, hi: lax.sort((b, lo, hi), dimension=0, num_keys=1, is_stable=False)),
        b, lo, hi,
    )
    timed(
        "2-op sort (lo,hi) nk=2",
        chain(lambda lo, hi: lax.sort((lo, hi), dimension=0, num_keys=2, is_stable=False)),
        lo, hi,
    )
    timed(
        "2-op sort (lo,hi) nk=1",
        chain(lambda lo, hi: lax.sort((lo, hi), dimension=0, num_keys=1, is_stable=False)),
        lo, hi,
    )
    timed(
        "1-op sort (lo)",
        chain(lambda lo: (lax.sort(lo, dimension=0, is_stable=False),)),
        lo,
    )

    from kmer_mapper_tpu.ops.u32hash import bucket_of

    def prep(lo, hi):
        bb = bucket_of(lo, hi, 1 << 21, seed=0, xp=jnp)
        return (jnp.where(hi > 0, bb, jnp.uint32(0xFFFFFFFF)),)

    timed("bucket_of + where (key prep)", chain(prep), lo, hi)

    # feistel candidate: 3 fmix rounds on (lo, hi)
    from kmer_mapper_tpu.ops.u32hash import fmix32

    def feistel(lo, hi):
        a, b_ = lo, hi
        for c in (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35):
            a, b_ = b_, a ^ fmix32(b_ ^ jnp.uint32(c), xp=jnp)
        return a, b_

    timed("feistel mix (3 rounds)", chain(feistel), lo, hi)


if __name__ == "__main__":
    main()
