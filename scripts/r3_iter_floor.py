"""Decompose the stream kernel's ~0.9 us/iteration floor on real TPU.

The r2 dissection (r2_kernel_dissect.py) showed ~15.4 ms of per-block cost
with EMPTY tile bodies at the production config (~16-17k iterations) — ~0.9 us
per iteration of pure control. This script isolates what an iteration of a
Mosaic fori_loop actually costs, piece by piece:

  loop   fori_loop with a scalar-add body only
  smem   + 2 scalar-prefetch (SMEM) reads per iteration
  vmem   + a (1, cap) VMEM slice read at a dynamic leading index
  mm     + the real per-tile compute (one-hot, gather matmul, compares,
           count matmul, counts RMW) on scratch garbage — no DMA
  dma    + per-iteration fused (4, cap) HBM->VMEM DMA (4-deep pipeline),
           body otherwise = smem
  full   dma + mm (everything the real kernel does per tile)
  grid   trivial body, grid=(N_GRID,) — per-grid-step overhead

Interpretation: if `loop`/`smem` are already ~0.9 us, the floor is Mosaic
scalar-loop codegen and the only lever is fewer/fatter iterations. If `dma`
carries the cost, replacing per-tile DMA with grid-level pipelining wins.
"""
import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

CAP = 1024
BPB = 128
K = 8
N_ITER = 16384
N_GRID = 1024
REPS = 8
N_SLOTS = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def _bytes8(lo, hi):
    planes = []
    for word in (lo, hi):
        for shift in (0, 8, 16, 24):
            planes.append(
                ((word >> shift) & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32)
            )
    return planes


def make_variant(variant):
    grid = N_GRID if variant == "grid" else 1
    iters = 1 if variant == "grid" else N_ITER

    def kernel(off_ref, tb_ref, q_hbm, out_ref, q_s, acc, sems):
        rows = lax.broadcasted_iota(jnp.int32, (BPB, CAP), 0)
        lane_pos = lax.broadcasted_iota(jnp.int32, (1, CAP), 1)

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            acc[...] = jnp.zeros_like(acc)

        use_dma = variant in ("dma", "full")
        use_mm = variant in ("mm", "full")

        def dma_at(t, slot):
            o = pl.multiple_of((t % 64) * CAP, CAP)
            return pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(o, CAP)], q_s.at[slot], sems.at[slot]
            )

        if use_dma:
            for w in range(N_SLOTS - 1):
                dma_at(w, w % N_SLOTS).start()

        def body(t, carry):
            if variant == "loop" or variant == "grid":
                return carry + t
            # 2 SMEM reads per iteration (like the meta schedule)
            a = off_ref[t % 8192]
            b = off_ref[8192 + t % 8192]
            carry = carry + a
            if variant == "smem":
                return carry + b
            slot = t % N_SLOTS
            if use_dma:
                @pl.when(t + N_SLOTS - 1 < iters)
                def _():
                    dma_at(t + N_SLOTS - 1, (t + N_SLOTS - 1) % N_SLOTS).start()
                dma_at(t, slot).wait()
            if variant == "vmem":
                v = q_s[slot, 0:1, :].astype(jnp.int32)
                acc[0:1, :] = acc[0:1, :] + v.astype(jnp.float32)
                return carry + b
            if use_mm or variant == "dma":
                qb = q_s[slot, 0:1, :].astype(jnp.int32)
                if variant == "dma":
                    acc[0:1, :] = acc[0:1, :] + qb.astype(jnp.float32)
                    return carry + b
                # full per-tile compute on whatever is in scratch
                start, end = a, a + jnp.int32(CAP)
                pos = (t % 64) * CAP + lane_pos
                live = (pos >= start) & (pos < end)
                local_b = qb - (b % 997)
                live = live & (local_b >= 0) & (local_b < BPB)
                one_hot = ((rows == local_b) & live).astype(jnp.bfloat16)
                qh = _bytes8(q_s[slot, 1:2, :], q_s[slot, 2:3, :])
                tb = tb_ref[...].astype(jnp.bfloat16)
                gathered = lax.dot_general(
                    tb, one_hot,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                hits = live
                for plane in range(8):
                    hits = hits & (gathered[plane * K:(plane + 1) * K, :] == qh[plane])
                c = lax.dot_general(
                    one_hot, hits.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc[0:BPB, 0:K] = acc[0:BPB, 0:K] + c
            return carry + b

        total = lax.fori_loop(0, iters, body, jnp.int32(0))
        out_ref[0:1, :] = out_ref[0:1, :] + total.astype(jnp.float32)
        out_ref[1:, :] = out_ref[1:, :] + acc[0:BPB - 1, 0:K]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BPB, 8 * K), lambda i, off: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((BPB, K), lambda i, off: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, 4, CAP), jnp.uint32),
            pltpu.VMEM((BPB, CAP), jnp.float32),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
        ],
    )

    def run(scalars, tb, q):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((BPB, K), jnp.float32),
        )(scalars, tb, q)

    return run


def main():
    rng = np.random.default_rng(0)
    scalars = jnp.asarray(rng.integers(0, 1 << 20, 2 * 8192, dtype=np.int32))
    tb = jnp.asarray(rng.random((BPB, 8 * K), dtype=np.float32))
    q = jnp.asarray(rng.integers(0, 1 << 30, (4, 64 * CAP), dtype=np.int64).astype(np.uint32))
    # host<->device RTT through the tunnel: subtract from every window
    f_rtt = jax.jit(lambda x: x[0] + 1)
    _ = float(jax.device_get(f_rtt(tb[0])))
    rtt = 1e9
    for _ in range(5):
        t = time.perf_counter()
        _ = float(jax.device_get(f_rtt(tb[0])))
        rtt = min(rtt, time.perf_counter() - t)
    log(f"rtt baseline {rtt * 1e3:.1f} ms")
    for variant in ("loop", "smem", "vmem", "dma", "mm", "full", "grid"):
        try:
            run = make_variant(variant)

            def chain(scalars, tb, q):
                s = jnp.float32(0)
                for _ in range(REPS):
                    out = run(scalars, tb, q)
                    s = s + out[0, 0] + out[1, 1]
                    scalars = scalars + jnp.int32(1)  # defeat CSE across reps
                return s

            f = jax.jit(chain)
            t = time.perf_counter()
            _ = float(np.asarray(jax.device_get(f(scalars, tb, q))))
            log(f"{variant:5s} compile+first {time.perf_counter() - t:.1f}s")
            best = 1e9
            for _ in range(3):
                t = time.perf_counter()
                _ = float(np.asarray(jax.device_get(f(scalars, tb, q))))
                best = min(best, (time.perf_counter() - t - rtt) / REPS)
            n = N_GRID if variant == "grid" else N_ITER
            log(f"{variant:5s} {best * 1e3:8.3f} ms  = {best / n * 1e9:7.1f} ns per unit")
        except Exception as e:  # noqa: BLE001
            log(f"{variant:5s} FAILED: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
