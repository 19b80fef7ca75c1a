"""Attribute the plane-layout kernel regression (371 -> 345 Mk/s; kernel
~30 -> 35.5 ms/chunk per r9_plane_dissect.py) to a specific MXU dot form.

The plane relayout changed BOTH tile matmuls:

  dot1 (gather):  old  tb(gpb, 8W) x one_hot(gpb, L)  dims ((0,),(0,))  [lhsT]
                  new  tb(8W, gpb) x one_hot(gpb, L)  dims ((1,),(0,))  [canon]
  dot2 (count):   old  one_hot(gpb, L) x hits(K, L)   dims ((1,),(1,))  -> (gpb, K)
                  new  hits(K, L) x one_hot(gpb, L)   dims ((1,),(1,))  -> (K, gpb)

This microbench runs ITERS tile bodies (one-hot build + dot1 + packed
compares + dot2 + counts RMW, no DMA/schedule — the shapes of the production
bench config: L = S*cap = 7168, gpb = 128, 8W = 64) under 4 variants:

  old         both dots + counts layout as the pre-plane kernel
  new         both dots + counts layout as the plane kernel
  d1old       dot1 old (tb transposed), dot2 + counts new
  d2old       dot1 new, dot2 + counts old

CSE-safe: each variant chains R calls over DISTINCT query buffers inside one
jit and fetches a data-dependent sum once.
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

GPB = 128
W8 = 64  # 8 byte planes x K keys (aug = 1)
K = 8
LANES = 7168  # S=4 x cap=1792 (bench config)
ITERS = 4096
R = 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_kernel(variant):
    d1_old = variant in ("old", "d1old")
    d2_old = variant in ("old", "d2old")

    def kernel(tb_ref, q_ref, out_ref, counts):
        rows = lax.broadcasted_iota(jnp.int32, (GPB, LANES), 0)
        lane_pos = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        counts[...] = jnp.zeros_like(counts)
        qm_lo = q_ref[0:1, :]
        qm_hi = q_ref[1:2, :]
        u = jnp.uint32
        qp0 = (qm_lo & u(0xFFFFFF)).astype(jnp.int32).astype(jnp.float32)
        qp1 = ((qm_lo >> u(24)) | ((qm_hi & u(0xFFFF)) << u(8))).astype(
            jnp.int32
        ).astype(jnp.float32)
        qp2 = (qm_hi >> u(16)).astype(jnp.int32).astype(jnp.float32)

        def body(i, carry):
            tb = tb_ref[...]
            # per-iteration varying one-hot (prevents hoisting); live mask
            # depends on i as in the production window check
            local_bp = (lane_pos * 37 + i) & jnp.int32(GPB - 1)
            live = lane_pos >= (i & jnp.int32(63))
            one_hot = ((rows == local_bp) & live).astype(jnp.bfloat16)
            if d1_old:
                gathered = lax.dot_general(
                    tb, one_hot,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                gathered = lax.dot_general(
                    tb, one_hot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            g = [gathered[p * K : (p + 1) * K, :] for p in range(8)]
            gp0 = g[0] + 256.0 * g[1] + 65536.0 * g[2]
            gp1 = g[3] + 256.0 * g[4] + 65536.0 * g[5]
            gp2 = g[6] + 256.0 * g[7]
            hits = live & (gp0 == qp0) & (gp1 == qp1) & (gp2 == qp2)
            if d2_old:
                c = lax.dot_general(
                    one_hot, hits.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (gpb, K)
            else:
                c = lax.dot_general(
                    hits.astype(jnp.bfloat16), one_hot,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (K, gpb)
            counts[...] = counts[...] + c.astype(jnp.int32).astype(jnp.uint32)
            return carry

        lax.fori_loop(0, ITERS, body, 0)
        out_ref[...] = counts[...]

    cshape = (GPB, K) if d2_old else (K, GPB)
    tb_shape = (GPB, W8) if d1_old else (W8, GPB)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(cshape, jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(cshape, jnp.uint32)],
    )
    return call, tb_shape


def main():
    rng = np.random.default_rng(0)
    qs = [
        jnp.asarray(rng.integers(0, 1 << 32, (2, LANES), dtype=np.uint32))
        for _ in range(R)
    ]
    int(jnp.sum(qs[0]))  # device init + transfers — NOT the rtt
    rtt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        int(jnp.sum(qs[0]))
        rtt = min(rtt, time.perf_counter() - t0)
    log(f"rtt {rtt*1e3:.1f} ms  iters/call {ITERS}  R {R}")

    for variant in ("old", "new", "d1old", "d2old"):
        call, tb_shape = make_kernel(variant)
        tb = jnp.asarray(
            rng.integers(0, 256, tb_shape, dtype=np.int64).astype(np.float32),
            dtype=jnp.bfloat16,
        )

        @jax.jit
        def window(tb, qs):
            acc = jnp.uint32(0)
            for q in qs:
                acc = acc + jnp.sum(call(tb, q))
            return acc

        t0 = time.perf_counter()
        v = int(window(tb, qs))
        log(f"{variant}: compile+first {time.perf_counter() - t0:.1f}s (sum {v})")
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(window(tb, qs))
            best = min(best, time.perf_counter() - t0 - rtt)
        ns = best / (R * ITERS) * 1e9
        log(f"{variant}: {ns:.0f} ns/tile ({best*1e3:.1f} ms best window)")


if __name__ == "__main__":
    main()
