"""Isolate the plane-layout kernel's NEW per-tile overhead (bench kernel
~30 -> 35.5 ms/chunk while r9_dot_orient says the dot body got ~0.7 us/tile
FASTER) by replicating the real kernel's grid/scratch structure — per-grid-
step table byte prep + counts copy, per-tile dynamic untiled-dim scratch
reads, counts RMW — with the production bench shapes (gpb=128, 8W=64,
lanes=4*1792, coarse=16, 512 grid steps, ~18 tiles/step).

Variants:
  newfull   3-D plane scratch: tb = tb_s[g], counts_out[g] RMW   (HEAD)
  tbstatic  newfull but tb read at a STATIC leading index
  rmwstatic newfull but counts RMW at a STATIC leading index
  noprep    newfull but tb_s written once (grid step 0 only)
  oldfull   2-D layout: tb_s (coarse*gpb, 8W) sublane-ds slices,
            counts (coarse*gpb, K) sublane-ds RMW, old dot orientations

CSE-safe: R calls over distinct query buffers chained in one jit; fetches a
data-dependent sum. Usage: python scripts/r9_step_parts.py [variants...]
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

GPB = 128
W8 = 64  # 8 byte planes x aug*K key words
K = 8
LANES = 7168  # S=4 x cap=1792 (bench config)
COARSE = 16
GRID = 512  # 8192 chain blocks / coarse
TILES = 18  # per grid step -> 9216 tiles/chunk (~bench tile count)
R = 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def _bytes8_2d(lo, hi):
    u = jnp.uint32
    out = []
    for w in (lo, hi):
        for b in range(4):
            out.append(((w >> u(8 * b)) & u(0xFF)).astype(jnp.int32).astype(jnp.float32))
    return out


def make_kernel(variant):
    three_d = variant != "oldfull"
    tb_static = variant == "tbstatic"
    rmw_static = variant == "rmwstatic"
    prep_once = variant == "noprep"

    def kernel(key_lo_ref, key_hi_ref, counts_in, q_ref, counts_out, tb_s):
        ci = pl.program_id(0)
        counts_out[...] = counts_in[...]

        def write_tb():
            planes = _bytes8_2d(key_lo_ref[...], key_hi_ref[...])
            ax = 1 if three_d else 1  # (coarse, W, gpb) ax1 / (coarse*gpb, W) ax1
            tb_s[...] = jnp.concatenate(planes, axis=ax).astype(jnp.bfloat16)

        if prep_once:
            @pl.when(ci == 0)
            def _():
                write_tb()
        else:
            write_tb()

        rows = lax.broadcasted_iota(jnp.int32, (GPB, LANES), 0)
        lane_pos = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        qm_lo = q_ref[0:1, :]
        qm_hi = q_ref[1:2, :]
        u = jnp.uint32
        qp0 = (qm_lo & u(0xFFFFFF)).astype(jnp.int32).astype(jnp.float32)
        qp1 = ((qm_lo >> u(24)) | ((qm_hi & u(0xFFFF)) << u(8))).astype(
            jnp.int32
        ).astype(jnp.float32)
        qp2 = (qm_hi >> u(16)).astype(jnp.int32).astype(jnp.float32)

        def body(ti, carry):
            g = (ti * 7 + ci) % jnp.int32(COARSE)
            if three_d:
                tb = tb_s[jnp.int32(0) if tb_static else g]
            else:
                row0 = pl.multiple_of(
                    (jnp.int32(0) if tb_static else g) * GPB, GPB
                )
                tb = tb_s[pl.ds(row0, GPB), :]
            local_bp = (lane_pos * 37 + ti + ci) & jnp.int32(GPB - 1)
            live = lane_pos >= (ti & jnp.int32(63))
            one_hot = ((rows == local_bp) & live).astype(jnp.bfloat16)
            if three_d:
                gathered = lax.dot_general(
                    tb, one_hot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                gathered = lax.dot_general(
                    tb, one_hot,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            gs = [gathered[p * K : (p + 1) * K, :] for p in range(8)]
            gp0 = gs[0] + 256.0 * gs[1] + 65536.0 * gs[2]
            gp1 = gs[3] + 256.0 * gs[4] + 65536.0 * gs[5]
            gp2 = gs[6] + 256.0 * gs[7]
            hits = live & (gp0 == qp0) & (gp1 == qp1) & (gp2 == qp2)
            if three_d:
                c = lax.dot_general(
                    hits.astype(jnp.bfloat16), one_hot,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (K, gpb)
                gi = jnp.int32(0) if rmw_static else g
                counts_out[gi] = counts_out[gi] + c.astype(jnp.int32).astype(
                    jnp.uint32
                )
            else:
                c = lax.dot_general(
                    one_hot, hits.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (gpb, K)
                row0 = pl.multiple_of(
                    (jnp.int32(0) if rmw_static else g) * GPB, GPB
                )
                counts_out[pl.ds(row0, GPB), :] = counts_out[
                    pl.ds(row0, GPB), :
                ] + c.astype(jnp.int32).astype(jnp.uint32)
            return carry

        lax.fori_loop(0, TILES, body, 0)

    if three_d:
        kshape = (COARSE, K, GPB)
        cshape = (COARSE, K, GPB)
        tbshape = (COARSE, W8, GPB)
        kspec = pl.BlockSpec((1 * COARSE, K, GPB), lambda i: (0, 0, 0))
        cspec = pl.BlockSpec((COARSE, K, GPB), lambda i: (0, 0, 0))
    else:
        kshape = (COARSE * GPB, K)
        cshape = (COARSE * GPB, K)
        tbshape = (COARSE * GPB, W8)
        kspec = pl.BlockSpec((COARSE * GPB, K), lambda i: (0, 0))
        cspec = pl.BlockSpec((COARSE * GPB, K), lambda i: (0, 0))
    call = pl.pallas_call(
        kernel,
        grid=(GRID,),
        out_shape=jax.ShapeDtypeStruct(cshape, jnp.uint32),
        in_specs=[kspec, kspec, cspec, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=cspec,
        scratch_shapes=[pltpu.VMEM(tbshape, jnp.bfloat16)],
        input_output_aliases={2: 0},
    )
    return call, kshape, cshape


def main():
    variants = sys.argv[1:] or ["newfull", "tbstatic", "rmwstatic", "noprep", "oldfull"]
    rng = np.random.default_rng(0)
    qs = [
        jnp.asarray(rng.integers(0, 1 << 32, (2, LANES), dtype=np.uint32))
        for _ in range(R)
    ]
    int(jnp.sum(qs[0]))
    rtt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        int(jnp.sum(qs[0]))
        rtt = min(rtt, time.perf_counter() - t0)
    log(f"rtt {rtt*1e3:.1f} ms  grid {GRID} x tiles {TILES}  R {R}")

    for variant in variants:
        call, kshape, cshape = make_kernel(variant)
        klo = jnp.asarray(rng.integers(0, 1 << 32, kshape, dtype=np.uint32))
        khi = jnp.asarray(rng.integers(0, 1 << 32, kshape, dtype=np.uint32))

        @jax.jit
        def window(klo, khi, qs):
            acc = jnp.uint32(0)
            c = jnp.zeros(cshape, jnp.uint32)
            for q in qs:
                c = call(klo, khi, c, q)
                acc = acc + c.reshape(-1)[::4096].sum()
            return acc

        t0 = time.perf_counter()
        v = int(window(klo, khi, qs))
        log(f"{variant}: compile+first {time.perf_counter() - t0:.1f}s (sum {v})")
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(window(klo, khi, qs))
            best = min(best, time.perf_counter() - t0 - rtt)
        per_chunk = best / R * 1e3
        ns = best / (R * GRID * TILES) * 1e9
        log(f"{variant}: {per_chunk:.1f} ms/chunk-equivalent  {ns:.0f} ns/tile")


if __name__ == "__main__":
    main()
