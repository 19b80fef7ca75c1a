"""FROZEN round-2 measurement artifact: written against the pre-mixed-key
stream API (3-operand sort_queries / stream_count); kept for the measurement
record, NOT runnable against the current code. Round-3 equivalents:
r3_s_dissect.py, r3_true_window.py, r3_composed_sweep.py.

Dissect the stream kernel's per-iteration cost on real TPU hardware.

Compiles variants of the kernel with pieces removed to attribute the measured
~1.2 us/iteration (40 ms / ~34k iterations at the production config):

  full      the real kernel
  nomm2     skip the counts-contribution matmul (hits reduced cheaply)
  nomm1     skip the gather matmul + compares (one-hot summed directly)
  nohot     one-hot replaced by a constant (no compare/select/cast)
  nodma     no query DMA (process the scratch garbage)
  empty     n_iter forced 0 (grid + block-loop overhead only)

All variants keep the same memory traffic shape for the table/counts tiles.
Results are lower bounds for what removing that stage could save.
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

from kmer_mapper_tpu.index import layout
from kmer_mapper_tpu.ops import stream_probe
from kmer_mapper_tpu.ops.stream_probe import _bytes8, _table_bytes, INVALID_BUCKET
from kmer_mapper_tpu.ops.u32hash import split_u64

BUCKET_KEYS = layout.BUCKET_KEYS
N = 16 << 20
REPS = 4
CAP = 1024


def log(m):
    print(m, file=sys.stderr, flush=True)


def _kernel_v(off_ref, key_lo_ref, key_hi_ref, counts_in_ref, q_hbm,
              counts_out_ref, q_s, sems, *, cap, bpb, max_probe, n_blocks,
              coarse, variant):
    ci = pl.program_id(0)
    counts_out_ref[...] = counts_in_ref[...]
    rows = lax.broadcasted_iota(jnp.int32, (bpb, cap), 0)
    lane_pos = lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    K = BUCKET_KEYS
    tb_all = (
        _table_bytes(key_lo_ref[...], key_hi_ref[...]).astype(jnp.bfloat16)
        if variant == "tbhoist" else None
    )

    def block_body(g, _):
        i = ci * coarse + g
        start = off_ref[i + 1]
        end = off_ref[i + 2]
        probe_limit = off_ref[n_blocks + 2 + i]
        base_bucket = off_ref[0] + i * bpb
        row0 = pl.multiple_of(g * bpb, bpb)
        if variant == "empty_notb":
            tb = jnp.zeros((bpb, 8 * K), jnp.bfloat16)
        elif variant == "tbhoist":
            tb = tb_all[pl.ds(row0, bpb), :]
        else:
            tb = _table_bytes(
                key_lo_ref[pl.ds(row0, bpb), :], key_hi_ref[pl.ds(row0, bpb), :]
            ).astype(jnp.bfloat16)
        base = start & ~jnp.int32(min(128, cap) - 1)
        n_iter = lax.select(end > start, (end - base + jnp.int32(cap - 1)) // cap,
                            jnp.int32(0))
        if variant in ("empty", "empty_notb"):
            n_iter = jnp.int32(0)

        def dma(j, slot):
            o = pl.multiple_of(base + j * cap, min(128, cap))
            return pltpu.make_async_copy(q_hbm.at[:, pl.ds(o, cap)], q_s.at[slot],
                                         sems.at[slot])

        use_dma = variant != "nodma"
        if use_dma:
            @pl.when(n_iter > 0)
            def _():
                dma(0, 0).start()

        def body(j, _c):
            slot = j % 2
            if use_dma:
                @pl.when(j + 1 < n_iter)
                def _():
                    dma(j + 1, (j + 1) % 2).start()
                dma(j, slot).wait()
            pos = base + j * cap + lane_pos
            live = (pos >= start) & (pos < end)
            local_b = q_s[slot, 0:1, :].astype(jnp.int32) - base_bucket
            live = live & (local_b >= 0) & (local_b < bpb)
            if variant == "nohot":
                one_hot = (rows < 1).astype(jnp.bfloat16)  # constant-foldable-ish
            else:
                one_hot = ((rows == local_b) & live).astype(jnp.bfloat16)
            qh = _bytes8(q_s[slot, 1:2, :], q_s[slot, 2:3, :])

            def probe_round(p, contrib):
                tbp = tb if p == 0 else jnp.roll(tb, -p, axis=0)
                if variant == "nomm1":
                    hits_in = jnp.broadcast_to(live, (K, live.shape[1])).astype(jnp.bfloat16)
                    c = lax.dot_general(one_hot, hits_in,
                                        dimension_numbers=(((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    return contrib + c
                gathered = lax.dot_general(tbp, one_hot,
                                           dimension_numbers=(((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
                hits = live
                for plane in range(8):
                    hits = hits & (gathered[plane * K:(plane + 1) * K, :] == qh[plane])
                hits_in = hits.astype(jnp.bfloat16)
                if variant == "nomm2":
                    s = jnp.sum(hits_in.astype(jnp.float32), axis=1, keepdims=True)
                    return contrib + jnp.pad(s.T, ((0, bpb - 1), (0, 0)))
                c = lax.dot_general(one_hot, hits_in,
                                    dimension_numbers=(((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                return contrib + (c if p == 0 else jnp.roll(c, p, axis=0))

            contrib = probe_round(0, jnp.zeros((bpb, K), dtype=jnp.float32))
            for p in range(1, max_probe):
                contrib = lax.cond(p < probe_limit, functools.partial(probe_round, p),
                                   lambda c: c, contrib)
            counts_out_ref[pl.ds(row0, bpb), :] = counts_out_ref[
                pl.ds(row0, bpb), :] + contrib.astype(jnp.int32).astype(jnp.uint32)
            return 0

        lax.fori_loop(0, n_iter, body, 0)
        return 0

    lax.fori_loop(0, coarse, block_body, 0)


def stream_count_v(key_lo, key_hi, counts, sorted_b, sorted_lo, sorted_hi, off,
                   max_probe, block_probe, variant, cap=CAP, coarse=8):
    n_local = key_lo.shape[0]
    bpb = min(layout.CHAIN_BLOCK, n_local)
    n_blocks = n_local // bpb
    n = sorted_b.shape[0]
    pad = (-n) % cap + cap
    sorted_b = jnp.concatenate([sorted_b, jnp.full(pad, INVALID_BUCKET)])
    sorted_lo = jnp.concatenate([sorted_lo, jnp.zeros(pad, jnp.uint32)])
    sorted_hi = jnp.concatenate([sorted_hi, jnp.zeros(pad, jnp.uint32)])
    q = jnp.stack([sorted_b, sorted_lo, sorted_hi, sorted_hi])
    counts2d = counts.reshape(n_local, BUCKET_KEYS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks // coarse,),
        in_specs=[
            pl.BlockSpec((coarse * bpb, BUCKET_KEYS), lambda i, off: (i, 0)),
            pl.BlockSpec((coarse * bpb, BUCKET_KEYS), lambda i, off: (i, 0)),
            pl.BlockSpec((coarse * bpb, BUCKET_KEYS), lambda i, off: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((coarse * bpb, BUCKET_KEYS), lambda i, off: (i, 0)),
        scratch_shapes=[pltpu.VMEM((2, 4, cap), jnp.uint32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    scalars = jnp.concatenate([
        jnp.zeros(1, jnp.int32), off, jnp.asarray(block_probe, jnp.int32)])
    kernel = functools.partial(_kernel_v, cap=cap, bpb=bpb, max_probe=max_probe,
                               n_blocks=n_blocks, coarse=coarse, variant=variant)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_local, BUCKET_KEYS), jnp.uint32),
        input_output_aliases={3: 0},
    )(scalars, key_lo, key_hi, counts2d, q)
    return out.reshape(-1)


def main():
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << 62, 4_000_000, dtype=np.uint64))
    table = layout.build_table(keys)
    bp = jnp.asarray(table.block_max_probe())
    queries = np.concatenate([rng.choice(keys, N // 2),
                              rng.integers(0, 1 << 62, N - N // 2, dtype=np.uint64)])
    qlo, qhi = split_u64(queries)
    klo, khi = jnp.asarray(table.key_lo), jnp.asarray(table.key_hi)
    sb, slo, shi = jax.jit(lambda a, b, v: stream_probe.sort_queries(
        a, b, v, table.n_buckets, table.seed))(jnp.asarray(qlo), jnp.asarray(qhi),
                                               jnp.ones(N, bool))
    bpb = min(layout.CHAIN_BLOCK, table.n_buckets)
    off = jax.jit(lambda s: stream_probe.block_offsets(s, table.n_buckets, bpb))(sb)
    counts = jnp.zeros(table.n_slots, jnp.uint32)

    for variant in ("empty_notb", "tbhoist"):
        def chain(kl, kh, c, sb, slo, shi, off, bpd, _v=variant):
            for _ in range(REPS):
                c = stream_count_v(kl, kh, c, sb, slo, shi, off, table.max_probe,
                                   bpd, _v)
            return c.sum()

        f = jax.jit(chain)
        t = time.perf_counter()
        s = float(np.asarray(jax.device_get(f(klo, khi, counts, sb, slo, shi, off, bp))))
        log(f"{variant:8s} compile+run {time.perf_counter() - t:.1f}s")
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            s = float(np.asarray(jax.device_get(f(klo, khi, counts, sb, slo, shi, off, bp))))
            best = min(best, (time.perf_counter() - t) / REPS)
        log(f"{variant:8s} {best * 1e3:7.2f} ms ({N / best / 1e6:6.0f} Mq/s) sum={s}")


if __name__ == "__main__":
    main()
