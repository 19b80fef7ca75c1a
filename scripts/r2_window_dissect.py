"""FROZEN round-2 measurement artifact: written against the pre-mixed-key
stream API (3-operand sort_queries / stream_count); kept for the measurement
record, NOT runnable against the current code. Round-3 equivalents:
r3_s_dissect.py, r3_true_window.py, r3_composed_sweep.py.

In-context kernel dissection: variants measured inside the composed
8-chunk window (standalone kernel chains measured ~2x inflated — ground truth
is the window). Variants: full / nomm1 (no gather matmul+compares) / nodma /
empty (zero-trip loops)."""
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

from kmer_mapper_tpu import oracle
from kmer_mapper_tpu.index import kmer_index as ki, layout
from kmer_mapper_tpu.io.readers import SequenceChunk, pack_for_device
from kmer_mapper_tpu.ops import hashing, stream_probe
from kmer_mapper_tpu.ops.stream_probe import (
    ALIGN, INVALID_BUCKET, _bytes8, _table_bytes,
)

BUCKET_KEYS = layout.BUCKET_KEYS
K, READ_LEN, BUF = 31, 151, 16 << 20
STEPS = 8
CAP, COARSE, NSLOTS = 1024, 8, 4
rng = np.random.default_rng(0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def _kernel_v(off_ref, key_lo_ref, key_hi_ref, counts_in_ref, q_hbm,
              counts_out_ref, q_s, sems, *, cap, bpb, max_probe, n_blocks,
              coarse, t_pad, n_slots, variant):
    ci = pl.program_id(0)
    counts_out_ref[...] = counts_in_ref[...]
    rows = lax.broadcasted_iota(jnp.int32, (bpb, cap), 0)
    lane_pos = lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    Kk = BUCKET_KEYS
    n_steps = n_blocks // coarse
    t_lo = off_ref[2 * n_blocks + 2 + ci]
    t_hi = off_ref[2 * n_blocks + 2 + ci + 1]
    meta0 = 2 * n_blocks + 2 + n_steps + 1
    align = min(ALIGN, cap)

    def tile_meta(t):
        return off_ref[meta0 + t], off_ref[meta0 + t_pad + t]

    def dma_at(offset, slot):
        o = pl.multiple_of(offset, align)
        return pltpu.make_async_copy(q_hbm.at[:, pl.ds(o, cap)], q_s.at[slot],
                                     sems.at[slot])

    use_dma = variant not in ("nodma", "empty")
    n_total = jnp.int32(0) if variant == "empty" else t_hi - t_lo
    if use_dma:
        for w in range(n_slots - 1):
            @pl.when(t_lo + w < t_hi)
            def _(w=w):
                dma_at(tile_meta(t_lo + w)[1], w % n_slots).start()

    def body(ti, _):
        t = t_lo + ti
        slot = ti % n_slots
        if use_dma:
            @pl.when(ti + n_slots - 1 < n_total)
            def _():
                dma_at(tile_meta(t + n_slots - 1)[1],
                       (ti + n_slots - 1) % n_slots).start()

        grp, base_j = tile_meta(t)
        if use_dma:
            dma_at(base_j, slot).wait()
        pos = base_j + lane_pos
        qb = q_s[slot, 0:1, :].astype(jnp.int32)
        qh = _bytes8(q_s[slot, 1:2, :], q_s[slot, 2:3, :])
        g = grp
        start = off_ref[g + 1]
        end = off_ref[g + 2]
        probe_limit = off_ref[n_blocks + 2 + g]
        base_bucket = off_ref[0] + g * bpb
        row0 = pl.multiple_of((g - ci * coarse) * bpb, bpb)
        tb = _table_bytes(key_lo_ref[pl.ds(row0, bpb), :],
                          key_hi_ref[pl.ds(row0, bpb), :]).astype(jnp.bfloat16)
        live = (pos >= start) & (pos < end)
        local_b = qb - base_bucket
        live = live & (local_b >= 0) & (local_b < bpb)
        one_hot = ((rows == local_b) & live).astype(jnp.bfloat16)

        def probe_round(p, contrib):
            tbp = tb if p == 0 else jnp.roll(tb, -p, axis=0)
            if variant == "nomm1":
                hits_in = jnp.broadcast_to(live, (Kk, live.shape[1])).astype(jnp.bfloat16)
            else:
                gathered = lax.dot_general(
                    tbp, one_hot, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                hits = live
                for plane in range(8):
                    hits = hits & (gathered[plane * Kk:(plane + 1) * Kk, :] == qh[plane])
                hits_in = hits.astype(jnp.bfloat16)
            c = lax.dot_general(one_hot, hits_in,
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return contrib + (c if p == 0 else jnp.roll(c, p, axis=0))

        contrib = probe_round(0, jnp.zeros((bpb, Kk), dtype=jnp.float32))
        for p in range(1, max_probe):
            contrib = lax.cond(p < probe_limit, functools.partial(probe_round, p),
                               lambda c: c, contrib)
        counts_out_ref[pl.ds(row0, bpb), :] = counts_out_ref[
            pl.ds(row0, bpb), :] + contrib.astype(jnp.int32).astype(jnp.uint32)
        return 0

    lax.fori_loop(0, n_total, body, 0)


def stream_count_v(key_lo, key_hi, counts, sb, slo, shi, off, max_probe,
                   block_probe, variant):
    n_local = key_lo.shape[0]
    bpb = min(layout.CHAIN_BLOCK, n_local)
    n_blocks = n_local // bpb
    n = sb.shape[0]
    pad = (-n) % CAP + CAP
    sb = jnp.concatenate([sb, jnp.full(pad, INVALID_BUCKET)])
    slo = jnp.concatenate([slo, jnp.zeros(pad, jnp.uint32)])
    shi = jnp.concatenate([shi, jnp.zeros(pad, jnp.uint32)])
    q = jnp.stack([sb, slo, shi, shi])
    counts2d = counts.reshape(n_local, BUCKET_KEYS)
    n_groups = n_blocks
    t_pad = (n + pad) // CAP + n_groups
    align = min(ALIGN, CAP)
    starts, ends = off[:-1], off[1:]
    bases = starts & ~jnp.int32(align - 1)
    nt = jnp.where(ends > starts, (ends - bases + jnp.int32(CAP - 1)) // CAP, 0)
    csum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(nt, dtype=jnp.int32)])
    tile_bounds = csum[::COARSE]
    t_group = jnp.cumsum(jnp.zeros(t_pad, jnp.int32).at[csum[1:]].add(1, mode="drop"))
    t_in = jnp.arange(t_pad, dtype=jnp.int32) - csum[jnp.minimum(t_group, n_groups)]
    t_off = bases[jnp.minimum(t_group, n_groups - 1)] + t_in * jnp.int32(CAP)
    scalars = jnp.concatenate([jnp.zeros(1, jnp.int32), off,
                               jnp.asarray(block_probe, jnp.int32), tile_bounds,
                               t_group, t_off])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_blocks // COARSE,),
        in_specs=[pl.BlockSpec((COARSE * bpb, BUCKET_KEYS), lambda i, off: (i, 0))] * 3
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((COARSE * bpb, BUCKET_KEYS), lambda i, off: (i, 0)),
        scratch_shapes=[pltpu.VMEM((NSLOTS, 4, CAP), jnp.uint32),
                        pltpu.SemaphoreType.DMA((NSLOTS,))],
    )
    kernel = functools.partial(_kernel_v, cap=CAP, bpb=bpb, max_probe=max_probe,
                               n_blocks=n_blocks, coarse=COARSE, t_pad=t_pad,
                               n_slots=NSLOTS, variant=variant)
    out = pl.pallas_call(kernel, grid_spec=grid_spec,
                         out_shape=jax.ShapeDtypeStruct((n_local, BUCKET_KEYS), jnp.uint32),
                         input_output_aliases={3: 0})(scalars, key_lo, key_hi, counts2d, q)
    return out.reshape(-1)


def main():
    def make_read_chunk(n_bases):
        bases = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n_bases)
        n_reads = n_bases // READ_LEN
        return SequenceChunk(bases=bases[: n_reads * READ_LEN],
                             read_starts=np.arange(n_reads, dtype=np.int64) * READ_LEN)

    chunks = [make_read_chunk(BUF) for _ in range(3)]
    sample = oracle.kmer_hashes(oracle.encode_bytes(chunks[0].bases[: READ_LEN * 5000]), K)
    entry = np.unique(np.concatenate([
        rng.integers(0, 1 << 62, 2_000_000, dtype=np.uint64),
        rng.choice(sample, 2_000_000)]))
    index = ki.TpuKmerIndex.from_entries(
        entry, rng.integers(0, 3_000_000, len(entry)).astype(np.int32))
    table = index.table
    bp = table.block_max_probe()
    config_packed = [next(iter(pack_for_device(iter([c]), BUF, BUF // 64, K)))
                     for c in chunks]
    resident = [(jax.device_put(p), jax.device_put(ln), jnp.int32(nb))
                for p, ln, nb, _, _ in config_packed]
    key_lo, key_hi = jax.device_put(table.key_lo), jax.device_put(table.key_hi)
    bpb = min(layout.CHAIN_BLOCK, table.n_buckets)
    bp_d = jnp.asarray(bp)

    for variant in ("full", "nomm1", "nodma", "empty"):
        def chunk_v(counts, packed_arr, lengths, n_bases, _v=variant):
            lengths = lengths.astype(jnp.int32)
            starts = jnp.cumsum(lengths) - lengths
            valid = hashing.window_mask(starts, n_bases, K, BUF)
            n_valid = jnp.sum(valid.astype(jnp.uint32))
            lo, hi = hashing.rolling_kmer_hash_packed(packed_arr, K)
            sb, slo, shi = stream_probe.sort_queries(lo, hi, valid, table.n_buckets,
                                                     table.seed)
            off = stream_probe.block_offsets(sb, table.n_buckets, bpb)
            counts = stream_count_v(key_lo, key_hi, counts, sb, slo, shi, off,
                                    table.max_probe, bp_d, _v)
            return counts, n_valid

        def window(counts, resident, _v=variant):
            total = jnp.uint32(0)
            for i in range(STEPS):
                p, ln, nb = resident[i % len(resident)]
                counts, nv = chunk_v(counts, p, ln, nb, _v)
                total = total + nv
            return counts, total

        fn = jax.jit(window, donate_argnums=(0,))
        counts = jax.device_put(jnp.zeros(table.n_slots, dtype=jnp.uint32))
        t = time.perf_counter()
        counts, total = fn(counts, resident)
        km = int(jax.device_get(total))
        log(f"{variant:8s} compile {time.perf_counter() - t:.0f}s")
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            counts, total = fn(counts, resident)
            _ = int(jax.device_get(total))
            best = min(best, time.perf_counter() - t)
        log(f"{variant:8s} {best / STEPS * 1e3:6.1f} ms/chunk ({km / best / 1e6:5.0f} Mk/s)")


if __name__ == "__main__":
    main()
