"""Sort + stream probe: the default TPU counting path.

Replaces random-access hash probing (and its scatter-add counterpart) with
streaming — the shape TPUs are built for:

1. Queries are sorted by bucket id (one multi-operand XLA sort; invalid
   windows get bucket 0xFFFFFFFF and fall off the end).
2. a vectorized bisection finds each CHAIN_BLOCK-aligned table block's query
   range, and a flat (tile -> block, DMA offset) schedule is precomputed.
3. A Pallas kernel walks the table in ``coarse``-block grid steps
   (auto-pipelined VMEM tiles) and runs ONE flat loop over each step's query
   tiles — each block's **exact window** ``[start & ~127, end)`` in cap-sized
   pieces, each piece **one fused (4, cap) DMA** (bucket/lo/hi rows share the
   offset: one copy + one semaphore instead of three), issued several tiles
   ahead across block boundaries. The schedule comes from scalar-prefetch
   arrays when it fits SMEM, else from an in-kernel scalar cursor (large
   tables). The per-query "gather" is a **one-hot matmul on the MXU**:
   ``table_bytesᵀ ⨯ one_hot(bucket)`` fetches each query's 8 candidate keys as
   byte planes; the hit mask is pure VPU compares; a second matmul turns hits
   into per-slot count contributions accumulated directly into the VMEM counts
   tile. Queries sit on the MXU lane dimension throughout, so no transposes or
   reshapes are needed (Mosaic supports neither on the minor dims).

No gathers, no scatters, no host syncs: HBM sees only sequential streams. The
measured v5e gather path costs ~6 ns/row; this path amortizes to the sort's
cost per query. Collision chains wrap inside CHAIN_BLOCK-aligned blocks
(``index/layout.py``), so tiles are self-contained; chain offsets are handled
by circularly rolling the table tile and re-using the same one-hot matrix.

Exactness: all matmul operands are exact in bfloat16 (one-hot 0/1, 8-bit key
byte planes, hit flags — the MXU runs matmuls as single-pass bf16, which is
why keys are split into bytes rather than 16-bit halves), accumulation is f32,
and every sum either has a single nonzero term or is bounded by the query tile
size, far below 2^24 — bit-exact by construction.

Skew robustness: each block's query range is processed in whole cap-sized
tiles with a data-dependent ``fori_loop`` trip count and position masking, so
heavy duplicate kmers (e.g. poly-A after the reference's N->A substitution)
simply take more iterations — no overflow or fallback cases.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..index.layout import BUCKET_KEYS, CHAIN_BLOCK
from .u32hash import bucket_of

INVALID_BUCKET = jnp.uint32(0xFFFFFFFF)
DEFAULT_CAP = 1024  # queries per kernel tile. Standalone the kernel measures
# faster at 2048 (34.3 vs 39.0 ms per 16.8M queries, v5e), but in the composed
# chunk step — where XLA overlaps the next chunk's sort with the kernel —
# 1024 wins decisively (305 vs 272 Mkmers/s); trust the in-context number.
DEFAULT_COARSE = 16  # chain blocks per grid step (amortizes grid-step overhead)
N_DMA_SLOTS = 4  # query-tile DMA pipelining depth (issued n-1 tiles ahead)
SMEM_I32_BUDGET = 200_000  # scalar-prefetch words that safely fit SMEM (1 MB)
DEFAULT_SUB = 1  # adjacent chain blocks served by one tile iteration.
# sub=2 measured SLOWER composed (247 vs 308 Mkmers/s): every tile of a
# 2-block group evaluates both blocks' matmuls, and most tiles sit entirely
# inside one block's range, so total masked matmul work grows faster than the
# saved per-iteration control (~0.45 us vs ~0.26 us per block-matmul).


def sort_queries(q_lo, q_hi, valid, n_buckets: int, seed: int):
    """(sorted_bucket u32, sorted_lo, sorted_hi); invalid queries sort last.
    Unstable sort: counting is order-insensitive within a bucket."""
    b = bucket_of(q_lo, q_hi, n_buckets, seed=seed, xp=jnp)
    b = jnp.where(valid, b, INVALID_BUCKET)
    return lax.sort((b, q_lo, q_hi), dimension=0, num_keys=1, is_stable=False)


def block_offsets(sorted_b, n_buckets: int, block: int, bucket_base=0, n_local=None):
    """int32[n_blocks + 1] query-range bounds per table block.

    With ``bucket_base``/``n_local`` the bounds cover only the shard-local
    bucket range [bucket_base, bucket_base + n_local); queries owned by other
    shards fall outside every range."""
    if n_local is None:
        n_local = n_buckets
    n_blocks = max(1, n_local // min(block, n_buckets))
    block = n_local // n_blocks
    bounds = jnp.uint32(bucket_base) + jnp.arange(
        n_blocks + 1, dtype=jnp.uint32
    ) * jnp.uint32(block)
    return _searchsorted_u32(sorted_b, bounds)


def _searchsorted_u32(sorted_vals, queries):
    """Vectorized left bisection (jnp.searchsorted measured ~5 ms for a few
    thousand queries on v5e; this runs in a handful of tiny gather steps)."""
    n = sorted_vals.shape[0]
    lo = jnp.zeros(queries.shape, dtype=jnp.int32)
    hi = jnp.full(queries.shape, n, dtype=jnp.int32)

    def body(_, carry):
        lo, hi = carry
        live = lo < hi
        mid = (lo + hi) // 2
        below = sorted_vals[jnp.minimum(mid, n - 1)] < queries
        lo = jnp.where(live & below, mid + 1, lo)
        hi = jnp.where(live & ~below, mid, hi)
        return lo, hi

    steps = max(1, int(np.ceil(np.log2(max(2, n)))))
    lo, hi = lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _bytes8(lo, hi):
    """(lo, hi) uint32 words -> 8 byte planes as f32.

    Bytes (<= 255) are exactly representable in bfloat16: the MXU on TPU runs
    "f32" matmuls as single-pass bf16 multiplies (f32 accumulate), so matmul
    operands must survive bf16 rounding — 16-bit halves do not, bytes do.
    Casts go via int32 (Mosaic has no direct uint32->float32 cast)."""
    planes = []
    for word in (lo, hi):
        for shift in (0, 8, 16, 24):
            planes.append(
                ((word >> shift) & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32)
            )
    return planes


def _table_bytes(key_lo, key_hi):
    """(BPB, BUCKET_KEYS) lo/hi words -> (BPB, 8*BUCKET_KEYS) f32 byte planes,
    plane-major: columns [pK:(p+1)K] = byte plane p (lo bytes 0-3, hi bytes 0-3)."""
    return jnp.concatenate(_bytes8(key_lo, key_hi), axis=1)


ALIGN = 128  # DMA windows start on a lane-aligned query offset (<= cap)


def _kernel(
    off_ref,  # scalar-prefetch int32: [shard_base, off(n_blocks+1), block_probe(n_blocks), tile_bounds(n_steps+1), t_block(t_pad), t_off(t_pad)]
    key_lo_ref,  # VMEM (coarse * BPB, K)
    key_hi_ref,
    counts_in_ref,  # VMEM (coarse * BPB, K) uint32, aliased with output
    q_hbm,  # ANY (4, n_padded) uint32: rows = sorted bucket / lo / hi / dead
    counts_out_ref,  # VMEM (coarse * BPB, K)
    q_s,  # scratch VMEM (n_slots, 4, cap) multi-buffered fused query tiles
    sems,  # DMA semaphores (n_slots,)
    *,
    cap: int,
    bpb: int,
    max_probe: int,
    n_blocks: int,
    coarse: int,
    t_pad: int,
    n_slots: int,
    sub: int,
    use_meta: bool,
):
    """One grid step = ``coarse`` chain blocks, iterated as ONE flat fori_loop
    over query tiles (a dissection measured ~0.9 us of pure loop-setup /
    scalar overhead per chain block when each block ran its own inner loop —
    ~15 ms per 16.8M queries — while the table byte-plane compute and the
    one-hot materialization were ~free). A tile serves a GROUP of ``sub``
    adjacent chain blocks — their query windows are contiguous in the sorted
    array, so one DMA and one iteration's control work cover ``sub`` blocks,
    while the gather matmul stays split per block (contraction dim bpb; a
    single 2*bpb contraction measured slower).

    Two schedule modes: with ``use_meta`` the flat tile -> (group, DMA offset)
    schedule is precomputed on the XLA side into scalar-prefetch arrays
    (``t_pad`` entries each), so an iteration does a handful of SMEM reads and
    the fused DMA can be issued ``n_slots - 1`` tiles ahead across group
    boundaries. For large tables those arrays would overflow SMEM (~1 MB), so
    the fallback derives the (group, tile) cursor with a scalar while_loop and
    double-buffers one tile ahead (~1% slower at the production config)."""
    ci = pl.program_id(0)
    counts_out_ref[...] = counts_in_ref[...]
    rows = lax.broadcasted_iota(jnp.int32, (bpb, cap), 0)
    lane_pos = lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    K = BUCKET_KEYS
    n_steps = n_blocks // coarse
    n_local_groups = coarse // sub
    t_lo = off_ref[2 * n_blocks + 2 + ci]
    t_hi = off_ref[2 * n_blocks + 2 + ci + 1]
    meta0 = 2 * n_blocks + 2 + n_steps + 1
    align = min(ALIGN, cap)

    def group_window(grp):
        """(start, end, base, n_tiles) of group ``grp``'s query window."""
        start = off_ref[grp * sub + 1]
        end = off_ref[grp * sub + sub + 1]
        base = start & ~jnp.int32(align - 1)
        n_tiles = lax.select(
            end > start, (end - base + jnp.int32(cap - 1)) // cap, jnp.int32(0)
        )
        return start, end, base, n_tiles

    def dma_at(offset, slot):
        # one fused (4, cap) copy per tile: bucket/lo/hi rows share the
        # offset, so three copies + three semaphore waits become one
        o = pl.multiple_of(offset, align)
        return pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(o, cap)], q_s.at[slot], sems.at[slot]
        )

    if use_meta:
        def tile_meta(t):
            return off_ref[meta0 + t], off_ref[meta0 + t_pad + t]

        for w in range(n_slots - 1):
            @pl.when(t_lo + w < t_hi)
            def _(w=w):
                dma_at(tile_meta(t_lo + w)[1], w % n_slots).start()
    else:
        g_hi = (ci + 1) * n_local_groups

        def advance(grp, j):
            # skip to the next group that still has tile j to process
            def cond(c):
                grp, j = c
                return (grp < g_hi) & (j >= group_window(grp)[3])

            return lax.while_loop(cond, lambda c: (c[0] + 1, jnp.int32(0)), (grp, j))

        g0, j0 = advance(ci * n_local_groups, jnp.int32(0))

        @pl.when(t_hi > t_lo)
        def _():
            dma_at(group_window(g0)[2] + j0 * cap, 0).start()

    def body(ti, carry):
        t = t_lo + ti
        slot = ti % n_slots
        if use_meta:
            @pl.when(ti + n_slots - 1 < t_hi - t_lo)
            def _():
                dma_at(
                    tile_meta(t + n_slots - 1)[1], (ti + n_slots - 1) % n_slots
                ).start()

            grp, base_j = tile_meta(t)  # group id, DMA offset = base + j*cap
        else:
            grp, j = carry
            gn, jn = advance(grp, j + 1)

            @pl.when(ti + 1 < t_hi - t_lo)
            def _():
                dma_at(group_window(gn)[2] + jn * cap, (ti + 1) % n_slots).start()

            base_j = group_window(grp)[2] + j * cap
        dma_at(base_j, slot).wait()
        pos = base_j + lane_pos  # (1, cap)
        qb = q_s[slot, 0:1, :].astype(jnp.int32)
        qh = _bytes8(q_s[slot, 1:2, :], q_s[slot, 2:3, :])  # 8 x (1, cap)
        contribs = []
        for b in range(sub):
            g = grp * sub + b
            start = off_ref[g + 1]
            end = off_ref[g + 2]
            probe_limit = off_ref[n_blocks + 2 + g]  # per-block chain bound
            base_bucket = off_ref[0] + g * bpb  # off_ref[0] = shard base
            row0 = pl.multiple_of((g - ci * coarse) * bpb, bpb)
            tb = _table_bytes(
                key_lo_ref[pl.ds(row0, bpb), :],
                key_hi_ref[pl.ds(row0, bpb), :],
            ).astype(jnp.bfloat16)  # (BPB, 8K)
            live = (pos >= start) & (pos < end)
            local_b = qb - base_bucket  # (1, cap)
            live = live & (local_b >= 0) & (local_b < bpb)
            # one-hot with queries on the lane dim: (bpb, cap); bf16 operands
            # are exact for 0/1 and byte values; the MXU runs bf16 single-pass
            one_hot = ((rows == local_b) & live).astype(jnp.bfloat16)

            def probe_round(p, contrib, tb=tb, one_hot=one_hot, live=live):
                tbp = tb if p == 0 else jnp.roll(tb, -p, axis=0)
                # per-query candidate key bytes: (8K, cap) = tbpᵀ ⨯ one_hot
                gathered = lax.dot_general(
                    tbp,
                    one_hot,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                hits = live
                for plane in range(8):
                    hits = hits & (
                        gathered[plane * K : (plane + 1) * K, :] == qh[plane]
                    )
                hits_in = hits.astype(jnp.bfloat16)
                c = lax.dot_general(
                    one_hot,
                    hits_in,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (bpb, K)
                return contrib + (c if p == 0 else jnp.roll(c, p, axis=0))

            contrib = probe_round(0, jnp.zeros((bpb, K), dtype=jnp.float32))
            for p in range(1, max_probe):
                # chains are rare: skip extra rounds for chain-free blocks
                contrib = lax.cond(
                    p < probe_limit,
                    functools.partial(probe_round, p),
                    lambda c: c,
                    contrib,
                )
            contribs.append(contrib)
        # the group's blocks are adjacent rows: one read-modify-write
        grow0 = pl.multiple_of((grp * sub - ci * coarse) * bpb, sub * bpb)
        full = contribs[0] if sub == 1 else jnp.concatenate(contribs, axis=0)
        counts_out_ref[pl.ds(grow0, sub * bpb), :] = counts_out_ref[
            pl.ds(grow0, sub * bpb), :
        ] + full.astype(jnp.int32).astype(jnp.uint32)
        return 0 if use_meta else (gn, jn)

    if use_meta:
        lax.fori_loop(0, t_hi - t_lo, body, 0)
    else:
        lax.fori_loop(0, t_hi - t_lo, body, (g0, j0))


def stream_count(
    key_lo: jnp.ndarray,  # uint32[n_buckets, K]
    key_hi: jnp.ndarray,
    counts: jnp.ndarray,  # uint32[n_slots] flat
    sorted_b: jnp.ndarray,  # uint32[N] (sorted)
    sorted_lo: jnp.ndarray,
    sorted_hi: jnp.ndarray,
    off: jnp.ndarray,  # int32[n_blocks + 1]
    max_probe: int,
    cap: int = DEFAULT_CAP,
    interpret: bool = False,
    bucket_base=0,  # shard-local tables: global bucket id of local bucket 0
    chain_block: int | None = None,  # build-time chain block (global tables: auto)
    block_probe=None,  # int32[n_blocks] per-block chain bound (None: max_probe)
    coarse: int = DEFAULT_COARSE,  # chain blocks folded into one grid step
    sub: int = DEFAULT_SUB,  # adjacent blocks sharing one tile iteration
) -> jnp.ndarray:
    """counts += histogram of table hits among the sorted queries.

    ``key_lo``/``key_hi``/``counts`` may be a shard of a larger table; pass
    the shard's ``bucket_base`` and the build-time ``chain_block``
    (= min(CHAIN_BLOCK, n_buckets_global)); shard sizes must be chain-block
    multiples so tile rolls reproduce the build's chain wrapping."""
    n_local = key_lo.shape[0]
    bpb = min(CHAIN_BLOCK, n_local) if chain_block is None else chain_block
    assert n_local % bpb == 0, "table shard must be a multiple of the chain block"
    # the DMA-offset alignment promised to Mosaic (pl.multiple_of) requires
    # tile strides to preserve the window base's alignment
    assert cap % min(ALIGN, cap) == 0, f"cap must be a multiple of {ALIGN} (or < {ALIGN})"
    n_blocks = n_local // bpb
    coarse = max(1, min(coarse, n_blocks))
    while n_blocks % coarse:
        coarse //= 2
    sub = max(1, min(sub, coarse))
    while coarse % sub:
        sub //= 2
    n = sorted_b.shape[0]
    # tail padding: the last window may extend past n by up to cap
    pad = (-n) % cap + cap
    sorted_b = jnp.concatenate([sorted_b, jnp.full(pad, INVALID_BUCKET)])
    sorted_lo = jnp.concatenate([sorted_lo, jnp.zeros(pad, jnp.uint32)])
    sorted_hi = jnp.concatenate([sorted_hi, jnp.zeros(pad, jnp.uint32)])
    # 4 rows (bucket/lo/hi + one dead row): HBM u32 arrays are sublane-tiled
    # by 4, and DMA slices along that dim must be tile-aligned
    q = jnp.stack([sorted_b, sorted_lo, sorted_hi, sorted_hi])  # (4, n_padded)
    counts2d = counts.reshape(n_local, BUCKET_KEYS)

    # scalar-prefetch operands live in SMEM (~1 MB): the per-tile schedule
    # arrays only fit for small/medium tables; large tables use the in-kernel
    # while-cursor schedule (measured ~1% slower at the production config)
    n_groups = n_blocks // sub
    t_pad = (n + pad) // cap + n_groups  # static bound on total tiles
    base_len = 2 * n_blocks + 2 + n_blocks // coarse + 1
    use_meta = base_len + 2 * t_pad <= SMEM_I32_BUDGET
    if not use_meta and base_len > SMEM_I32_BUDGET:
        raise ValueError(
            f"table too large for a single-chip stream kernel ({n_blocks} chain "
            "blocks of scalar metadata exceed SMEM); shard the index "
            "(--index-parallel) or use probe='gather'"
        )
    n_slots = N_DMA_SLOTS if use_meta else 2

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
        scratch_shapes=[
            pltpu.VMEM((n_slots, 4, cap), jnp.uint32),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )
    if block_probe is None:
        block_probe = jnp.full(n_blocks, max_probe, dtype=jnp.int32)
    # flat tile schedule (the kernel runs one flat loop over each grid step's
    # tiles; a tile serves a group of ``sub`` adjacent blocks): per-group tile
    # counts -> cumulative bounds at coarse boundaries, plus per-tile
    # (group id, DMA offset) scalar-prefetch arrays
    align = min(ALIGN, cap)
    g_starts = off[0 : n_blocks : sub]
    g_ends = off[sub : n_blocks + 1 : sub]
    bases = g_starts & ~jnp.int32(align - 1)
    n_tiles_g = jnp.where(
        g_ends > g_starts, (g_ends - bases + jnp.int32(cap - 1)) // cap, jnp.int32(0)
    )
    csum = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(n_tiles_g, dtype=jnp.int32)]
    )
    tile_bounds = csum[:: coarse // sub]  # (n_blocks // coarse + 1,)
    parts = [
        jnp.asarray(bucket_base, dtype=jnp.int32).reshape(1),
        off,
        jnp.asarray(block_probe, dtype=jnp.int32),
        tile_bounds,
    ]
    if use_meta:
        # t_group[t] = group of flat tile t (boundary scatter + cumsum)
        t_group = jnp.cumsum(
            jnp.zeros(t_pad, jnp.int32).at[csum[1:]].add(1, mode="drop")
        )
        t_in_group = (
            jnp.arange(t_pad, dtype=jnp.int32) - csum[jnp.minimum(t_group, n_groups)]
        )
        t_off = bases[jnp.minimum(t_group, n_groups - 1)] + t_in_group * jnp.int32(cap)
        parts += [t_group, t_off]
    scalars = jnp.concatenate(parts)
    kernel = functools.partial(
        _kernel, cap=cap, bpb=bpb, max_probe=max_probe, n_blocks=n_blocks,
        coarse=coarse, t_pad=t_pad, n_slots=n_slots, sub=sub, use_meta=use_meta,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_local, BUCKET_KEYS), jnp.uint32),
        input_output_aliases={3: 0},  # counts2d (arg 3 incl. scalar prefetch)
        interpret=interpret,
    )(scalars, key_lo, key_hi, counts2d, q)
    return out.reshape(-1)


def stream_probe_count(
    key_lo,
    key_hi,
    counts,
    q_lo,
    q_hi,
    valid,
    seed: int,
    max_probe: int,
    cap: int = DEFAULT_CAP,
    interpret: bool = False,
    block_probe=None,
    coarse: int = DEFAULT_COARSE,
):
    """Full stream path: sort -> block offsets -> stream kernel."""
    n_buckets = key_lo.shape[0]
    sb, slo, shi = sort_queries(q_lo, q_hi, valid, n_buckets, seed)
    bpb = min(CHAIN_BLOCK, n_buckets)
    off = block_offsets(sb, n_buckets, bpb)
    return stream_count(
        key_lo,
        key_hi,
        counts,
        sb,
        slo,
        shi,
        off,
        max_probe,
        cap=cap,
        interpret=interpret,
        block_probe=block_probe,
        coarse=coarse,
    )
