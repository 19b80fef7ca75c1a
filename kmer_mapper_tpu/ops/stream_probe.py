"""Sort + stream probe: the default TPU counting path.

Replaces random-access hash probing (and its scatter-add counterpart) with
streaming — the shape TPUs are built for:

1. Queries are bijectively mixed (``u32hash.feistel_mix``) and sorted by the
   mixed low word — a TWO-operand XLA sort, since the bucket id is the key's
   high bits and the table stores mixed words (lax.sort costs ~1.2 ns/elem
   per operand on v5e; the old (bucket, lo, hi) sort was 50% dearer).
   Invalid windows become the all-ones word pair and sort to the tail.
2. a vectorized bisection finds each CHAIN_BLOCK-aligned table block's query
   range, and a flat (tile -> block, probe round, DMA offset) schedule is
   precomputed.
3. A Pallas kernel walks the table in ``coarse``-block grid steps
   (auto-pipelined VMEM tiles) and runs ONE flat loop over scheduled query
   tiles — each block's **exact window** ``[start & ~127, end)`` in cap-sized
   pieces, each piece **one fused (4, cap) DMA** (bucket/lo/hi rows share the
   offset: one copy + one semaphore instead of three), issued several tiles
   ahead across block boundaries. The schedule comes from scalar-prefetch
   arrays when it fits SMEM, else paged from HBM through VMEM into SMEM
   (large tables; same per-tile reads and DMA lookahead either way).
   The per-query "gather" is a **one-hot matmul on the MXU**:
   ``table_bytesᵀ ⨯ one_hot(bucket)`` fetches each query's 8 candidate keys as
   byte planes; the hit mask is 3 packed-plane VPU compares; a second matmul
   turns hits into per-slot count contributions accumulated directly into the
   VMEM counts tile. Queries sit on the MXU lane dimension throughout, so no
   transposes or reshapes are needed (Mosaic supports neither on the minor
   dims).

Collision chains wrap inside CHAIN_BLOCK-aligned blocks (``index/layout.py``),
so tiles are self-contained. Chain rounds are **scheduled, not branched**: a
block whose build recorded probe depth L simply appears L times in the tile
schedule, once per probe round p, and the kernel folds p into the one-hot
(``(local_b + p) & (bpb - 1)``) — algebraically identical to rolling the table
tile by p, with no ``lax.cond``/``jnp.roll`` in the body (a v2 dissection
measured the uniform body at ~2x the cost of this structure). Chains are rare
at the default load factor, so the extra scheduled tiles are a few percent.

No gathers, no scatters, no host syncs: HBM sees only sequential streams.
Per-tile costs measured on v5e (scripts/r3_iter_floor.py): loop control
~18 ns, fused 4-deep DMA ~86 ns (overlapped), the VPU/MXU body dominates.

Exactness: all matmul operands are exact in bfloat16 (one-hot 0/1, 8-bit key
byte planes, hit flags — the MXU runs matmuls as single-pass bf16, which is
why keys are split into bytes rather than 16-bit halves), accumulation is f32,
and every sum either has a single nonzero term or is bounded by the query tile
size, far below 2^24 — bit-exact by construction. The 3-plane packed compare
recombines gathered byte planes as b0 + 256*b1 + 65536*b2 < 2^24, exact in
f32, so packed equality is equivalent to bytewise equality.

Skew robustness: each block's query range is processed in whole cap-sized
tiles with a data-dependent schedule length and position masking, so heavy
duplicate kmers (e.g. poly-A after the reference's N->A substitution) simply
take more scheduled tiles — no overflow or fallback cases.

Role parity: this kernel implements the reference's entire probe loop
(``kmer_mapper/mapper.pyx:53-69``) and the cucounter count kernel
(``kmer_mapper/gpu_counter.py:23-24``) in one streaming pass.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..index.layout import BUCKET_KEYS, CHAIN_BLOCK
from .u32hash import bucket_shift, feistel_mix

#: invalid queries get BOTH mixed words set to this; the pattern equals the
#: table's EMPTY sentinel, which the build reseeds away from real keys, and
#: the kernel additionally masks it out of the hit test
INVALID_WORD = np.uint32(0xFFFFFFFF)
INVALID_BUCKET = INVALID_WORD  # historical alias (pre-mixed-key layout)
DEFAULT_CAP = 1024  # queries per kernel tile. Standalone the kernel measures
# faster at 2048, but in the composed chunk step 1024 wins decisively
# (305 vs 272 Mkmers/s on the v2 kernel); trust the in-context number.
DEFAULT_COARSE = 16  # chain blocks per grid step (amortizes grid-step overhead)
N_DMA_SLOTS = 4  # query-tile DMA pipelining depth (issued n-1 tiles ahead)
DEFAULT_GROUP = 1  # adjacent chain blocks per widened one-hot tile
SMEM_I32_BUDGET = 200_000  # scalar-prefetch words that safely fit SMEM (1 MB)
HUMAN_SCALE_BUCKETS = 1 << 25  # tables at/above this per-chip bucket count
# have ~400-query/block windows at 128 Mi: round-slack tiles dominate the
# schedule, so production policy flips to S=1, group=2, 128 Mi buffers
# (150M-key drill: S=1/2/4 = 158.0/140.0/117.8; group=1/2/4 =
# 158.0/160.7/126.9; 64 vs 128 Mi = 115.1/158.0 Mk/s — r8_scale_drill.py)
PROBE_BITS = 3  # schedule entries pack (group << PROBE_BITS) | probe_round;
# index/layout.py bounds chains at MAX_PROBE_LIMIT = 8 rounds, so 3 bits


class SchedulePlan(NamedTuple):
    """Static shape plan for one stream_count call (see plan_schedule)."""

    n_groups: int
    gpb: int  # one-hot rows per scheduled group (= group * chain block)
    group: int
    coarse: int  # groups per grid step
    max_rounds: int  # scheduled probe rounds upper bound (after aug fold)
    sum_rounds: int  # Σ per-group scheduled rounds (exact when block_probe
    # is static, else the conservative n_groups * max_rounds)
    t_pad: int  # static bound on schedule entries
    use_meta: bool  # schedule fits scalar-prefetch SMEM (fast path)
    n_pages: int  # HBM schedule pages when not use_meta


def plan_schedule(
    n_local: int,  # table (shard) bucket count
    n_padded: int,  # sorted query array length incl. invalid tail slack
    *,
    cap: int,
    max_probe: int,
    aug: int = 1,
    group: int = 0,
    coarse: int = 0,
    chain_block: int | None = None,
    block_probe=None,  # numpy int array for the exact bound; None/traced for
    # the conservative one
    streams: int = 1,  # independently sorted query streams sharing the tiles
) -> SchedulePlan:
    """The static half of stream_count's schedule math, shared with scripts,
    the pipeline auto-tuner and tests so the paged/meta prediction can never
    drift from the kernel's own decision.

    Static schedule bound: group g contributes rounds_g * n_tiles_g entries
    with n_tiles_g = ceil((end_g - base_g)/cap) and base_g aligned down below
    start_g, so n_tiles_g <= w_g/cap + 2 (one ceil tile + one alignment tile
    beyond the group's query share w_g; a single extra tile is not airtight
    against adversarial window-size patterns). Summing over groups:
    entries <= max_rounds * (Σ w_g)/cap + 2 Σ rounds_g, with Σ w_g = n_padded.
    The XLA-side schedule build costs gathers/cumsum proportional to t_pad
    (measured 14 ms/chunk at 32K groups with the older, looser
    max_rounds * 2 * n_groups slack), so the exact Σ rounds_g is used
    whenever block_probe is static — the production path."""
    bpb = min(CHAIN_BLOCK, n_local) if chain_block is None else chain_block
    n_blocks = n_local // bpb
    coarse = coarse or DEFAULT_COARSE
    group = group or DEFAULT_GROUP
    group = max(1, min(group, n_blocks))
    while n_blocks % group:
        group //= 2
    gpb = group * bpb
    n_groups = n_blocks // group
    coarse = max(1, min(coarse // group, n_groups))
    while n_groups % coarse:
        coarse //= 2

    static_bp = block_probe is not None and not isinstance(
        block_probe, jax.core.Tracer
    )
    if block_probe is None:
        max_rounds = max_probe
        sum_rounds = n_groups * -(-max_probe // aug)
    elif static_bp:
        bp_np = np.asarray(block_probe)
        max_rounds = max(1, int(bp_np.max(initial=1)))
        # mirror stream_count's traced transform (group max, aug ceil-div,
        # clip) so the bound can use the exact sum
        r_np = bp_np.astype(np.int64)
        if group > 1:
            r_np = r_np.reshape(n_groups, group).max(axis=1)
        r_np = -(-r_np // aug)
        sum_rounds = int(np.clip(r_np, 1, -(-max_rounds // aug)).sum())
    else:  # traced per-block bounds: only max_probe is static
        max_rounds = max_probe
        sum_rounds = None
    if aug > 1:
        max_rounds = -(-max_rounds // aug)
    if sum_rounds is None:
        sum_rounds = n_groups * max_rounds
    if max_rounds > (1 << PROBE_BITS):
        # tables built here respect layout.max_probe_limit(aug) ==
        # aug << PROBE_BITS; a larger bound means a corrupt/foreign table —
        # clipping would silently drop hits past the schedulable rounds (the
        # gather path would still probe them, so the two paths would diverge)
        raise ValueError(
            f"table needs {max_rounds} scheduled probe rounds at aug={aug}, "
            f"over the stream kernel's schedule limit {1 << PROBE_BITS}; "
            "rebuild the table or use probe='gather'"
        )
    # multi-stream tiles: one tile serves a (group, round) with one cap-wide
    # sub-window PER STREAM, so the tile count is governed by the group's
    # LARGEST stream share: n_tiles_g = max_s ceil((end_gs - base_gs)/cap)
    # <= (max_s w_gs)/cap + 2 <= (Σ_s w_gs)/cap + 2 — summing over groups
    # keeps the single-stream bound shape (total query length at width cap).
    # Schedule entries are SELF-CONTAINED (1 meta + ``streams`` offset +
    # ``streams`` packed rel-bound words per entry), so the only per-group
    # scalar-prefetch state is tile_bounds — the old
    # streams*(n_groups+1)-word goff cliff that forced group widening past
    # ~12M buckets is gone; feasibility now binds at n_groups/coarse, i.e.
    # ~400M buckets at the defaults before group > 1 is ever needed.
    t_pad = max_rounds * (n_padded // cap + 1) + 2 * sum_rounds
    base_len = 1 + n_groups // coarse + 1
    use_meta = base_len + (1 + 2 * streams) * t_pad <= SMEM_I32_BUDGET
    # the paged-mode double-buffered page pair (2*(1+2S)*PAGE words, <= 27K
    # at S=6) lives in the ~50K-word headroom above the budget, so only
    # tile_bounds itself can make a table infeasible
    if base_len > SMEM_I32_BUDGET:
        raise ValueError(
            f"table too large for a single-chip stream kernel ({n_blocks} "
            "chain blocks of scalar metadata exceed SMEM); shard the index "
            "(--index-parallel) or use probe='gather'"
        )
    n_pages = 0 if use_meta else -(-t_pad // PAGE)
    return SchedulePlan(
        n_groups=n_groups, gpb=gpb, group=group, coarse=coarse,
        max_rounds=max_rounds, sum_rounds=sum_rounds, t_pad=t_pad,
        use_meta=use_meta, n_pages=n_pages,
    )


def max_feasible_streams(
    n_local: int, coarse: int = 0, group: int = 0, chain_block: int | None = None
) -> int:
    """Largest stream count whose schedule state fits the SMEM budget —
    mirrors ``plan_schedule``'s feasibility test exactly (same group/coarse
    resolution), so the pipeline can clamp its stream policy instead of
    tracing into the ValueError. With self-contained schedule entries the
    binding term is the paged-mode double-buffered page pair
    (2 * (1 + 2*streams) * PAGE words), so the bound is ~40 streams even on
    human-scale tables — in practice the VMEM tile-lane ceiling
    (auto_stream_cap's streams * cap <= 10240) binds first."""
    bpb = min(CHAIN_BLOCK, n_local) if chain_block is None else chain_block
    n_blocks = max(1, n_local // bpb)
    g = group or DEFAULT_GROUP
    g = max(1, min(g, n_blocks))
    while n_blocks % g:
        g //= 2
    n_groups = n_blocks // g
    c = coarse or DEFAULT_COARSE
    c = max(1, min(c // g, n_groups))
    while n_groups % c:
        c //= 2
    base_len = 1 + n_groups // c + 1
    return max(1, ((SMEM_I32_BUDGET - base_len) // (2 * PAGE) - 1) // 2)


def min_feasible_group(
    n_local: int, streams: int = 1, coarse: int = 0, chain_block: int | None = None
) -> int:
    """Smallest power-of-two chain-block group width whose scalar-prefetch
    state fits the SMEM budget at the given stream count (mirrors
    ``plan_schedule``'s feasibility test). With self-contained schedule
    entries the per-group SMEM state is just tile_bounds
    (n_groups/coarse words), so this is 1 up to ~400M buckets at the
    defaults — the old ~12M-bucket goff cliff (which forced group=4 and a
    single unsegmented sort on the 150M-key drill, 110-127 Mk/s) is gone.
    Kept because KmerMapper still bumps ``config.group`` to this
    automatically, which keeps truly extreme tables feasible."""
    bpb = min(CHAIN_BLOCK, n_local) if chain_block is None else chain_block
    n_blocks = max(1, n_local // bpb)
    g = 1
    while g < n_blocks:
        gg = g
        while n_blocks % gg:
            gg //= 2
        if gg == g:
            n_groups = n_blocks // g
            c = coarse or DEFAULT_COARSE
            c = max(1, min(c // g, n_groups))
            while n_groups % c:
                c //= 2
            base_len = 1 + n_groups // c + 1
            if base_len <= SMEM_I32_BUDGET:
                return g
        g *= 2
    return n_blocks


def plane_gpb(n_buckets: int, group: int = 1, chain_block: int | None = None) -> int:
    """Buckets per scheduled group = group * chain block — the minor dim of
    the device PLANE layout (and the unit the count order is blocked by).
    Mirrors ``plan_schedule``'s group clamping (group <= n_blocks, halved to
    a divisor) so layouts can never disagree with the kernel's plan."""
    bpb = min(CHAIN_BLOCK, n_buckets) if chain_block is None else chain_block
    n_blocks = max(1, n_buckets // bpb)
    g = max(1, min(group or 1, n_blocks))
    while n_blocks % g:
        g //= 2
    return g * bpb


def plane_keys(key_lo, key_hi, group: int = 1, chain_block: int | None = None):
    """Host-side relayout of (n_buckets, W) table key arrays into the device
    PLANE layout (n_groups, W, gpb) the stream kernel consumes, where
    gpb = group * chain_block (``plane_gpb``).

    Why: a (n_buckets, 8) u32 array's default XLA:TPU layout pads the 8-wide
    minor dim to the 128-lane tile — 16x the HBM (a 2.15 GB human-scale
    table became 3 materialized 16 GB temps and OOMed). The (n_groups, W,
    gpb) form is exactly (8, 128)-tiled (zero padding), and the kernel
    indexes a group's (W, gpb) plane block on the UNTILED leading dim —
    plain address arithmetic, where a 2-D (W, n_buckets) form forced
    dynamic-LANE-offset slices per tile (measured 6.5% slower end to end)."""
    key_lo = np.asarray(key_lo)
    n_buckets = key_lo.shape[0]
    gpb = plane_gpb(n_buckets, group, chain_block)
    shape = (n_buckets // gpb, gpb, key_lo.shape[1])
    return (
        np.ascontiguousarray(key_lo.reshape(shape).transpose(0, 2, 1)),
        np.ascontiguousarray(np.asarray(key_hi).reshape(shape).transpose(0, 2, 1)),
    )


def slot_to_plane(counts: np.ndarray, n_buckets: int, gpb: int = CHAIN_BLOCK) -> np.ndarray:
    """Flat slot-order counts (slot = bucket*K + lane) -> the group-blocked
    plane order ((g*K + lane) * gpb + bucket_in_group) that stream mappers
    keep their device counts in (host-side; inverse of ``plane_to_slot``)."""
    gpb = min(gpb, n_buckets)
    return np.ascontiguousarray(
        np.asarray(counts)
        .reshape(n_buckets // gpb, gpb, BUCKET_KEYS)
        .transpose(0, 2, 1)
    ).reshape(-1)


def plane_to_slot(counts: np.ndarray, n_buckets: int, gpb: int = CHAIN_BLOCK) -> np.ndarray:
    """Flat plane-order device counts -> the external slot order that
    ``layout.query_table`` / ``TpuKmerIndex.entry_slot`` index into."""
    gpb = min(gpb, n_buckets)
    return np.ascontiguousarray(
        np.asarray(counts)
        .reshape(n_buckets // gpb, BUCKET_KEYS, gpb)
        .transpose(0, 2, 1)
    ).reshape(-1)


def plane_slot_index(slot, n_buckets: int, gpb: int = CHAIN_BLOCK):
    """Slot id (bucket*K + lane) -> its index in the plane-order flat
    counts ((g*K + lane)*gpb + j, bucket = g*gpb + j). np and jnp arrays."""
    gpb = min(gpb, n_buckets)
    b = slot // BUCKET_KEYS
    lane = slot % BUCKET_KEYS
    return ((b // gpb) * BUCKET_KEYS + lane) * gpb + b % gpb


def sort_queries(q_lo, q_hi, valid, n_buckets: int, seed: int, pad_to: int = 0):
    """(sorted_m_lo, sorted_m_hi): queries bijectively mixed, sorted by m_lo.

    The bucket id is the HIGH bits of m_lo, so this one 2-operand sort groups
    (and orders) queries by bucket — dropping the separate bucket operand of
    the pre-mixed layout saved ~28% of the sort (r3_s_dissect.py; key width
    itself does not matter, r3_sort_width.py). Invalid queries become the
    all-ones word pair: they sort to the tail of the last bucket's range and
    are masked out of the hit test in the kernel. Unstable sort: counting is
    order-insensitive within a bucket.

    ``pad_to`` (the kernel tile size): pad with invalid entries BEFORE the
    sort so the sorted array already carries the kernel's tail slack —
    stream_count(tail_padded=True) then skips two full-array concatenates.
    The pad is 2*pad_to beyond alignment: block windows are 128-aligned, so
    the last window can overhang the last block bound by up to a tile."""
    if pad_to:
        n = q_lo.shape[0]
        pad = (-n) % pad_to + 2 * pad_to
        q_lo = jnp.concatenate([q_lo, jnp.zeros(pad, q_lo.dtype)])
        q_hi = jnp.concatenate([q_hi, jnp.zeros(pad, q_hi.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    m_lo, m_hi = feistel_mix(q_lo, q_hi, seed=seed, xp=jnp)
    m_lo = jnp.where(valid, m_lo, INVALID_WORD)
    m_hi = jnp.where(valid, m_hi, INVALID_WORD)
    return lax.sort((m_lo, m_hi), dimension=0, num_keys=1, is_stable=False)


def mix_pad_segments(q_lo, q_hi, valid, seed: int, pad_to: int, segments: int):
    """Mix + mask + per-segment tail-pad UNSORTED queries into the
    multi-stream layout ``stream_probe_count_mixed`` consumes.

    The ragged-path analog of ``hashing.plane_hash_mixed(segments=S)``: the
    query array splits into S equal slices, each independently tail-padded
    with the invalid all-ones pattern (>= 2*pad_to slack, like
    ``sort_queries(pad_to=...)``), so each segment can be sorted at XLA's
    small-array sweet-spot rate while the kernel serves all S sorted streams
    from one tile schedule. Returns (m_lo, m_hi, seg_bounds)."""
    assert segments >= 1
    n = q_lo.shape[0]
    assert n >= segments
    m_lo, m_hi = feistel_mix(q_lo, q_hi, seed=seed, xp=jnp)
    m_lo = jnp.where(valid, m_lo, INVALID_WORD)
    m_hi = jnp.where(valid, m_hi, INVALID_WORD)

    def tail(ln):
        pad = (-ln) % pad_to + 2 * pad_to
        return jnp.full(pad, INVALID_WORD)

    lo_parts, hi_parts, bounds = [], [], []
    pos = 0
    for s in range(segments):
        a, b = n * s // segments, n * (s + 1) // segments
        t = tail(b - a)
        lo_parts += [lax.slice(m_lo, (a,), (b,)), t]
        hi_parts += [lax.slice(m_hi, (a,), (b,)), t]
        length = (b - a) + t.shape[0]
        bounds.append((pos, length))
        pos += length
    return (
        jnp.concatenate(lo_parts),
        jnp.concatenate(hi_parts),
        tuple(bounds),
    )


def block_offsets(sorted_m_lo, n_buckets: int, block: int, bucket_base=0, n_local=None):
    """int32[n_blocks + 1] query-range bounds per table block.

    Bucket b owns sorted positions with ``m_lo >> shift == b``, so the bounds
    are bisections for the m_lo thresholds ``(bucket << shift)``. A threshold
    at or past 2^32 (the end of the global table) means "end of array" — that
    last range also absorbs the invalid-query tail (all-ones words), which the
    kernel masks. With ``bucket_base``/``n_local`` the bounds cover only the
    shard-local bucket range; queries owned by other shards fall outside
    every range."""
    if n_local is None:
        n_local = n_buckets
    n_blocks = max(1, n_local // min(block, n_buckets))
    block = n_local // n_blocks
    shift = min(bucket_shift(n_buckets), 31)  # shift 32 only when every
    # bucket id is 0 (n_buckets == 1), where the non-top bound is 0 anyway
    n = sorted_m_lo.shape[0]
    # bucket-id arithmetic stays in int32 (ids <= n_buckets <= 2^22); the only
    # threshold that would overflow u32 is the global table's top, which
    # simply means "end of array" (and absorbs the invalid-query tail)
    bounds_b = jnp.asarray(bucket_base, jnp.int32) + jnp.arange(
        n_blocks + 1, dtype=jnp.int32
    ) * jnp.int32(block)
    is_top = bounds_b >= jnp.int32(n_buckets)
    vals = jnp.where(is_top, 0, bounds_b).astype(jnp.uint32) << jnp.uint32(shift)
    off = _searchsorted_u32(sorted_m_lo, vals)
    return jnp.where(is_top, jnp.int32(n), off)


def _searchsorted_u32(sorted_vals, queries):
    """Vectorized left bisection with interpolation (jnp.searchsorted measured
    ~5 ms for a few thousand queries on v5e; plain bisection needs log2(n)
    full-array gather rounds — ~24 at production chunk sizes).

    The sorted values are feistel-mixed, i.e. uniform over u32, so linear
    interpolation lands within ~sqrt(n) of the target and converges in a few
    probes. Interpolation alone degrades to linear creep on long duplicate
    runs (the poly-A case), so every other step is a plain bisection halving
    — the while_loop is exact and bounded at ~2 log2(n) worst case, ~8-10
    gather rounds typical."""
    n = sorted_vals.shape[0]
    lo = jnp.zeros(queries.shape, dtype=jnp.int32)
    hi = jnp.full(queries.shape, n, dtype=jnp.int32)
    # tightest sampled value bounds: elements < lo are < q and <= vlo;
    # elements >= hi are >= q and >= vhi
    vlo = jnp.zeros(queries.shape, dtype=jnp.uint32)
    vhi = jnp.full(queries.shape, jnp.uint32(0xFFFFFFFF))

    def probe_at(mid, carry):
        lo, hi, vlo, vhi = carry
        live = lo < hi
        x = sorted_vals[jnp.minimum(mid, n - 1)]
        below = x < queries
        lo = jnp.where(live & below, mid + 1, lo)
        vlo = jnp.where(live & below, jnp.maximum(vlo, x), vlo)
        hi = jnp.where(live & ~below, mid, hi)
        vhi = jnp.where(live & ~below, jnp.minimum(vhi, x), vhi)
        return lo, hi, vlo, vhi

    def body(carry):
        i, lo, hi, vlo, vhi = carry
        # interpolation step: mid = lo + frac * (hi - lo), clamped interior
        span_v = jnp.maximum((vhi - vlo).astype(jnp.float32), 1.0)
        frac = (queries - vlo).astype(jnp.float32) / span_v
        gap = hi - lo
        step = jnp.clip(
            (frac * gap.astype(jnp.float32)).astype(jnp.int32), 0, jnp.maximum(gap - 1, 0)
        )
        carry4 = probe_at(lo + step, (lo, hi, vlo, vhi))
        # bisection step: guarantees halving regardless of value distribution
        lo, hi, vlo, vhi = carry4
        carry4 = probe_at((lo + hi) // 2, (lo, hi, vlo, vhi))
        return (i + 1,) + carry4

    def cond(carry):
        i, lo, hi, _, _ = carry
        return (i < np.int32(max(1, int(np.ceil(np.log2(max(2, n)))) + 2))) & jnp.any(
            lo < hi
        )

    _, lo, hi, _, _ = lax.while_loop(cond, body, (jnp.int32(0), lo, hi, vlo, vhi))
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
    """(coarse, W, gpb) plane-layout lo/hi words -> (coarse, 8*W, gpb) f32
    byte planes, plane-major: rows [pW:(p+1)W] = byte plane p (lo bytes 0-3,
    hi bytes 0-3). W is BUCKET_KEYS times the chain-augmentation width.
    Buckets live on the LANE dim and the group on the untiled leading dim:
    a (n_buckets, 8) HBM array pads its 8-wide minor dim to the 128-lane
    tile (a measured 16x HBM expansion — 3 materialized 16 GB temps on a
    2.15 GB human-scale table), while (n_groups, W, gpb) is exactly
    (8, 128)-tiled and per-tile group selection is untiled-dim address
    arithmetic instead of a dynamic-lane-offset slice (measured 6.5%)."""
    return jnp.concatenate(_bytes8(key_lo, key_hi), axis=1)


def _packed_query_planes(qlo, qhi):
    """Query (lo, hi) uint32 -> 3 packed f32 planes matching _packed_gathered:
    p0 = lo bytes 0-2, p1 = lo byte 3 + hi bytes 0-1, p2 = hi bytes 2-3.
    Each < 2^24, exact in f32 (int32 intermediate: values < 2^24 fit)."""
    u = jnp.uint32
    p0 = (qlo & u(0xFFFFFF)).astype(jnp.int32).astype(jnp.float32)
    p1 = ((qlo >> u(24)) | ((qhi & u(0xFFFF)) << u(8))).astype(jnp.int32).astype(jnp.float32)
    p2 = (qhi >> u(16)).astype(jnp.int32).astype(jnp.float32)
    return p0, p1, p2


def _packed_gathered(gathered, h: int = 0, aug: int = 1):
    """(8*aug*K, cap) f32 byte planes -> 3 packed planes of (K, cap) for
    augmentation half ``h``, same packing as _packed_query_planes. Gathered
    values are exact bytes (each one-hot column selects a single table row),
    so the packed sums are < 2^24."""
    K = BUCKET_KEYS
    W = aug * K
    g = [gathered[p * W + h * K : p * W + (h + 1) * K, :] for p in range(8)]
    p0 = g[0] + 256.0 * g[1] + 65536.0 * g[2]
    p1 = g[3] + 256.0 * g[4] + 65536.0 * g[5]
    p2 = g[6] + 256.0 * g[7]
    return p0, p1, p2


ALIGN = 128  # DMA windows start on a lane-aligned query offset (<= cap)


PAGE = 1024  # schedule entries per paged-mode page (see _kernel docstring)


def _kernel(
    off_ref,  # scalar-prefetch int32: [shard_base, tile_bounds(n_steps+1)] + (SMEM mode) [t_meta(t_pad), t_off(t_pad) x streams, t_rb(t_pad) x streams]
    key_lo_ref,  # VMEM (coarse, aug*K, gpb) — plane layout, buckets on lanes
    key_hi_ref,
    counts_in_ref,  # VMEM (coarse, K, gpb) uint32, aliased with output
    q_hbm,  # ANY (2, n_padded) uint32: rows = sorted m_lo / m_hi
    *rest,  # (paged) sched_hbm int32[n_pages, 2, PAGE]; then outputs/scratch
    cap: int,
    bpb: int,  # chain block (wrap quantum)
    gpb: int,  # rows per scheduled group = group * bpb (one-hot height)
    n_groups: int,
    coarse: int,  # groups per grid step
    t_pad: int,
    n_slots: int,
    use_meta: bool,
    shift: int,  # bucket id = m_lo >> shift (global bucket count)
    aug: int,  # chained buckets compared per scheduled round (layout.aug_keys)
    n_pages: int = 0,
    streams: int = 1,  # independently sorted query streams sharing the tiles
):
    """One grid step = ``coarse`` chain blocks, iterated as ONE flat fori_loop
    over scheduled (block, probe round) query tiles. The table byte planes for
    the whole step are computed once into ``tb_s`` (the v2 kernel recomputed
    them per tile — a measurable share of its ~995 ns/tile).

    Two schedule homes: with ``use_meta`` the flat tile -> (group << 3 |
    round, DMA offset) schedule lives in scalar-prefetch SMEM (``t_pad``
    entries per array), so an iteration does a handful of SMEM reads and the
    fused query DMA is issued ``n_slots - 1`` tiles ahead across group
    boundaries. For large tables those arrays overflow SMEM (~1 MB), so the
    schedule is PAGED instead: it lives in HBM as int32[n_pages, 2, PAGE]
    and pages stream HBM -> VMEM -> SMEM (Mosaic rejects direct HBM -> SMEM
    copies), double-buffered so pages k and k+1 are always SMEM-resident
    while the HBM->VMEM hop for k+2 is in flight — the per-tile schedule
    reads and the deep DMA lookahead are identical to the SMEM mode, at one
    short VMEM->SMEM wait per PAGE tiles. (This replaced a scalar
    while-cursor fallback that re-derived the schedule per tile with 2-deep
    buffering: measured 159 vs ~300 Mk/s on a 4M-bucket table.) Page-slot
    state persists across grid steps in SMEM scratch (the TPU grid is
    sequential on one core)."""
    if use_meta:
        counts_out_ref, q_s, tb_s, sems = rest
    else:
        (sched_hbm, counts_out_ref, q_s, tb_s, sems,
         pg_v, pg_smem, pg_state, pg_vsems, pg_ssems) = rest
    ci = pl.program_id(0)
    counts_out_ref[...] = counts_in_ref[...]
    tb_s[...] = _table_bytes(key_lo_ref[...], key_hi_ref[...]).astype(jnp.bfloat16)
    lanes = streams * cap  # tile width: one cap-wide sub-window per stream
    rows = lax.broadcasted_iota(jnp.int32, (gpb, lanes), 0)
    lane_pos = lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    if streams > 1:
        lane_sidx = lane_pos // cap  # which stream owns each lane
        lane_sub = lane_pos % cap  # lane offset within its sub-window
    else:
        lane_sub = lane_pos
    n_steps = n_groups // coarse
    # scalar layout: [shard_base | tile_bounds | (SMEM mode) t_meta,
    # t_off x streams, t_rb x streams]. Schedule entries are SELF-CONTAINED:
    # besides the absolute DMA offset, each (tile, stream) carries its live
    # window as tile-RELATIVE bounds packed into one word (lo | hi << 16,
    # both in [0, cap]), so the per-group goff arrays — S*(n_groups+1) SMEM
    # words that used to force group widening past ~12M buckets at group=1
    # (the old base_len cliff) — are gone and SMEM holds only tile_bounds.
    # streams == 1 is bit-identical to the single-stream layout. A
    # multi-stream tile serves one (group, round) with one cap-wide
    # sub-window per independently sorted stream: S fused DMAs + S
    # sub-bodies per tile — per-query work identical to the single-stream
    # kernel, while each stream's SORT ran at its small-array sweet spot
    # (see stream_probe_count_mixed).
    tb0 = 1
    t_lo = off_ref[tb0 + ci]
    t_hi = off_ref[tb0 + ci + 1]
    meta0 = tb0 + n_steps + 1
    align = min(ALIGN, cap)

    def dma_at(offset, slot, s):
        # one fused (2, cap) copy per (tile, stream) into stream s's lane
        # slice of the tile scratch: both mixed-word rows share the offset,
        # so two copies + two semaphore waits become one. All S sub-windows
        # then form ONE (2, S*cap) tile processed by a single body pass —
        # per-lane work is unchanged vs single-stream, and the per-tile
        # fixed costs (one-hot materialization, two matmul issues, mask
        # setup) are paid once instead of once per stream.
        o = pl.multiple_of(offset, align)
        return pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(o, cap)],
            q_s.at[slot, :, pl.ds(s * cap, cap)],
            sems.at[slot, s],
        )

    if use_meta:
        def sched_meta(t):
            return off_ref[meta0 + t]

        def sched_off(t, s):
            return off_ref[meta0 + (1 + s) * t_pad + t]

        def sched_rb(t, s):
            return off_ref[meta0 + (1 + streams + s) * t_pad + t]
    else:
        def vmem_copy(k):
            kk = jnp.minimum(k, jnp.int32(n_pages - 1))
            return pltpu.make_async_copy(
                sched_hbm.at[kk], pg_v.at[k % 2], pg_vsems.at[k % 2]
            )

        def load_page(k):
            # complete page k into SMEM (its HBM->VMEM hop must be in flight).
            # Mosaic rejects a dynamically-indexed SMEM DMA destination, so
            # the slot is unrolled into static pl.when branches.
            vmem_copy(k).wait()
            for slot in (0, 1):
                @pl.when(k % 2 == slot)
                def _(slot=slot):
                    cp = pltpu.make_async_copy(
                        pg_v.at[slot], pg_smem.at[slot], pg_ssems.at[slot]
                    )
                    cp.start()
                    cp.wait()

        @pl.when(ci == 0)
        def _():
            vmem_copy(jnp.int32(0)).start()
            load_page(jnp.int32(0))
            vmem_copy(jnp.int32(1)).start()
            load_page(jnp.int32(1))
            vmem_copy(jnp.int32(2)).start()
            pg_state[0] = 2  # pages [0, 1] SMEM-resident; hop for 2 in flight

        def sched_meta(t):
            return pg_smem[(t // PAGE) % 2, 0, t % PAGE]

        def sched_off(t, s):
            return pg_smem[(t // PAGE) % 2, 0, (1 + s) * PAGE + (t % PAGE)]

        def sched_rb(t, s):
            return pg_smem[
                (t // PAGE) % 2, 0, (1 + streams + s) * PAGE + (t % PAGE)
            ]

    def start_tile_dmas(t, slot):
        for s in range(streams):
            dma_at(sched_off(t, s), slot, s).start()

    for w in range(n_slots - 1):
        @pl.when(t_lo + w < t_hi)
        def _(w=w):
            start_tile_dmas(t_lo + w, w % n_slots)

    def body(ti, carry):
        t = t_lo + ti
        slot = ti % n_slots
        if not use_meta:
            # page advance: fires only when t crosses into a new page (t is
            # contiguous across tiles and grid steps, so one step suffices)
            need = t // PAGE + 2
            @pl.when((carry < need) & (carry < jnp.int32(n_pages)))
            def _():
                load_page(carry)
                vmem_copy(carry + 1).start()
            carry = jnp.maximum(carry, jnp.minimum(need, jnp.int32(n_pages)))

        @pl.when(ti + n_slots - 1 < t_hi - t_lo)
        def _():
            start_tile_dmas(t + n_slots - 1, (ti + n_slots - 1) % n_slots)

        m = sched_meta(t)
        grp = m >> PROBE_BITS
        p = m & ((1 << PROBE_BITS) - 1)
        base_bucket = off_ref[0] + grp * gpb  # off_ref[0] = shard base (buckets)
        g_local = grp - ci * coarse  # group's slot on the untiled leading dim
        tb = tb_s[g_local]  # (8*aug*K, gpb)
        # live-window mask from the entry's packed tile-RELATIVE bounds
        # (rb = lo | hi << 16, both in [0, cap], computed against the entry's
        # own clamped DMA offset at schedule-build time): a lane is live iff
        # lane_sub in [lo, hi) — bit-identical to the old absolute
        # pos-vs-group-bounds test, with one packed SMEM read per (tile,
        # stream) instead of two goff reads, and ONE lane select instead of
        # three (no pos vector needed)
        if streams == 1:
            dma_at(sched_off(t, 0), slot, 0).wait()
            rbv = sched_rb(t, 0)
        else:
            rbs = []
            for s in range(streams):
                dma_at(sched_off(t, s), slot, s).wait()
                rbs.append(sched_rb(t, s))

            def lane_select(vals):
                out = jnp.full(lane_sidx.shape, vals[0], jnp.int32)
                for s in range(1, streams):
                    out = jnp.where(lane_sidx == s, vals[s], out)
                return out

            rbv = lane_select(rbs)
        qm_lo = q_s[slot, 0:1, :]
        qm_hi = q_s[slot, 1:2, :]
        # bucket id = high bits of the mixed low word (no bucket operand);
        # a single-bucket table (shift 32) has bucket id 0 for every query
        if shift >= 32:
            qb = jnp.zeros(qm_lo.shape, jnp.int32)
        else:
            qb = (qm_lo >> jnp.uint32(shift)).astype(jnp.int32)
        live = (lane_sub >= (rbv & jnp.int32(0xFFFF))) & (
            lane_sub < (rbv >> jnp.int32(16))
        )
        local_b = qb - base_bucket  # (1, S*cap), in [0, gpb) when live
        live = live & (local_b >= 0) & (local_b < gpb)
        # invalid queries (all-ones word pair) ride the last bucket's range;
        # they may only "match" EMPTY slots — mask them out of the hit test
        live = live & ~((qm_lo == INVALID_WORD) & (qm_hi == INVALID_WORD))
        # scheduled round p folded into the one-hot: comparing against row
        # (local_b + p*aug), wrapped WITHIN the query's own chain block,
        # gathers the chained bucket's keys AND lands the count contribution
        # on that same chained row — identical to rolling the table tile,
        # with no roll. With chain augmentation (aug > 1) the table row also
        # carries the NEXT aug-1 buckets' keys (layout.aug_keys), so one
        # scheduled round covers aug chain positions: extra 62-bit-exact
        # compares are always sound (a key is stored once — they can only
        # find the true slot), so most blocks need a single round. A group is
        # ``gpb // bpb`` adjacent chain blocks served by ONE widened one-hot
        # (the gather/compare work is shared, unlike the rejected
        # sub-grouping that duplicated the matmuls).
        local_bp = (local_b & ~jnp.int32(bpb - 1)) | (
            (local_b + p * jnp.int32(aug)) & jnp.int32(bpb - 1)
        )
        one_hot = ((rows == local_bp) & live).astype(jnp.bfloat16)
        # per-query candidate key bytes: (8*aug*K, S*cap) = tb ⨯ one_hot
        # (tb is already plane-major with buckets on the contraction dim)
        gathered = lax.dot_general(
            tb,
            one_hot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qp0, qp1, qp2 = _packed_query_planes(qm_lo, qm_hi)
        total = None
        for h in range(aug):
            gp0, gp1, gp2 = _packed_gathered(gathered, h, aug)
            hits = live & (gp0 == qp0) & (gp1 == qp1) & (gp2 == qp2)
            c = lax.dot_general(
                hits.astype(jnp.bfloat16),
                one_hot,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (K, gpb): contributions computed at the one-hot row (lanes =
            # buckets), but a half-h hit belongs to bucket (row + h) wrapped
            # in the chain block — shift lanes down by h (gpb == bpb if aug>1)
            if h:
                c = jnp.concatenate([c[:, gpb - h :], c[:, : gpb - h]], axis=1)
            total = c if total is None else total + c
        counts_out_ref[g_local] = counts_out_ref[g_local] + total.astype(
            jnp.int32
        ).astype(jnp.uint32)
        return carry

    if use_meta:
        lax.fori_loop(0, t_hi - t_lo, body, 0)
    else:
        final = lax.fori_loop(0, t_hi - t_lo, body, pg_state[0])
        pg_state[0] = final

        # exactly one HBM->VMEM prefetch (for page ``final``) is always in
        # flight; drain it before the kernel exits (the runtime requires all
        # DMA semaphores settled) — only on the last grid step
        @pl.when(ci == n_steps - 1)
        def _():
            vmem_copy(final).wait()


def stream_count(
    key_lo: jnp.ndarray,  # uint32[n_groups, aug*K, gpb] PLANE layout (mixed
    # words, group's buckets on the minor dim — see plane_keys; word-row
    # group h = keys of bucket chain_next(b, h) — layout.aug_keys; aug == 1
    # is the plain table). The layout's group width must match ``group``.
    key_hi: jnp.ndarray,
    counts: jnp.ndarray,  # uint32[n_slots] flat, PLANE order (slot_to_plane)
    sorted_m_lo: jnp.ndarray,  # uint32[N] mixed, sorted (sort_queries); with
    # multiple streams: the concatenation of S independently sorted,
    # individually tail-padded segments
    sorted_m_hi: jnp.ndarray,
    off: jnp.ndarray,  # int32[n_blocks + 1], or int32[S, n_blocks + 1] with
    # per-stream ABSOLUTE positions into the concatenated array (multi-stream
    # tiles: the sort runs at its small-array sweet spot per segment while
    # the kernel keeps one tile schedule — each tile serves one (block,
    # round, stream) window, so per-tile work is unchanged)
    max_probe: int,
    cap: int = DEFAULT_CAP,
    interpret: bool = False,
    bucket_base=0,  # shard-local tables: global bucket id of local bucket 0
    chain_block: int | None = None,  # build-time chain block (global tables: auto)
    block_probe=None,  # int32[n_blocks] per-block chain bound (None: max_probe)
    coarse: int = 0,  # chain blocks folded into one grid step (0 = DEFAULT_COARSE,
    # resolved at call time so sweeps can override the module default)
    n_buckets_global: int | None = None,  # sharded tables: global bucket count
    group: int = 0,  # adjacent chain blocks served by one widened one-hot
    # tile (0 = DEFAULT_GROUP): boundary tiles between grouped blocks are
    # processed once instead of once per block
    tail_padded: bool = False,  # sorted arrays already carry >= 2*cap of
    # invalid tail slack (sort_queries(pad_to=cap)): skip the concat here
) -> jnp.ndarray:
    """counts += histogram of table hits among the sorted queries.

    ``key_lo``/``key_hi``/``counts`` may be a shard of a larger table; pass
    the shard's ``bucket_base``, the build-time ``chain_block``
    (= min(CHAIN_BLOCK, n_buckets_global)) and ``n_buckets_global``; shard
    sizes must be chain-block multiples so the in-kernel chain wrap reproduces
    the build's wrapping."""
    n_local = key_lo.shape[0] * key_lo.shape[2]
    aug = key_lo.shape[1] // BUCKET_KEYS
    assert key_lo.shape[1] == aug * BUCKET_KEYS
    if n_buckets_global is None:
        n_buckets_global = n_local
    shift = bucket_shift(n_buckets_global)
    bpb = min(CHAIN_BLOCK, n_local) if chain_block is None else chain_block
    assert n_local % bpb == 0, "table shard must be a multiple of the chain block"
    # the key layout's group width is authoritative (plane_keys(group=...));
    # an explicit group argument must agree with it after the plan's clamping
    layout_group = key_lo.shape[2] // bpb
    assert key_lo.shape[2] == layout_group * bpb, (
        f"plane key layout {key_lo.shape} does not block by the chain block {bpb}"
    )
    if group and plane_gpb(n_local, group, bpb) != key_lo.shape[2]:
        raise ValueError(
            f"group={group} does not match the key layout's group width "
            f"{layout_group} (re-ship the table with plane_keys(group={group}))"
        )
    group = layout_group
    if aug > 1:
        assert (group or DEFAULT_GROUP) == 1, "chain augmentation requires group == 1"
        assert aug <= bpb
    # the DMA-offset alignment promised to Mosaic (pl.multiple_of) requires
    # tile strides to preserve the window base's alignment
    assert cap % min(ALIGN, cap) == 0, f"cap must be a multiple of {ALIGN} (or < {ALIGN})"
    streams = 1 if off.ndim == 1 else off.shape[0]
    n = sorted_m_lo.shape[0]
    if tail_padded:
        pad = 0  # sort_queries already appended the invalid tail slack
    else:
        assert streams == 1, "multi-stream queries must arrive tail-padded"
        # the last window may extend past n by up to cap; padding is the
        # invalid all-ones pattern, masked in-kernel like real invalid queries
        pad = (-n) % cap + cap
        sorted_m_lo = jnp.concatenate([sorted_m_lo, jnp.full(pad, INVALID_WORD)])
        sorted_m_hi = jnp.concatenate([sorted_m_hi, jnp.full(pad, INVALID_WORD)])
    q = jnp.stack([sorted_m_lo, sorted_m_hi])  # (2, n_padded)
    counts3d = counts.reshape(-1, BUCKET_KEYS, key_lo.shape[2])  # plane order

    # static schedule shapes + the paged-vs-SMEM ("meta") decision: the
    # per-tile schedule arrays only fit scalar-prefetch SMEM (~1 MB) for
    # small/medium tables; for large tables the schedule lives in HBM and is
    # PAGED through VMEM into SMEM (see _kernel and plan_schedule)
    plan = plan_schedule(
        n_local, n + pad, cap=cap, max_probe=max_probe, aug=aug, group=group,
        coarse=coarse, chain_block=bpb, block_probe=block_probe, streams=streams,
    )
    n_groups, gpb, group, coarse = plan.n_groups, plan.gpb, plan.group, plan.coarse
    max_rounds, t_pad, use_meta = plan.max_rounds, plan.t_pad, plan.use_meta
    n_pages = plan.n_pages

    if block_probe is None:
        rounds = jnp.full(n_groups, max_probe, dtype=jnp.int32)
    else:
        # per-group chain bound = max over the group's chain blocks
        rounds = jnp.asarray(block_probe, dtype=jnp.int32)
        if plan.group > 1:
            rounds = rounds.reshape(n_groups, plan.group).max(axis=1)
    if aug > 1:
        # one scheduled round covers ``aug`` chain positions
        rounds = (rounds + jnp.int32(aug - 1)) // jnp.int32(aug)
    n_slots = N_DMA_SLOTS

    in_specs = [
        pl.BlockSpec((coarse, aug * BUCKET_KEYS, gpb), lambda i, off: (i, 0, 0)),
        pl.BlockSpec((coarse, aug * BUCKET_KEYS, gpb), lambda i, off: (i, 0, 0)),
        pl.BlockSpec((coarse, BUCKET_KEYS, gpb), lambda i, off: (i, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]
    scratch_shapes = [
        pltpu.VMEM((n_slots, 2, streams * cap), jnp.uint32),
        pltpu.VMEM((coarse, 8 * aug * BUCKET_KEYS, gpb), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((n_slots, streams)),
    ]
    if not use_meta:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
        scratch_shapes += [
            # page buffers: [meta | off_s x streams | rb_s x streams] halves,
            # each PAGE entries long
            pltpu.VMEM((2, 1, (1 + 2 * streams) * PAGE), jnp.int32),
            pltpu.SMEM((2, 1, (1 + 2 * streams) * PAGE), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),  # pages loaded so far (cross-step)
            pltpu.SemaphoreType.DMA((2,)),  # HBM -> VMEM hop
            pltpu.SemaphoreType.DMA((2,)),  # VMEM -> SMEM hop
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups // coarse,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((coarse, BUCKET_KEYS, gpb), lambda i, off: (i, 0, 0)),
        scratch_shapes=scratch_shapes,
    )
    # flat schedule: one entry per (block, probe round, cap-sized tile); a
    # block whose chain bound is L appears ceil(L/aug) times over its query
    # window. Entries are SELF-CONTAINED: (group << PROBE_BITS) | p, ONE
    # precomputed DMA offset PER STREAM, and ONE packed live-window word PER
    # STREAM (rel_lo | rel_hi << 16, both relative to the entry's own
    # clamped offset) — so no per-group arrays ever reach SMEM and the
    # schedule scales to human-genome tables at group=1. A multi-stream
    # tile serves the same (group, round) with one cap-wide sub-window per
    # independently sorted stream, so the tile count follows the group's
    # largest stream share.
    assert cap <= 0x7FFF, "packed rel bounds hold [0, cap] in 16 bits"
    align = min(ALIGN, cap)
    n_padded_total = sorted_m_lo.shape[0] + pad
    off2d = off.reshape(streams, -1)
    goff2d = off2d[:, ::group] if group > 1 else off2d  # (S, n_groups + 1)
    g_starts = goff2d[:, :-1]  # (S, n_groups)
    g_ends = goff2d[:, 1:]
    bases = g_starts & ~jnp.int32(align - 1)
    n_tiles_s = jnp.where(
        g_ends > g_starts, (g_ends - bases + jnp.int32(cap - 1)) // cap, jnp.int32(0)
    )
    n_tiles_g = n_tiles_s.max(axis=0)  # (n_groups,)
    rounds = jnp.clip(rounds, 1, max_rounds)
    n_sched_g = n_tiles_g * rounds
    csum = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(n_sched_g, dtype=jnp.int32)]
    )
    tile_bounds = csum[::coarse]  # (n_groups // coarse + 1,)
    parts = [
        jnp.asarray(bucket_base, dtype=jnp.int32).reshape(1),
        tile_bounds,
    ]
    # t_grp[t] = group of schedule entry t (boundary scatter + cumsum)
    t_grp = jnp.cumsum(
        jnp.zeros(t_pad, jnp.int32).at[csum[1:]].add(1, mode="drop")
    )
    safe = jnp.minimum(t_grp, n_groups - 1)
    # ONE row gather serves every per-group value the build needs: XLA row
    # gathers cost ~6 ns/row FLAT up to 8xu32 rows on v5e (BASELINE.md), so
    # packing [csum_g | n_tiles_g | bases_s... | starts_s... | ends_s...]
    # into (n_groups + 1, 2 + 3S) rows makes the build pay one gather pass
    # over t_pad instead of 2 + 3S. Row n_groups repeats the last group's
    # tiles/bases and holds start == end == the total end, so slack entries
    # past csum[-1] read it harmlessly AND their rel bounds collapse to an
    # empty live window (the old build relied on the invalid-query mask for
    # the same entries — both yield zero contributions).
    end_row = g_ends.T[-1:, :]
    packed_g = jnp.concatenate(
        [
            csum[:, None],
            jnp.concatenate([n_tiles_g, n_tiles_g[-1:]])[:, None],
            jnp.concatenate([bases.T, bases.T[-1:, :]], axis=0),
            jnp.concatenate([g_starts.T, end_row], axis=0),
            jnp.concatenate([g_ends.T, end_row], axis=0),
        ],
        axis=1,
    )  # (n_groups + 1, 2 + 3S) int32
    rows_t = jnp.take(packed_g, jnp.minimum(t_grp, n_groups), axis=0)
    r = jnp.arange(t_pad, dtype=jnp.int32) - rows_t[:, 0]
    nt = jnp.maximum(rows_t[:, 1], 1)
    p = jnp.minimum(r // nt, max_rounds - 1)
    t_meta = (safe << PROBE_BITS) | p
    # per-stream offsets; a stream whose window has fewer tiles than the
    # group's max reads harmlessly past its window (the rel-bound live mask
    # rejects, and every segment carries >= 2*cap in-array tail slack),
    # clamped so the final segment's overhang never leaves the array
    tile_step = (r - p * nt) * jnp.int32(cap)
    t_offs = [
        jnp.minimum(
            rows_t[:, 2 + s] + tile_step, jnp.int32(n_padded_total - cap)
        )
        for s in range(streams)
    ]
    # packed live windows, computed against the CLAMPED offsets so mask and
    # DMA can never disagree: lane live iff lane in [lo, hi)
    t_rbs = [
        jnp.clip(rows_t[:, 2 + streams + s] - t_offs[s], 0, cap)
        | (jnp.clip(rows_t[:, 2 + 2 * streams + s] - t_offs[s], 0, cap) << 16)
        for s in range(streams)
    ]
    lanes = 1 + 2 * streams  # words/entry: meta + offset + rb per stream
    if use_meta:
        parts += [t_meta] + t_offs + t_rbs
        sched_args = ()
    else:
        extra = n_pages * PAGE - t_pad
        z = jnp.zeros(extra, jnp.int32)
        sched = jnp.stack(
            [jnp.concatenate([half, z]) for half in [t_meta] + t_offs + t_rbs]
        )
        # (n_pages, 1, lanes*PAGE): page row = [meta(PAGE) | off_s(PAGE)... |
        # rb_s(PAGE)...] — one fused DMA per page covers all halves
        sched_args = (
            sched.reshape(lanes, n_pages, PAGE)
            .transpose(1, 0, 2)
            .reshape(n_pages, 1, lanes * PAGE),
        )
    scalars = jnp.concatenate(parts)
    kernel = functools.partial(
        _kernel, cap=cap, bpb=bpb, gpb=gpb, n_groups=n_groups,
        coarse=coarse, t_pad=t_pad, n_slots=n_slots, use_meta=use_meta,
        shift=shift, aug=aug, n_pages=n_pages, streams=streams,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_local // gpb, BUCKET_KEYS, gpb), jnp.uint32
        ),
        input_output_aliases={3: 0},  # counts3d (arg 3 incl. scalar prefetch)
        interpret=interpret,
    )(scalars, key_lo, key_hi, counts3d, q, *sched_args)
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
    coarse: int = 0,
    group: int = 0,
    streams: int = 1,
):
    """Full stream path: sort -> block offsets -> stream kernel.

    ``streams > 1`` sorts the queries as S independent equal segments served
    by multi-stream kernel tiles (``mix_pad_segments`` + the seg_bounds path
    of ``stream_probe_count_mixed``) — XLA's flat 2-operand sort has a
    per-element cliff past ~2^24 elements, so large ragged chunks and big
    pre-hashed batches keep the small-sort rate this way, exactly like the
    fixed-read-length plane path.

    ``key_lo``/``key_hi`` are PLANE-layout (n_groups, aug*K, gpb) arrays and
    ``counts`` is plane-order flat — see ``stream_count``."""
    n_buckets = key_lo.shape[0] * key_lo.shape[2]
    if streams > 1:
        m_lo, m_hi, seg_bounds = mix_pad_segments(
            q_lo, q_hi, valid, seed, cap, streams
        )
        return stream_probe_count_mixed(
            key_lo, key_hi, counts, m_lo, m_hi, max_probe,
            cap=cap, interpret=interpret, block_probe=block_probe,
            coarse=coarse, group=group, seg_bounds=seg_bounds,
        )
    sm_lo, sm_hi = sort_queries(q_lo, q_hi, valid, n_buckets, seed, pad_to=cap)
    bpb = min(CHAIN_BLOCK, n_buckets)
    off = block_offsets(sm_lo, n_buckets, bpb)
    # the last tile window can overhang its block bound by up to cap-1, so the
    # top bound must leave one tile of the pre-padded tail unclaimed
    off = jnp.minimum(off, jnp.int32(sm_lo.shape[0] - cap))
    return stream_count(
        key_lo,
        key_hi,
        counts,
        sm_lo,
        sm_hi,
        off,
        max_probe,
        cap=cap,
        interpret=interpret,
        block_probe=block_probe,
        coarse=coarse,
        group=group,
        tail_padded=True,
    )


def stream_probe_count_mixed(
    key_lo,
    key_hi,
    counts,
    m_lo,
    m_hi,
    max_probe: int,
    cap: int = DEFAULT_CAP,
    interpret: bool = False,
    block_probe=None,
    coarse: int = 0,
    group: int = 0,
    seg_bounds: "tuple | None" = None,
    bucket_base=0,
    chain_block: int | None = None,
    n_buckets_global: int | None = None,
):
    """Stream path for PRE-MIXED, pre-padded, unsorted queries.

    ``(m_lo, m_hi)`` are feistel-mixed word pairs whose invalid entries are
    already the all-ones pattern and whose tail already carries >= 2*cap of
    invalid slack (``hashing.plane_hash_mixed`` emits exactly this) — the
    sort here is the same 2-operand ``lax.sort`` as ``sort_queries``, minus
    the mix/mask/pad it no longer needs.

    ``seg_bounds`` = static ((start, length), ...) SEGMENTS of the query
    array (``plane_hash_mixed(segments=S)`` emits them): each segment is
    sorted INDEPENDENTLY and the kernel serves all S sorted streams from one
    tile schedule. XLA's flat 2-operand sort has a per-element cliff past
    ~2^24 elements (r3/r4 sweeps: 1.55 ns at 13.4M vs ~2.2+ at 27M+), while
    the kernel's tile count per chunk is ~constant (>= 1 tile per chain block
    per round) — multi-stream tiles keep the sort at its sweet-spot rate AND
    the big-chunk tile amortization. Sharded tables pass ``bucket_base`` /
    ``chain_block`` / ``n_buckets_global`` as for ``stream_count``
    (plane-layout keys, plane-order counts)."""
    n_local = key_lo.shape[0] * key_lo.shape[2]
    n_total = n_buckets_global if n_buckets_global is not None else n_local
    bpb = min(CHAIN_BLOCK, n_local) if chain_block is None else chain_block
    if not seg_bounds:
        seg_bounds = ((0, m_lo.shape[0]),)
    sorted_lo, sorted_hi, offs = [], [], []
    for start, length in seg_bounds:
        s_lo, s_hi = lax.sort(
            (lax.slice(m_lo, (start,), (start + length,)),
             lax.slice(m_hi, (start,), (start + length,))),
            dimension=0, num_keys=1, is_stable=False,
        )
        sorted_lo.append(s_lo)
        sorted_hi.append(s_hi)
        off_s = block_offsets(
            s_lo, n_total, bpb, bucket_base=bucket_base, n_local=n_local
        )
        # the last tile window can overhang its block bound by up to cap-1,
        # so the top bound must leave one tile of the segment's pre-padded
        # tail unclaimed; positions are absolute into the concatenation
        offs.append(jnp.minimum(off_s, jnp.int32(length - cap)) + jnp.int32(start))
    sm_lo = sorted_lo[0] if len(sorted_lo) == 1 else jnp.concatenate(sorted_lo)
    sm_hi = sorted_hi[0] if len(sorted_hi) == 1 else jnp.concatenate(sorted_hi)
    off = offs[0] if len(offs) == 1 else jnp.stack(offs)
    return stream_count(
        key_lo,
        key_hi,
        counts,
        sm_lo,
        sm_hi,
        off,
        max_probe,
        cap=cap,
        interpret=interpret,
        block_probe=block_probe,
        coarse=coarse,
        group=group,
        bucket_base=bucket_base,
        chain_block=chain_block,
        n_buckets_global=n_buckets_global,
        tail_padded=True,
    )
