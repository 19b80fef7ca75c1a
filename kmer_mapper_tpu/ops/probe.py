"""Device-side cuckoo-table probe and count accumulation.

TPU-native equivalent of both hot kernels of the reference: the Cython bucket
scan (``kmer_mapper/mapper.pyx:53-69``) and the CUDA ``cucounter`` atomic
counter (``kmer_mapper/gpu_counter.py:23-24``).

Probe: exactly two (n, 8)-uint32 row gathers per query — the measured optimum
on v5e (see ``index/layout.py``). Each row holds 4 candidate keys as word
halves; matching is pure VPU compares. No data-dependent control flow: absent
keys simply never match.

Counting: TPU exposes no atomics at the XLA level; instead of cucounter's
``atomicAdd`` the accumulator is a scatter-add. Three strategies (selected per
measured throughput on the target chip):
  * ``scatter`` — element scatter-add with duplicate indices;
  * ``sorted``  — sort + run-length-encode + unique-index scatter;
  * ``rowscatter`` — scatter whole 4-wide one-hot bucket rows (counts laid out
    (n_buckets, BUCKET_KEYS)), riding the same fast row path as gathers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..index.layout import BUCKET_KEYS
from .u32hash import bucket_of


def _match_rows(rows, q_lo, q_hi):
    """rows (n, 2*BUCKET_KEYS) vs queries -> bool mask (n, BUCKET_KEYS)."""
    return (rows[:, :BUCKET_KEYS] == q_lo[:, None]) & (
        rows[:, BUCKET_KEYS:] == q_hi[:, None]
    )


def probe_hits(
    rows_ref: jnp.ndarray,  # uint32[n_local_buckets, 2*BUCKET_KEYS]
    q_lo: jnp.ndarray,  # uint32[n]
    q_hi: jnp.ndarray,
    seed1: int,
    seed2: int,
    n_buckets_global: int | None = None,
    row_offset=0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(bucket int32[n] local bucket id or 0, mask uint32[n, BUCKET_KEYS]).

    ``mask`` is the per-lane one-hot hit indicator (all-zero for misses or for
    queries owned by another shard). Single-device: table holds all buckets.
    Sharded: the shard owns buckets [row_offset, row_offset + n_local); bucket
    ids are computed against the global bucket count and out-of-range rows are
    masked (a key lives in exactly one shard's row, so counts never double)."""
    n_local = rows_ref.shape[0]
    if n_buckets_global is None:
        n_buckets_global = n_local
    bucket = jnp.zeros(q_lo.shape, dtype=jnp.int32)
    mask = jnp.zeros((q_lo.shape[0], BUCKET_KEYS), dtype=bool)
    found = jnp.zeros(q_lo.shape, dtype=bool)
    for seed in (seed1, seed2):
        b_g = bucket_of(q_lo, q_hi, n_buckets_global, seed=seed, xp=jnp).astype(jnp.int32)
        b_l = b_g - row_offset
        in_range = (b_l >= 0) & (b_l < n_local)
        b_safe = jnp.where(in_range, b_l, 0)
        rows = rows_ref[b_safe]
        m = _match_rows(rows, q_lo, q_hi) & in_range[:, None]
        hit = m.any(axis=1)
        take = hit & ~found
        bucket = jnp.where(take, b_safe, bucket)
        mask = jnp.where(take[:, None], m, mask)
        found = found | hit
    return bucket, mask.astype(jnp.uint32)


def probe_slots(
    rows_ref: jnp.ndarray,
    q_lo: jnp.ndarray,
    q_hi: jnp.ndarray,
    seed1: int,
    seed2: int,
    n_buckets_global: int | None = None,
    row_offset=0,
) -> jnp.ndarray:
    """Local table slot (bucket * BUCKET_KEYS + lane) per query, or -1."""
    bucket, mask = probe_hits(
        rows_ref, q_lo, q_hi, seed1, seed2, n_buckets_global, row_offset
    )
    any_hit = mask.any(axis=1)
    lane = jnp.argmax(mask, axis=1).astype(jnp.int32)
    return jnp.where(any_hit, bucket * BUCKET_KEYS + lane, -1)


# --- count accumulation ------------------------------------------------------
# counts are uint32[n_slots] (flat, slot = bucket * BUCKET_KEYS + lane)


def accumulate_scatter(counts, bucket, mask, valid):
    """Element scatter-add with duplicate indices."""
    n_slots = counts.shape[0]
    any_hit = mask.any(axis=1) & valid
    lane = jnp.argmax(mask, axis=1).astype(jnp.int32)
    idx = jnp.where(any_hit, bucket * BUCKET_KEYS + lane, n_slots)
    return counts.at[idx].add(jnp.uint32(1), mode="drop")


def accumulate_sorted(counts, bucket, mask, valid):
    """Sort + run-length-encode + unique-index scatter."""
    n_slots = counts.shape[0]
    any_hit = mask.any(axis=1) & valid
    lane = jnp.argmax(mask, axis=1).astype(jnp.int32)
    idx = jnp.where(any_hit, bucket * BUCKET_KEYS + lane, n_slots)
    n = idx.shape[0]
    s = jnp.sort(idx)
    first = jnp.concatenate([jnp.ones(1, dtype=bool), s[1:] != s[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    run_len = jax.ops.segment_sum(
        jnp.ones(n, dtype=jnp.uint32), seg, num_segments=n, indices_are_sorted=True
    )
    len_here = run_len[seg]
    target = jnp.where(first & (s < n_slots), s, n_slots)
    return counts.at[target].add(jnp.where(first, len_here, 0), mode="drop")


def accumulate_rowscatter(counts, bucket, mask, valid):
    """Scatter whole one-hot bucket rows: same fast row path as gathers."""
    n_slots = counts.shape[0]
    rows2d = counts.reshape(-1, BUCKET_KEYS)
    updates = mask * valid[:, None].astype(jnp.uint32)
    # misses scatter a zero row into bucket 0 (harmless)
    out = rows2d.at[bucket].add(updates, mode="drop")
    return out.reshape(n_slots)


ACCUMULATORS = {
    "scatter": accumulate_scatter,
    "sorted": accumulate_sorted,
    "rowscatter": accumulate_rowscatter,
}
