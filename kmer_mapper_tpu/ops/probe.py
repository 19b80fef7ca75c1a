"""Device-side gather probe and count accumulation (XLA path).

TPU-native equivalent of the reference's hot kernels (Cython bucket scan,
``kmer_mapper/mapper.pyx:53-69``; CUDA ``cucounter`` atomic counter,
``kmer_mapper/gpu_counter.py:23-24``), probing the block-chained layout of
``index/layout.py`` with per-round row gathers. This is the fallback path —
CPU execution, the sharded step, and pre-hashed queries; the default TPU path
is the sort+stream MXU kernel in ``ops/stream_probe.py``.

Counting: TPU exposes no atomics at the XLA level; instead of cucounter's
``atomicAdd`` the accumulator is a scatter-add (``scatter`` duplicate-index
variant, or ``sorted`` sort+RLE+unique-scatter), selected per measured
throughput. The stream path needs neither — its counts are accumulated inside
the kernel's VMEM tiles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..index.layout import BUCKET_KEYS, CHAIN_BLOCK
from .u32hash import bucket_shift, feistel_mix


def chain_next(b: jnp.ndarray, step: int, n_buckets: int) -> jnp.ndarray:
    """jnp twin of ``layout.chain_next`` (wrap inside aligned chain blocks)."""
    block = min(CHAIN_BLOCK, n_buckets)
    return (b & ~jnp.int32(block - 1)) | ((b + step) & jnp.int32(block - 1))


def probe_hits(
    key_lo: jnp.ndarray,  # uint32[n_local_buckets, BUCKET_KEYS]
    key_hi: jnp.ndarray,
    q_lo: jnp.ndarray,  # uint32[n]
    q_hi: jnp.ndarray,
    max_probe: int,
    seed: int,
    n_buckets_global: int | None = None,
    row_offset=0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(bucket int32[n] local bucket id or 0, mask uint32[n, BUCKET_KEYS]).

    ``mask`` is the per-lane one-hot hit indicator (all-zero for misses or for
    queries owned by another shard). Single-device: the table arrays hold all
    buckets. Sharded: the shard owns buckets [row_offset, row_offset +
    n_local); bucket ids are computed against the global bucket count and
    out-of-range rows are masked. Chains wrap inside CHAIN_BLOCK-aligned
    blocks, so with block-aligned shards a chain never crosses shards and no
    key can be double-counted."""
    n_local = key_lo.shape[0]
    if n_buckets_global is None:
        n_buckets_global = n_local
    m_lo, m_hi = feistel_mix(q_lo, q_hi, seed=seed, xp=jnp)
    # the table stores mixed words; a query mixing to the EMPTY sentinel can
    # only "match" empty slots (the build reseeds away real collisions)
    real = ~((m_lo == jnp.uint32(0xFFFFFFFF)) & (m_hi == jnp.uint32(0xFFFFFFFF)))
    shift = bucket_shift(n_buckets_global)
    b0 = (m_lo >> jnp.uint32(shift)).astype(jnp.int32) if shift < 32 else (
        jnp.zeros(m_lo.shape, jnp.int32)
    )
    bucket = jnp.zeros(q_lo.shape, dtype=jnp.int32)
    mask = jnp.zeros((q_lo.shape[0], BUCKET_KEYS), dtype=bool)
    for p in range(max_probe):
        b_g = chain_next(b0, p, n_buckets_global)
        b_l = b_g - row_offset
        in_range = (b_l >= 0) & (b_l < n_local) & real
        b_safe = jnp.where(in_range, b_l, 0)
        kl = key_lo[b_safe]  # (n, BUCKET_KEYS) row gather
        kh = key_hi[b_safe]
        m = (kl == m_lo[:, None]) & (kh == m_hi[:, None]) & in_range[:, None]
        hit = m.any(axis=1)
        # keys are unique in the table: at most one (bucket, lane) matches
        bucket = jnp.where(hit, b_safe, bucket)
        mask = mask | m
    return bucket, mask.astype(jnp.uint32)


def probe_slots(
    key_lo: jnp.ndarray,
    key_hi: jnp.ndarray,
    q_lo: jnp.ndarray,
    q_hi: jnp.ndarray,
    max_probe: int,
    seed: int,
    n_buckets_global: int | None = None,
    row_offset=0,
) -> jnp.ndarray:
    """Local table slot (bucket * BUCKET_KEYS + lane) per query, or -1."""
    bucket, mask = probe_hits(
        key_lo, key_hi, q_lo, q_hi, max_probe, seed, n_buckets_global, row_offset
    )
    any_hit = mask.any(axis=1)
    lane = jnp.argmax(mask, axis=1).astype(jnp.int32)
    return jnp.where(any_hit, bucket * BUCKET_KEYS + lane, -1)


# --- count accumulation ------------------------------------------------------
# counts are uint32[n_slots] flat. Default indexing is slot order (slot =
# bucket * BUCKET_KEYS + lane); ``plane_gpb > 0`` scatters into the
# group-blocked plane order ((g*K + lane)*gpb + bucket_in_group) that
# stream-probe mappers keep their device counts in (see
# stream_probe.plane_keys) — same histogram, different flat address.


def _hit_index(counts, bucket, mask, valid, plane_gpb):
    n_slots = counts.shape[0]
    any_hit = mask.any(axis=1) & valid
    lane = jnp.argmax(mask, axis=1).astype(jnp.int32)
    if plane_gpb:
        gpb = jnp.int32(min(plane_gpb, n_slots // BUCKET_KEYS))
        idx = ((bucket // gpb) * BUCKET_KEYS + lane) * gpb + bucket % gpb
    else:
        idx = bucket * BUCKET_KEYS + lane
    return jnp.where(any_hit, idx, n_slots)


def accumulate_scatter(counts, bucket, mask, valid, plane_gpb: int = 0):
    """Element scatter-add with duplicate indices."""
    idx = _hit_index(counts, bucket, mask, valid, plane_gpb)
    return counts.at[idx].add(jnp.uint32(1), mode="drop")


def accumulate_sorted(counts, bucket, mask, valid, plane_gpb: int = 0):
    """Sort + run-length-encode + unique-index scatter."""
    n_slots = counts.shape[0]
    idx = _hit_index(counts, bucket, mask, valid, plane_gpb)
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


ACCUMULATORS = {"scatter": accumulate_scatter, "sorted": accumulate_sorted}
