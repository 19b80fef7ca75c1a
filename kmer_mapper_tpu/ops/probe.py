"""Device-side table probe and count accumulation.

This is the TPU-native equivalent of both hot kernels of the reference:

* the Cython bucket-scan probe (``kmer_mapper/mapper.pyx:53-69``), and
* the CUDA ``cucounter`` atomic counter (``kmer_mapper/gpu_counter.py:23-24``).

Probe: each query's bucket row — a contiguous (8, 2)-uint32 strip, one 64 B HBM
transaction — is gathered and compared against the query words; ``max_probe``
(a small build-time constant, usually 1-2) bounds the statically-unrolled
overflow chain. No data-dependent control flow: absent keys simply never match.

Counting: TPU has no atomics exposed at the XLA level; instead of cucounter's
``atomicAdd`` we either (a) scatter-add with duplicate indices (XLA lowers this
to a sorted combine on TPU) or (b) explicitly sort + run-length-encode + scatter
with unique indices. Both are provided; the pipeline selects per measured
throughput on the target chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..index.layout import BUCKET_WIDTH
from .u32hash import bucket_of


def probe_slots(
    key_lo: jnp.ndarray,  # uint32[n_buckets, BUCKET_WIDTH]
    key_hi: jnp.ndarray,
    q_lo: jnp.ndarray,  # uint32[n]
    q_hi: jnp.ndarray,
    max_probe: int,
    seed: int = 0,
) -> jnp.ndarray:
    """Global table slot of each query kmer, or -1 if absent. int32[n]."""
    n_buckets = key_lo.shape[0]
    b0 = bucket_of(q_lo, q_hi, n_buckets, seed=seed, xp=jnp)
    slot = jnp.full(q_lo.shape, -1, dtype=jnp.int32)
    for p in range(max_probe):
        rows = ((b0 + jnp.uint32(p)) & jnp.uint32(n_buckets - 1)).astype(jnp.int32)
        kl = key_lo[rows]  # (n, BUCKET_WIDTH) row gather
        kh = key_hi[rows]
        m = (kl == q_lo[:, None]) & (kh == q_hi[:, None])
        any_match = m.any(axis=1)
        lane = jnp.argmax(m, axis=1).astype(jnp.int32)
        cand = rows * BUCKET_WIDTH + lane
        slot = jnp.where((slot < 0) & any_match, cand, slot)
    return slot


def accumulate_scatter(counts: jnp.ndarray, slots: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """counts[n_slots] += histogram(slots[valid]) via duplicate-index scatter-add."""
    n_slots = counts.shape[0]
    idx = jnp.where(valid & (slots >= 0), slots, n_slots)  # out-of-range -> dropped
    return counts.at[idx].add(jnp.uint32(1), mode="drop")


def accumulate_sorted(counts: jnp.ndarray, slots: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Sort + run-length-encode, then scatter each distinct slot once."""
    n_slots = counts.shape[0]
    n = slots.shape[0]
    idx = jnp.where(valid & (slots >= 0), slots, n_slots)
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
