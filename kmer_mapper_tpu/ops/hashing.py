"""Device-side rolling k-mer hashing and ragged window masking.

TPU has no native 64-bit integers, so each k-mer hash (up to 62 bits for
k<=31) is carried as a (lo, hi) uint32 word pair. The hash convention is the
reference's (first base least-significant; see ``oracle.kmer_hashes``):

    lo |= code[t+m] << 2m          for m < 16
    hi |= code[t+m] << (2m - 32)   for m >= 16

The k-term accumulation is expressed as k static shifted-slice ORs over the
whole chunk — fully vectorized VPU work that XLA fuses with the encode gather,
replacing both bionumpy's ``get_kmers`` rolling window (``util.py:71-75``) and
the cupy variant of the GPU path.

Window validity reproduces bionumpy's ragged behavior: a window starting at t
is valid iff no read starts strictly inside (t, t+k) and t+k <= n_valid_bases —
k-mers never cross read boundaries and short reads yield none.
"""
from __future__ import annotations

import jax.numpy as jnp


def rolling_kmer_hash(codes: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """codes: uint32[n + k] (chunk padded by >=k) -> (lo, hi) uint32[n] where
    entry t is the hash of window [t, t+k). Caller masks invalid windows."""
    assert 1 <= k <= 31, "k must be in [1, 31] (62-bit hashes)"
    n = codes.shape[0] - k
    lo = jnp.zeros(n, dtype=jnp.uint32)
    hi = jnp.zeros(n, dtype=jnp.uint32)
    for m in range(k):
        c = codes[m : m + n]
        if 2 * m < 32:
            lo = lo | (c << 2 * m)
        else:
            hi = hi | (c << (2 * m - 32))
    return lo, hi


def rolling_revcomp_hash(codes: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse-complement hash of each window: base t+k-1-m complemented (3-c)
    into bit position 2m. Matches ``oracle.revcomp_hash`` of the forward hash,
    fused into the same slice loop (GPU-path revcomp, ``gpu_counter.py:23-24``)."""
    assert 1 <= k <= 31
    n = codes.shape[0] - k
    lo = jnp.zeros(n, dtype=jnp.uint32)
    hi = jnp.zeros(n, dtype=jnp.uint32)
    for m in range(k):
        c = jnp.uint32(3) - codes[k - 1 - m : k - 1 - m + n]
        if 2 * m < 32:
            lo = lo | (c << 2 * m)
        else:
            hi = hi | (c << (2 * m - 32))
    return lo, hi


def window_mask(
    read_starts: jnp.ndarray, n_bases: jnp.ndarray, k: int, buf: int
) -> jnp.ndarray:
    """bool[buf]: window t covers [t, t+k) of one read entirely.

    ``read_starts``: int32[max_reads], start offsets into the chunk; padding
    entries must be >= buf + k (scattered with mode='drop').
    ``n_bases``: scalar int32, number of valid bases in the chunk."""
    starts_flag = (
        jnp.zeros(buf + k, dtype=jnp.int32).at[read_starts].set(1, mode="drop")
    )
    cum = jnp.cumsum(starts_flag)
    # no read start strictly inside (t, t+k): cum[t+k-1] == cum[t]
    same_read = cum[k - 1 : k - 1 + buf] == cum[:buf]
    t = jnp.arange(buf, dtype=jnp.int32)
    return same_read & (t + k <= n_bases)
