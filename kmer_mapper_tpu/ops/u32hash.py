"""32-bit hash mixing shared by the host-side table builder (numpy) and the
device-side probe (jax.numpy).

TPU has no native 64-bit integers, so the framework represents k-mers as
(lo, hi) uint32 word pairs everywhere on device. Bucket selection for the
open-addressing table needs a well-avalanched hash of the 64-bit kmer computed
from those two words using only 32-bit ops (xor/shift/wraparound-multiply),
which both numpy and XLA:TPU execute identically.

We use two rounds of the murmur3 32-bit finalizer (fmix32), chaining the high
word into the low word. This replaces the reference's ``kmer % modulo`` bucket
function (``kmer_mapper/mapper.pyx:54``) — the modulo was an artifact of the
reference's index layout; a power-of-two table with a strong mixer avoids
64-bit division entirely on TPU.
"""
from __future__ import annotations

import numpy as np

_C1 = 0x85EBCA6B
_C2 = 0xC2B2AE35
_GOLDEN = 0x9E3779B9


def fmix32(x, xp=np):
    """murmur3 finalizer; ``x`` must be a uint32 array of the given namespace."""
    u = xp.uint32
    x = x ^ (x >> u(16))
    x = x * u(_C1)
    x = x ^ (x >> u(13))
    x = x * u(_C2)
    x = x ^ (x >> u(16))
    return x


def mix64(lo, hi, seed: int = 0, xp=np):
    """Avalanche-mix a 64-bit value given as (lo, hi) uint32 words -> uint32."""
    u = xp.uint32
    h = fmix32(hi ^ u(np.uint32((_GOLDEN + seed) & 0xFFFFFFFF)), xp=xp)
    return fmix32(lo ^ h, xp=xp)


def bucket_of(lo, hi, n_buckets: int, seed: int = 0, xp=np):
    """Bucket id in [0, n_buckets); n_buckets must be a power of two."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"
    return mix64(lo, hi, seed=seed, xp=xp) & xp.uint32(n_buckets - 1)


def split_u64(kmers: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: uint64 kmers -> (lo, hi) uint32 word pair."""
    k = np.asarray(kmers, dtype=np.uint64)
    lo = (k & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (k >> np.uint64(32)).astype(np.uint32)
    return lo, hi


def join_u64(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Host-side: (lo, hi) uint32 word pair -> uint64."""
    return np.asarray(lo, dtype=np.uint64) | (np.asarray(hi, dtype=np.uint64) << np.uint64(32))
