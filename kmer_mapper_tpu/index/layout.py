"""Device table layout: power-of-two, fixed-width-bucket open-addressing table.

This is the TPU-native replacement for both of the reference's probe structures:

* the CPU bucketed index scan (``kmer_mapper/mapper.pyx:53-69``), and
* the CUDA ``cucounter.Counter`` open-addressing table (``kmer_mapper/gpu_counter.py``).

Design rationale (TPU-first):

* **Unique-kmer factorization.** Like the reference GPU path, the device counts
  *unique* index kmers; per-entry node distribution (including the per-entry
  frequency filter) happens once at the end as a weighted bincount. The device
  hot loop therefore only needs a static set-membership + counter structure.
* **Power-of-two buckets.** Bucket id = ``mix64(kmer) & (n_buckets-1)`` — no
  64-bit modulo (TPU has no native int64; arbitrary-modulus reduction would cost
  a multi-word Barrett reduction per kmer).
* **8-wide buckets.** One probe gathers a contiguous (8, 2)-uint32 row = 64 bytes,
  a single HBM transaction. At load factor <= 0.4 nearly all queries finish in
  one gather; ``max_probe`` (measured at build) bounds the statically-unrolled
  probe loop.
* Keys are (lo, hi) uint32 word pairs; the empty sentinel is (0xFFFFFFFF,
  0xFFFFFFFF), unreachable for k <= 31 (hash < 2^62).

The builder is vectorized host numpy (no Python per-key loop): entries are
placed round by round; each round ranks pending keys within their target bucket
and spills overflow to the next bucket.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..ops.u32hash import bucket_of, split_u64

BUCKET_WIDTH = 8
EMPTY = np.uint32(0xFFFFFFFF)
DEFAULT_MAX_LOAD = 0.4


@dataclasses.dataclass
class TableArrays:
    """Host-side arrays of the open-addressing table (moved to device verbatim)."""

    key_lo: np.ndarray  # uint32[n_buckets, BUCKET_WIDTH]
    key_hi: np.ndarray  # uint32[n_buckets, BUCKET_WIDTH]
    n_buckets: int
    max_probe: int  # number of consecutive buckets a query must examine
    seed: int = 0

    @property
    def n_slots(self) -> int:
        return self.n_buckets * BUCKET_WIDTH

    @property
    def nbytes(self) -> int:
        return self.key_lo.nbytes + self.key_hi.nbytes


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


def build_table(
    unique_kmers: np.ndarray,
    max_load: float = DEFAULT_MAX_LOAD,
    seed: int = 0,
    n_buckets: int | None = None,
) -> TableArrays:
    """Build the table from distinct uint64 kmers. Vectorized; O(n log n)."""
    unique_kmers = np.asarray(unique_kmers, dtype=np.uint64)
    n = len(unique_kmers)
    if n_buckets is None:
        n_buckets = max(8, _next_pow2(int(np.ceil(n / (BUCKET_WIDTH * max_load))) or 1))
    assert n_buckets & (n_buckets - 1) == 0
    assert n <= n_buckets * BUCKET_WIDTH, "table too small"

    key_lo = np.full((n_buckets, BUCKET_WIDTH), EMPTY, dtype=np.uint32)
    key_hi = np.full((n_buckets, BUCKET_WIDTH), EMPTY, dtype=np.uint32)
    filled = np.zeros(n_buckets, dtype=np.int64)

    lo, hi = split_u64(unique_kmers)
    b = bucket_of(lo, hi, n_buckets, seed=seed).astype(np.int64)
    pending = np.arange(n, dtype=np.int64)
    probe_round = 0
    while len(pending):
        order = np.argsort(b[pending], kind="stable")
        p = pending[order]
        sb = b[p]
        first = np.searchsorted(sb, sb, side="left")
        rank = np.arange(len(p), dtype=np.int64) - first
        avail = BUCKET_WIDTH - filled[sb]
        place = rank < avail
        pb, pr = sb[place], rank[place]
        slot = filled[pb] + pr
        key_lo[pb, slot] = lo[p[place]]
        key_hi[pb, slot] = hi[p[place]]
        np.add.at(filled, pb, 1)
        pending = p[~place]
        if len(pending):
            b[pending] = (b[pending] + 1) & (n_buckets - 1)
            probe_round += 1
            assert probe_round < n_buckets, "table build failed to converge"
    return TableArrays(
        key_lo=key_lo, key_hi=key_hi, n_buckets=n_buckets, max_probe=probe_round + 1, seed=seed
    )


def query_table(table: TableArrays, kmers: np.ndarray) -> np.ndarray:
    """Host/oracle query: global slot id of each kmer, or -1 if absent.

    Bit-identical semantics to the device probe (``ops/probe.py``)."""
    kmers = np.asarray(kmers, dtype=np.uint64)
    lo, hi = split_u64(kmers)
    b = bucket_of(lo, hi, table.n_buckets, seed=table.seed).astype(np.int64)
    out = np.full(len(kmers), -1, dtype=np.int64)
    mask = table.n_buckets - 1
    for p in range(table.max_probe):
        rows = (b + p) & mask
        match = (table.key_lo[rows] == lo[:, None]) & (table.key_hi[rows] == hi[:, None])
        any_match = match.any(axis=1)
        lane = match.argmax(axis=1)
        out = np.where((out < 0) & any_match, rows * BUCKET_WIDTH + lane, out)
    return out
