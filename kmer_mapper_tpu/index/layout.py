"""Device table layout: 2-choice bucketized cuckoo hash table.

This is the TPU-native replacement for both of the reference's probe
structures — the CPU bucketed index scan (``kmer_mapper/mapper.pyx:53-69``)
and the CUDA ``cucounter.Counter`` open-addressing table
(``kmer_mapper/gpu_counter.py``).

Why this exact shape (measured on TPU v5e, see ``scripts/profile_gather.py``):
XLA:TPU gathers cost ~6 ns per *row* for rows up to 8 x uint32 — element
gathers are no cheaper than an 8-wide row, and 16-wide rows fall off a cliff.
The table is therefore an array of **(n_buckets, 8) uint32 rows**, each row
holding four complete keys as (lo x 4, hi x 4) word halves, so one gather
fetches four candidate keys. Two hash choices (bucketized cuckoo) bound every
probe to **exactly two row gathers** — no overflow chains, no data-dependent
control flow — while supporting load factors far beyond linear probing.

* Keys are (lo, hi) uint32 pairs of the 62-bit kmer hash (TPU has no native
  int64); the empty sentinel (0xFFFFFFFF, 0xFFFFFFFF) is unreachable for
  k <= 31.
* Bucket ids come from two murmur-mixed hashes over a power-of-two bucket
  count — no 64-bit modulo anywhere (the reference's ``% modulo`` was an
  artifact of its layout).
* Build is vectorized host numpy: place-all rounds with per-bucket ranking,
  choice flipping, then one-eviction-per-bucket random-walk kicks; the table
  grows and reseeds on (astronomically rare) non-convergence.
"""
from __future__ import annotations

import dataclasses
import logging

import numpy as np

from ..ops.u32hash import bucket_of, split_u64

logger = logging.getLogger(__name__)

BUCKET_KEYS = 4  # keys per bucket; a row is BUCKET_KEYS los + BUCKET_KEYS his
ROW_WIDTH = 2 * BUCKET_KEYS
EMPTY = np.uint32(0xFFFFFFFF)
DEFAULT_MAX_LOAD = 0.65
SEED1, SEED2 = 0x51ED2700, 0xC0FFEE42
_MAX_ROUNDS = 400


@dataclasses.dataclass
class TableArrays:
    """Host-side table array (moved to device verbatim)."""

    rows: np.ndarray  # uint32[n_buckets, ROW_WIDTH] = [lo*4 | hi*4]
    n_buckets: int
    seed1: int = SEED1
    seed2: int = SEED2

    @property
    def n_slots(self) -> int:
        return self.n_buckets * BUCKET_KEYS

    @property
    def nbytes(self) -> int:
        return self.rows.nbytes

    # kept for oracle/debug use
    def key_words(self) -> tuple[np.ndarray, np.ndarray]:
        """(lo, hi) uint32[n_slots] in slot order (bucket-major)."""
        lo = self.rows[:, :BUCKET_KEYS].reshape(-1)
        hi = self.rows[:, BUCKET_KEYS:].reshape(-1)
        return lo, hi


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


def build_table(
    unique_kmers: np.ndarray,
    max_load: float = DEFAULT_MAX_LOAD,
    n_buckets: int | None = None,
) -> TableArrays:
    """Build the cuckoo table from distinct uint64 kmers."""
    unique_kmers = np.asarray(unique_kmers, dtype=np.uint64)
    n = len(unique_kmers)
    if n_buckets is None:
        n_buckets = max(4, _next_pow2(int(np.ceil(n / (BUCKET_KEYS * max_load))) or 1))
    seed1, seed2 = SEED1, SEED2
    for attempt in range(4):
        table = _try_build(unique_kmers, n_buckets, seed1, seed2)
        if table is not None:
            if attempt:
                logger.info("cuckoo build converged after %d growth attempts", attempt)
            return table
        n_buckets *= 2
        seed1 += 17
        seed2 += 29
    raise RuntimeError("cuckoo table build failed to converge")


def _try_build(keys: np.ndarray, n_buckets: int, seed1: int, seed2: int):
    n = len(keys)
    if n > n_buckets * BUCKET_KEYS:
        return None
    lo, hi = split_u64(keys)
    b1 = bucket_of(lo, hi, n_buckets, seed=seed1).astype(np.int64)
    b2 = bucket_of(lo, hi, n_buckets, seed=seed2).astype(np.int64)

    slot_lo = np.full((n_buckets, BUCKET_KEYS), EMPTY, dtype=np.uint32)
    slot_hi = np.full((n_buckets, BUCKET_KEYS), EMPTY, dtype=np.uint32)
    slot_key = np.full((n_buckets, BUCKET_KEYS), -1, dtype=np.int64)  # key index
    filled = np.zeros(n_buckets, dtype=np.int64)

    pending = np.arange(n, dtype=np.int64)
    choice = np.zeros(n, dtype=np.int8)
    for rnd in range(_MAX_ROUNDS):
        if len(pending) == 0:
            rows = np.concatenate([slot_lo, slot_hi], axis=1)
            return TableArrays(rows=rows, n_buckets=n_buckets, seed1=seed1, seed2=seed2)
        b = np.where(choice[pending] == 0, b1[pending], b2[pending])
        order = np.argsort(b, kind="stable")
        p = pending[order]
        sb = b[order]
        first = np.searchsorted(sb, sb, side="left")
        rank = np.arange(len(p), dtype=np.int64) - first
        avail = BUCKET_KEYS - filled[sb]
        place = rank < avail
        pb, pr = sb[place], (filled[sb] + rank)[place]
        slot_lo[pb, pr] = lo[p[place]]
        slot_hi[pb, pr] = hi[p[place]]
        slot_key[pb, pr] = p[place]
        np.add.at(filled, pb, 1)
        rest = p[~place]
        rest_b = sb[~place]
        rest_rank = rank[~place] - avail[~place]  # 0 = first overflow in bucket
        if rnd < 2:
            # try the other choice before evicting
            choice[rest] ^= 1
            pending = rest
            continue
        # evict: one kick per bucket per round (rest_rank == 0)
        kick = rest_rank == 0
        kb = rest_b[kick]
        lane = rnd % BUCKET_KEYS
        victim = slot_key[kb, lane]
        # victim goes to its other bucket
        victim_other = np.where(b1[victim] == kb, 1, 0).astype(np.int8)
        choice[victim] = victim_other
        inserter = rest[kick]
        slot_lo[kb, lane] = lo[inserter]
        slot_hi[kb, lane] = hi[inserter]
        slot_key[kb, lane] = inserter
        # inserter stays at the bucket it displaced into (already placed)
        choice[rest[~kick]] ^= 1  # others retry their alternate bucket
        pending = np.concatenate([victim, rest[~kick]])
    return None


def query_table(table: TableArrays, kmers: np.ndarray) -> np.ndarray:
    """Host/oracle query: global slot id (bucket * BUCKET_KEYS + lane) of each
    kmer, or -1 if absent. Bit-identical semantics to the device probe."""
    kmers = np.asarray(kmers, dtype=np.uint64)
    lo, hi = split_u64(kmers)
    out = np.full(len(kmers), -1, dtype=np.int64)
    for seed in (table.seed1, table.seed2):
        b = bucket_of(lo, hi, table.n_buckets, seed=seed).astype(np.int64)
        rows = table.rows[b]
        match = (rows[:, :BUCKET_KEYS] == lo[:, None]) & (
            rows[:, BUCKET_KEYS:] == hi[:, None]
        )
        any_match = match.any(axis=1)
        lane = match.argmax(axis=1)
        out = np.where((out < 0) & any_match, b * BUCKET_KEYS + lane, out)
    return out
