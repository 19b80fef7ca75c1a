"""Plane-major fixed-read-length hashing: kill the lane-misaligned window
slice (r3_s_dissect at 16Mi: hash+slice costs 4.7 ms/chunk of which ~3.9 ms
is the (R, 151)[:, :121] relayout; the 16-phase interleave itself is 0.4 ms).

Idea: pad each read to STRIDE = 160 bases (10 u32 words) at framing time, so
the packed chunk is (R, 10) words and every valid window s = 16*j + p of a
read touches only that read's words j, j+1, j+2 (2s+61 <= 2*120+61 < 320).
Then the 121 valid windows per read are 121 (p, j) combos, each a contiguous
shift/OR over whole word-plane columns — no interleave, no misaligned slice,
and the feistel mix + validity sentinel fuse in. Output order is a fixed
permutation of the old order, which the sort erases.

Variants (8 distinct chunks, chained in one jit, best-of-3 windows):
  old_sort    production rolling hash + slice + sort_queries   (reference)
  plane_sortT strided pack -> (10, R) transpose -> 121 combos -> mix -> sort
  plane_sortS same but word columns as (R, 10)[:, j] slices (no transpose)

Run: python scripts/r4_plane_hash.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kmer_mapper_tpu.io.readers import SequenceChunk, pack_for_device
from kmer_mapper_tpu.ops import hashing, stream_probe
from kmer_mapper_tpu.ops.u32hash import feistel_mix

K, READ_LEN = 31, 151
STRIDE = 160  # ceil(151/16)*16
BUF = int(os.environ.get("BUF_MI", "16")) << 20
STEPS = 8
CAP = int(os.environ.get("CAP", "1792"))
SEED = 1234
N_BUCKETS = 1 << 20
rng = np.random.default_rng(0)

INVALID = stream_probe.INVALID_WORD


def log(m):
    print(m, file=sys.stderr, flush=True)


def pack_strided(code_rows: np.ndarray) -> np.ndarray:
    """(R, STRIDE) 2-bit codes -> (R*STRIDE//16,) uint32, first base LSB."""
    R = code_rows.shape[0]
    w = code_rows.reshape(R, STRIDE // 16, 16).astype(np.uint32)
    word = np.zeros((R, STRIDE // 16), np.uint32)
    for b in range(16):
        word |= w[:, :, b] << np.uint32(2 * b)
    return word.reshape(-1)


def plane_hash(words2d_cols, n_reads, R):
    """words2d_cols: list of 10 (R,) uint32 planes. Returns mixed, padded,
    sort-ready (m_lo, m_hi)."""
    lo_mask = jnp.uint32(0xFFFFFFFF)
    hi_mask = jnp.uint32((1 << (2 * K - 32)) - 1)
    valid_row = lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape(R) < n_reads
    mlos, mhis = [], []
    for p in range(16):
        s2 = 2 * p
        for j in range(10):
            if 16 * j + p > READ_LEN - K:
                continue
            w0, w1, w2 = (words2d_cols[j], words2d_cols[j + 1],
                          words2d_cols[j + 2] if j + 2 < 10 else None)
            if s2:
                lo = (w0 >> s2) | (w1 << (32 - s2))
                hi = ((w1 >> s2) | (w2 << (32 - s2))) & hi_mask
            else:
                lo = w0
                hi = w1 & hi_mask
            m_lo, m_hi = feistel_mix(lo & lo_mask, hi, seed=SEED, xp=jnp)
            mlos.append(jnp.where(valid_row, m_lo, INVALID))
            mhis.append(jnp.where(valid_row, m_hi, INVALID))
    m_lo = jnp.concatenate(mlos)
    m_hi = jnp.concatenate(mhis)
    n = m_lo.shape[0]
    pad = (-n) % CAP + 2 * CAP
    m_lo = jnp.concatenate([m_lo, jnp.full(pad, INVALID, jnp.uint32)])
    m_hi = jnp.concatenate([m_hi, jnp.full(pad, INVALID, jnp.uint32)])
    return m_lo, m_hi


def main():
    R_old = BUF // READ_LEN
    R_new = BUF // STRIDE
    n_reads_real = int(R_new * 0.97)

    # old-path chunks (continuous 151-stride packing via the real framer)
    old_chunks = []
    for _ in range(STEPS):
        bases = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), BUF)
        n_r = BUF // READ_LEN
        old_chunks.append(SequenceChunk(
            bases=bases[: n_r * READ_LEN],
            read_starts=np.arange(n_r, dtype=np.int64) * READ_LEN,
        ))
    from kmer_mapper_tpu.models.mapper import MapperConfig
    config = MapperConfig(k=K, buf=BUF, max_reads=BUF // 64, probe="stream",
                          read_len=READ_LEN)
    old_packed = [
        next(iter(pack_for_device(iter([c]), config.buf, config.max_reads, K)))
        for c in old_chunks
    ]
    old_res = [(jax.device_put(p), jnp.int32(nb)) for p, ln, nb, _, _ in old_packed]

    # strided chunks
    new_res = []
    for _ in range(STEPS):
        codes = rng.integers(0, 4, (R_new, STRIDE), dtype=np.uint8)
        codes[:, READ_LEN:] = 0
        new_res.append((jax.device_put(jnp.asarray(pack_strided(codes))),
                        jnp.int32(n_reads_real)))

    L, R, W = READ_LEN, BUF // READ_LEN, READ_LEN - K + 1

    def old_sort(acc, packed_arr, n_bases):
        lo, hi = hashing.rolling_kmer_hash_packed(packed_arr, K)
        lo = lo[: R * L].reshape(R, L)[:, :W].reshape(R * W)
        hi = hi[: R * L].reshape(R, L)[:, :W].reshape(R * W)
        n_r = n_bases // jnp.int32(L)
        valid = (lax.broadcasted_iota(jnp.int32, (R, W), 0) < n_r).reshape(R * W)
        sm_lo, sm_hi = stream_probe.sort_queries(
            lo, hi, valid, N_BUCKETS, SEED, pad_to=CAP)
        return acc + sm_lo[0] + sm_hi[-1]

    def plane_sort_T(acc, packed_arr, n_reads):
        w2d = packed_arr.reshape(R_new, 10).T  # (10, R) planes
        cols = [w2d[j] for j in range(10)]
        m_lo, m_hi = plane_hash(cols, n_reads, R_new)
        sm_lo, sm_hi = lax.sort((m_lo, m_hi), dimension=0, num_keys=1,
                                is_stable=False)
        return acc + sm_lo[0] + sm_hi[-1]

    def plane_sort_S(acc, packed_arr, n_reads):
        w2d = packed_arr.reshape(R_new, 10)
        cols = [w2d[:, j] for j in range(10)]
        m_lo, m_hi = plane_hash(cols, n_reads, R_new)
        sm_lo, sm_hi = lax.sort((m_lo, m_hi), dimension=0, num_keys=1,
                                is_stable=False)
        return acc + sm_lo[0] + sm_hi[-1]

    def plane_hash_only(acc, packed_arr, n_reads):
        w2d = packed_arr.reshape(R_new, 10).T
        cols = [w2d[j] for j in range(10)]
        m_lo, m_hi = plane_hash(cols, n_reads, R_new)
        red = lax.reduce(m_lo ^ m_hi, jnp.uint32(0), lax.bitwise_xor, (0,))
        return acc + red

    f_rtt = jax.jit(lambda x: x[0] + jnp.uint32(1))
    z = jnp.zeros(4, jnp.uint32)
    _ = int(jax.device_get(f_rtt(z)))
    rtt = 1e9
    for _ in range(5):
        t = time.perf_counter()
        _ = int(jax.device_get(f_rtt(z)))
        rtt = min(rtt, time.perf_counter() - t)
    log(f"rtt {rtt * 1e3:.1f} ms")
    log(f"old: {R} reads x {W} = {R * W / 1e6:.2f}M kmers/chunk; "
        f"new: {n_reads_real} x {W} = {n_reads_real * W / 1e6:.2f}M")

    for name, fn, res, kmers in (
        ("old_sort", old_sort, old_res, R * W),
        ("plane_sortT", plane_sort_T, new_res, n_reads_real * W),
        ("plane_sortS", plane_sort_S, new_res, n_reads_real * W),
        ("plane_hash", plane_hash_only, new_res, n_reads_real * W),
    ):
        def window(res, _f=fn):
            acc = jnp.uint32(0)
            for i in range(STEPS):
                a, b = res[i]
                acc = _f(acc, a, b)
            return acc

        f = jax.jit(window)
        t = time.perf_counter()
        _ = int(jax.device_get(f(res)))
        log(f"{name:12s} compile+first {time.perf_counter() - t:.1f}s")
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            _ = int(jax.device_get(f(res)))
            best = min(best, time.perf_counter() - t - rtt)
        per = best / STEPS * 1e3
        log(f"{name:12s} {per:7.2f} ms/chunk   {per * 1e6 / kmers:.3f} ns/kmer")


if __name__ == "__main__":
    main()
