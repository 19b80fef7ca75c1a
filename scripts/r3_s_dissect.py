"""Decompose the true per-chunk sort-stage cost S (~242 ms per 53.8M kmers at
the 64Mi production config — r3_true_window.py, D=8 CSE-free windows).

Variants chained over 8 DISTINCT chunks (sort/hash can't CSE):

  raw     rolling hash phases only (no interleave/stack, no slicing)
  hash    rolling hash from packed words + fixed-read_len slicing + valid
  sort    + 3-operand unstable lax.sort
  off     + block_offsets bisection                       (= r3_true nokernel)
  prep    + q row-stack + the flat (block, round, tile) schedule arrays
          (everything stream_count does before pallas_call)

full-window K from r3_true minus (prep - off) isolates the pallas kernel.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kmer_mapper_tpu import oracle
from kmer_mapper_tpu.index import kmer_index as ki
from kmer_mapper_tpu.io.readers import SequenceChunk, pack_for_device
from kmer_mapper_tpu.models.mapper import MapperConfig
from kmer_mapper_tpu.ops import hashing, stream_probe

import os

K, READ_LEN = 31, 151
BUF = int(os.environ.get("BUF_MI", "64")) << 20
STEPS = 8
CAP = int(os.environ.get("CAP", "8192"))
rng = np.random.default_rng(0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_read_chunk(n_bases):
    bases = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n_bases)
    n_reads = n_bases // READ_LEN
    return SequenceChunk(
        bases=bases[: n_reads * READ_LEN],
        read_starts=np.arange(n_reads, dtype=np.int64) * READ_LEN,
    )


def main():
    chunks = [make_read_chunk(BUF) for _ in range(STEPS)]
    sample = oracle.kmer_hashes(oracle.encode_bytes(chunks[0].bases[: READ_LEN * 5000]), K)
    entry = np.unique(np.concatenate([
        rng.integers(0, 1 << 62, 2_000_000, dtype=np.uint64),
        rng.choice(sample, 2_000_000),
    ]))
    index = ki.TpuKmerIndex.from_entries(
        entry, rng.integers(0, 3_000_000, len(entry)).astype(np.int32)
    )
    table = index.table
    bp = jnp.asarray(table.block_max_probe())
    max_rounds = int(np.asarray(table.block_max_probe()).max())
    config = MapperConfig(
        k=K, buf=BUF, max_reads=BUF // 64, probe="stream", read_len=READ_LEN
    )
    packed = [
        next(iter(pack_for_device(iter([c]), config.buf, config.max_reads, K)))
        for c in chunks
    ]
    resident = [
        (jax.device_put(p), jnp.int32(nb)) for p, ln, nb, _, _ in packed
    ]
    L, R, W = READ_LEN, BUF // READ_LEN, READ_LEN - K + 1
    n_blocks = table.n_buckets // 128

    def stage(variant, acc, packed_arr, n_bases):
        if variant in ("interleave", "phasemajor"):
            # isolate the minor-dim-16 stack/reshape relayout: same phase
            # compute, output either interleaved (the real hash's layout) or
            # phase-major concat (no relayout); XOR-reduced so nothing DCEs
            w0, w1, w2 = packed_arr[:-2], packed_arr[1:-1], packed_arr[2:]
            los, his = [], []
            for ph in range(16):
                sh = 2 * ph
                los.append((w0 >> sh) | (w1 << (32 - sh)) if sh else w0)
                his.append((w1 >> sh) | (w2 << (32 - sh)) if sh else w1)
            if variant == "interleave":
                lo = jnp.stack(los, axis=1).reshape(-1)
                hi = jnp.stack(his, axis=1).reshape(-1)
            else:
                lo = jnp.concatenate(los)
                hi = jnp.concatenate(his)
            red = jax.lax.reduce(
                lo ^ hi, jnp.uint32(0), jax.lax.bitwise_xor, (0,)
            )
            return acc + red
        lo, hi = hashing.rolling_kmer_hash_packed(packed_arr, K)
        lo = lo[: R * L].reshape(R, L)[:, :W].reshape(R * W)
        hi = hi[: R * L].reshape(R, L)[:, :W].reshape(R * W)
        n_reads = n_bases // jnp.int32(L)
        valid = (jax.lax.broadcasted_iota(jnp.int32, (R, W), 0) < n_reads).reshape(R * W)
        if variant == "hash":
            return acc + lo[0] + hi[-1] + valid[0].astype(jnp.uint32)
        sm_lo, sm_hi = stream_probe.sort_queries(lo, hi, valid, table.n_buckets, table.seed)
        if variant == "sort":
            return acc + sm_lo[0] + sm_hi[-1]
        off = stream_probe.block_offsets(sm_lo, table.n_buckets, 128)
        if variant == "off":
            return acc + sm_lo[0] + sm_hi[-1] + off[-1].astype(jnp.uint32)
        # prep: everything stream_count does before pallas_call
        n = sm_lo.shape[0]
        pad = (-n) % CAP + CAP
        sbp = jnp.concatenate([sm_lo, jnp.full(pad, stream_probe.INVALID_WORD)])
        ship = jnp.concatenate([sm_hi, jnp.full(pad, stream_probe.INVALID_WORD)])
        q = jnp.stack([sbp, ship, ship, ship])
        t_pad = max_rounds * ((n + pad) // CAP + n_blocks)
        g_starts, g_ends = off[:-1], off[1:]
        bases_ = g_starts & ~jnp.int32(127)
        n_tiles_g = jnp.where(
            g_ends > g_starts, (g_ends - bases_ + jnp.int32(CAP - 1)) // CAP, 0
        )
        rounds = jnp.clip(bp, 1, max_rounds)
        csum = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(n_tiles_g * rounds, dtype=jnp.int32)]
        )
        t_grp = jnp.cumsum(jnp.zeros(t_pad, jnp.int32).at[csum[1:]].add(1, mode="drop"))
        safe = jnp.minimum(t_grp, n_blocks - 1)
        r = jnp.arange(t_pad, dtype=jnp.int32) - csum[jnp.minimum(t_grp, n_blocks)]
        nt = jnp.maximum(n_tiles_g[safe], 1)
        p = jnp.minimum(r // nt, max_rounds - 1)
        t_off = bases_[safe] + (r - p * nt) * jnp.int32(CAP)
        return (
            acc + q[0, 0] + q[3, -1] + t_off[-1].astype(jnp.uint32)
            + csum[-1].astype(jnp.uint32)
        )

    f_rtt = jax.jit(lambda x: x[0] + jnp.uint32(1))
    z = jnp.zeros(4, jnp.uint32)
    _ = int(jax.device_get(f_rtt(z)))
    rtt = 1e9
    for _ in range(5):
        t = time.perf_counter()
        _ = int(jax.device_get(f_rtt(z)))
        rtt = min(rtt, time.perf_counter() - t)
    log(f"rtt {rtt * 1e3:.1f} ms")

    prev = 0.0
    for variant in ("phasemajor", "interleave", "hash", "sort", "off", "prep"):
        def window(resident, _v=variant):
            acc = jnp.uint32(0)
            for i in range(STEPS):
                p, nb = resident[i]
                acc = stage(_v, acc, p, nb)
            return acc

        f = jax.jit(window)
        t = time.perf_counter()
        _ = int(jax.device_get(f(resident)))
        log(f"{variant:5s} compile+first {time.perf_counter() - t:.1f}s")
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            _ = int(jax.device_get(f(resident)))
            best = min(best, time.perf_counter() - t - rtt)
        per = best / STEPS * 1e3
        log(f"{variant:5s} {per:7.1f} ms/chunk  (+{per - prev:6.1f} ms)")
        prev = per


if __name__ == "__main__":
    main()
