"""Production-config stage budget at the word-plane 32 Mi default.

Cumulative CSE-free stages (8 distinct chunks chained in one jit, best-of-3):

  hash   plane_hash_mixed (word-plane combos + mix + sentinel + tail pad)
  sort   + the 2-operand lax.sort
  off    + block-offset interpolation bisection
  prep   + everything stream_count builds before pallas_call (q row-stack +
           flat (block, round, tile) schedule arrays)

The full-window rate from bench.py minus `prep` isolates the Pallas kernel.

Run: BUF_MI=32 python scripts/r4_budget.py
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

from kmer_mapper_tpu import oracle
from kmer_mapper_tpu.index import kmer_index as ki
from kmer_mapper_tpu.io.readers import SequenceChunk, pack_for_device
from kmer_mapper_tpu.models.mapper import MapperConfig, auto_stream_cap
from kmer_mapper_tpu.ops import hashing, stream_probe

K, READ_LEN = 31, 151
BUF = int(os.environ.get("BUF_MI", "32")) << 20
STEPS = 8
rng = np.random.default_rng(0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from bench import make_read_chunk

    chunks = [make_read_chunk(rng, BUF) for _ in range(STEPS)]
    sample = oracle.kmer_hashes(
        oracle.encode_bytes(chunks[0].bases[: READ_LEN * 5000]), K
    )
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
    cap = auto_stream_cap(BUF, table.n_buckets, READ_LEN)
    log(f"{len(entry)} keys, {table.n_buckets} buckets, cap={cap}")
    config = MapperConfig(
        k=K, buf=BUF, max_reads=BUF // 64, probe="stream", read_len=READ_LEN,
        stream_cap=cap,
    )
    packed = [
        next(iter(pack_for_device(
            iter([c]), config.buf, config.max_reads, K, read_len=READ_LEN
        )))
        for c in chunks
    ]
    assert all(p[5] for p in packed)
    resident = [
        (jax.device_put(p), jnp.int32(nb // READ_LEN))
        for p, ln, nb, _, _, _ in packed
    ]
    n_blocks = table.n_buckets // 128

    def stage(variant, acc, packed_arr, n_reads):
        m_lo, m_hi = hashing.plane_hash_mixed(
            packed_arr, K, READ_LEN, n_reads, table.seed, pad_to=cap
        )
        if variant == "hash":
            red = lax.reduce(m_lo ^ m_hi, jnp.uint32(0), lax.bitwise_xor, (0,))
            return acc + red
        sm_lo, sm_hi = lax.sort((m_lo, m_hi), dimension=0, num_keys=1, is_stable=False)
        if variant == "sort":
            return acc + sm_lo[0] + sm_hi[-1]
        off = stream_probe.block_offsets(sm_lo, table.n_buckets, 128)
        if variant == "off":
            return acc + sm_lo[0] + sm_hi[-1] + off[-1].astype(jnp.uint32)
        n = sm_lo.shape[0]
        q = jnp.stack([sm_lo, sm_hi])
        t_pad = max_rounds * (n // cap + n_blocks)
        g_starts, g_ends = off[:-1], off[1:]
        bases_ = g_starts & ~jnp.int32(127)
        n_tiles_g = jnp.where(
            g_ends > g_starts, (g_ends - bases_ + jnp.int32(cap - 1)) // cap, 0
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
        t_off = bases_[safe] + (r - p * nt) * jnp.int32(cap)
        return (
            acc + q[0, 0] + q[1, -1] + t_off[-1].astype(jnp.uint32)
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
    for variant in ("hash", "sort", "off", "prep"):
        def window(resident, _v=variant):
            acc = jnp.uint32(0)
            for i in range(STEPS):
                p, nr = resident[i]
                acc = stage(_v, acc, p, nr)
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
