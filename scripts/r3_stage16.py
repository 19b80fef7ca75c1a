"""Current per-stage budget at the production 16 Mi config, CSE-free.

Cumulative variants chained over 8 DISTINCT resident chunks in one jit:
  hash  packed rolling hash + read_len slicing + valid
  sort  + 2-operand mixed-key sort (pre-padded tail, as chunk_step runs it)
  off   + block_offsets (interpolation-assisted bisection)
  full  the real chunk_step (adds schedule prep + the pallas kernel)

Differences give per-stage costs; 8-chunk windows, best of 3.

Usage: python scripts/r3_stage16.py [BUF_MI=16] [CAP=0(auto)]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kmer_mapper_tpu import oracle
from kmer_mapper_tpu.index import kmer_index as ki
from kmer_mapper_tpu.io.readers import SequenceChunk, pack_for_device
from kmer_mapper_tpu.models.mapper import MapperConfig, auto_stream_cap, chunk_step
from kmer_mapper_tpu.ops import hashing, stream_probe

K, READ_LEN = 31, 151
BUF = (int(sys.argv[1]) if len(sys.argv) > 1 else 16) << 20
CAP_ARG = int(sys.argv[2]) if len(sys.argv) > 2 else 0
STEPS = 8
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
    sample = oracle.kmer_hashes(
        oracle.encode_bytes(chunks[0].bases[: READ_LEN * 5000]), K
    )
    entry = np.unique(
        np.concatenate(
            [
                rng.integers(0, 1 << 62, 2_000_000, dtype=np.uint64),
                rng.choice(sample, 2_000_000),
            ]
        )
    )
    index = ki.TpuKmerIndex.from_entries(
        entry, rng.integers(0, 3_000_000, len(entry)).astype(np.int32)
    )
    table = index.table
    bp = table.block_max_probe()
    cap = CAP_ARG or auto_stream_cap(BUF, table.n_buckets, READ_LEN)
    config = MapperConfig(
        k=K, buf=BUF, max_reads=BUF // 64, probe="stream",
        read_len=READ_LEN, stream_cap=cap,
    )
    log(f"BUF={BUF>>20}Mi cap={cap} buckets={table.n_buckets}")
    packed = [
        next(iter(pack_for_device(iter([c]), config.buf, config.max_reads, K)))
        for c in chunks
    ]
    resident = [
        (jax.device_put(p), jax.device_put(ln), jnp.int32(nb))
        for p, ln, nb, _, _ in packed
    ]
    L, R, W = READ_LEN, BUF // READ_LEN, READ_LEN - K + 1
    key_lo = jax.device_put(table.key_lo)
    key_hi = jax.device_put(table.key_hi)
    counts0 = jnp.zeros(table.n_slots, dtype=jnp.uint32)
    n_kmers = STEPS * R * W

    def stages(variant, acc, packed_arr, n_bases):
        lo, hi = hashing.rolling_kmer_hash_packed(packed_arr, K)
        lo = lo[: R * L].reshape(R, L)[:, :W].reshape(R * W)
        hi = hi[: R * L].reshape(R, L)[:, :W].reshape(R * W)
        n_reads = n_bases // jnp.int32(L)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (R, W), 0) < n_reads
        ).reshape(R * W)
        if variant == "hash":
            # full-array reduce so nothing DCEs to a point-slice
            return acc + jnp.sum(lo ^ hi) + jnp.sum(valid.astype(jnp.uint32))
        sm_lo, sm_hi = stream_probe.sort_queries(
            lo, hi, valid, table.n_buckets, table.seed, pad_to=cap
        )
        if variant == "sort":
            return acc + jnp.sum(sm_lo ^ sm_hi)
        off = stream_probe.block_offsets(sm_lo, table.n_buckets, 128)
        off = jnp.minimum(off, jnp.int32(sm_lo.shape[0] - cap))
        return acc + jnp.sum(sm_lo ^ sm_hi) + jnp.sum(off.astype(jnp.uint32))

    step = functools.partial(
        chunk_step, config=config, max_probe=table.max_probe, seed=table.seed,
        block_probe=bp,
    )

    def mk(variant):
        if variant == "full":
            def f(key_lo, key_hi, counts, resident):
                total = jnp.uint32(0)
                for i in range(STEPS):
                    p, ln, nb = resident[i]
                    counts, nv = step(key_lo, key_hi, counts, p, ln, nb)
                    total = total + nv
                return counts, total
            return jax.jit(f, donate_argnums=(2,))

        def f(key_lo, key_hi, counts, resident):
            acc = jnp.uint32(0)
            for i in range(STEPS):
                p, ln, nb = resident[i]
                acc = stages(variant, acc, p, nb)
            return counts, acc
        return jax.jit(f, donate_argnums=(2,))

    variants = ("hash", "sort", "off", "full")
    fns = {}
    counts = jax.device_put(counts0)
    for variant in variants:
        fns[variant] = mk(variant)
        t = time.perf_counter()
        counts, out = fns[variant](key_lo, key_hi, counts, resident)
        _ = int(jax.device_get(out))
        log(f"{variant}: compile+first {time.perf_counter()-t:.1f}s")
    results = {v: 1e9 for v in variants}
    for _rep in range(5):  # interleaved: service-load drift hits all equally
        for variant in variants:
            t = time.perf_counter()
            counts, out = fns[variant](key_lo, key_hi, counts, resident)
            _ = int(jax.device_get(out))
            results[variant] = min(
                results[variant], (time.perf_counter() - t) / STEPS
            )
    results = {v: results[v] * 1e3 for v in variants}
    for v in variants:
        log(f"{v}: {results[v]:7.2f} ms/chunk")
    h, s, o, fl = (results[v] for v in ("hash", "sort", "off", "full"))
    log(
        f"stages ms/chunk: hash {h:.2f} | sort {s-h:.2f} | off {o-s:.2f} | "
        f"prep+kernel {fl-o:.2f} | total {fl:.2f} "
        f"({n_kmers/STEPS/fl*1e3/1e6:.1f} Mk/s)"
    )
    print(
        f"RESULT buf={BUF>>20}Mi cap={cap} hash={h:.2f} sort={s-h:.2f} "
        f"off={o-s:.2f} kernel={fl-o:.2f} total={fl:.2f}"
    )


if __name__ == "__main__":
    main()
