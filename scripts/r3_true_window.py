"""Expose the CSE distortion in the composed-window methodology.

bench.py's window chains STEPS=8 chunk steps over N resident chunks; when the
same device-resident chunk appears multiple times, XLA CSE-dedupes the pure
sort/hash subgraphs, so the window pays sort+hash once per DISTINCT chunk —
inflating the reported steady-state rate (a real file stream sorts every
chunk).

Measures 8-step windows over 2 / 3 / 8 distinct 64Mi chunks, with and without
the kernel, at the production config. The 8-distinct numbers are the truth.
"""
import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kmer_mapper_tpu import oracle
from kmer_mapper_tpu.index import kmer_index as ki
from kmer_mapper_tpu.io.readers import SequenceChunk, pack_for_device
from kmer_mapper_tpu.models.mapper import MapperConfig, chunk_step
from kmer_mapper_tpu.ops import hashing, stream_probe

K, READ_LEN, BUF = 31, 151, 64 << 20
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
    sample = oracle.kmer_hashes(oracle.encode_bytes(chunks[0].bases[: READ_LEN * 5000]), K)
    entry = np.unique(np.concatenate([
        rng.integers(0, 1 << 62, 2_000_000, dtype=np.uint64),
        rng.choice(sample, 2_000_000),
    ]))
    index = ki.TpuKmerIndex.from_entries(
        entry, rng.integers(0, 3_000_000, len(entry)).astype(np.int32)
    )
    table = index.table
    bp = table.block_max_probe()
    config = MapperConfig(
        k=K, buf=BUF, max_reads=BUF // 64, probe="stream", stream_cap=8192,
        read_len=READ_LEN,
    )
    packed = [
        next(iter(pack_for_device(iter([c]), config.buf, config.max_reads, K)))
        for c in chunks
    ]
    key_lo = jax.device_put(table.key_lo)
    key_hi = jax.device_put(table.key_hi)
    resident = [
        (jax.device_put(p), jax.device_put(ln), jnp.int32(nb))
        for p, ln, nb, _, _ in packed
    ]
    step = functools.partial(
        chunk_step, config=config, max_probe=table.max_probe, seed=table.seed,
        block_probe=bp,
    )

    def sort_only(counts, packed_arr, lengths, n_bases):
        L, R, W = READ_LEN, BUF // READ_LEN, READ_LEN - K + 1
        lo, hi = hashing.rolling_kmer_hash_packed(packed_arr, K)
        lo = lo[: R * L].reshape(R, L)[:, :W].reshape(R * W)
        hi = hi[: R * L].reshape(R, L)[:, :W].reshape(R * W)
        n_reads = n_bases // jnp.int32(L)
        valid = (jax.lax.broadcasted_iota(jnp.int32, (R, W), 0) < n_reads).reshape(R * W)
        sm_lo, sm_hi = stream_probe.sort_queries(lo, hi, valid, table.n_buckets, table.seed)
        off = stream_probe.block_offsets(sm_lo, table.n_buckets, 128)
        counts = counts.at[0].add(sm_lo[0] + sm_hi[-1] + off[-1].astype(jnp.uint32))
        return counts, (n_reads * W).astype(jnp.uint32)

    for tag, fn in (("full", step), ("nokernel", sort_only)):
        for n_distinct in (2, 3, 8):
            def window(key_lo, key_hi, counts, resident, _n=n_distinct, _fn=fn, _tag=tag):
                total = jnp.uint32(0)
                for i in range(STEPS):
                    p, ln, nb = resident[i % _n]
                    if _tag == "full":
                        counts, nv = _fn(key_lo, key_hi, counts, p, ln, nb)
                    else:
                        counts, nv = _fn(counts, p, ln, nb)
                    total = total + nv
                return counts, total

            f = jax.jit(window, donate_argnums=(2,))
            counts = jax.device_put(jnp.zeros(table.n_slots, dtype=jnp.uint32))
            t = time.perf_counter()
            counts, total = f(key_lo, key_hi, counts, resident)
            km = int(jax.device_get(total))
            log(f"{tag} D={n_distinct}: compile+first {time.perf_counter() - t:.1f}s")
            best = 1e9
            for _ in range(3):
                t = time.perf_counter()
                counts, total = f(key_lo, key_hi, counts, resident)
                _ = int(jax.device_get(total))
                best = min(best, time.perf_counter() - t)
            log(
                f"{tag} D={n_distinct}: window {best * 1e3:7.1f} ms "
                f"({km / best / 1e6:6.1f} Mk/s, {best / STEPS * 1e3:6.1f} ms/step)"
            )


if __name__ == "__main__":
    main()
