"""Full chunk-step window (as bench.py) at stream_cap 1024 vs 2048."""
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

K, READ_LEN, BUF = 31, 151, 16 << 20
STEPS = 8
rng = np.random.default_rng(0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_read_chunk(n_bases):
    bases = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n_bases)
    n_reads = n_bases // READ_LEN
    starts = np.arange(n_reads, dtype=np.int64) * READ_LEN
    return SequenceChunk(bases=bases[: n_reads * READ_LEN], read_starts=starts)


chunks = [make_read_chunk(BUF) for _ in range(3)]
sample = oracle.kmer_hashes(oracle.encode_bytes(chunks[0].bases[: READ_LEN * 5000]), K)
entry = np.unique(np.concatenate([
    rng.integers(0, 1 << 62, 2_000_000, dtype=np.uint64), rng.choice(sample, 2_000_000)]))
nodes = rng.integers(0, 3_000_000, len(entry)).astype(np.int32)
index = ki.TpuKmerIndex.from_entries(entry, nodes)
table = index.table
key_lo, key_hi = jax.device_put(table.key_lo), jax.device_put(table.key_hi)
bp = table.block_max_probe()

for cap in (1024,):
    config = MapperConfig(k=K, buf=BUF, max_reads=BUF // 64, probe="stream", stream_cap=cap)
    packed = [next(iter(pack_for_device(iter([c]), config.buf, config.max_reads, K)))
              for c in chunks]
    resident = [(jax.device_put(p), jax.device_put(ln), jnp.int32(nb))
                for p, ln, nb, _, _ in packed]
    step = functools.partial(chunk_step, config=config, max_probe=table.max_probe,
                             seed=table.seed, block_probe=bp)

    def window(key_lo, key_hi, counts, resident):
        total = jnp.uint32(0)
        for i in range(STEPS):
            p, ln, nb = resident[i % len(resident)]
            counts, nv = step(key_lo, key_hi, counts, p, ln, nb)
            total = total + nv
        return counts, total

    fn = jax.jit(window, donate_argnums=(2,))
    counts = jax.device_put(jnp.zeros(table.n_slots, dtype=jnp.uint32))
    t = time.perf_counter()
    counts, total = fn(key_lo, key_hi, counts, resident)
    km = int(jax.device_get(total))
    log(f"cap={cap}: compile+run {time.perf_counter() - t:.1f}s")
    best = 0
    for w in range(3):
        t = time.perf_counter()
        counts, total = fn(key_lo, key_hi, counts, resident)
        _ = int(jax.device_get(total))
        best = max(best, km / (time.perf_counter() - t))
    log(f"cap={cap}: {best / 1e6:.1f} Mkmers/s")
