"""FROZEN round-2 measurement artifact: written against the pre-mixed-key
stream API (3-operand sort_queries / stream_count); kept for the measurement
record, NOT runnable against the current code. Round-3 equivalents:
r3_s_dissect.py, r3_true_window.py, r3_composed_sweep.py.

What is exposed in the composed window? Times the 8-step window with the
Pallas kernel REMOVED (sort + offsets + schedule + hash only): the difference
to the full window is the kernel's exposed cost; the floor shows how much of
the sort XLA fails to hide."""
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
from kmer_mapper_tpu.models.mapper import MapperConfig
from kmer_mapper_tpu.ops import hashing, stream_probe

K, READ_LEN, BUF = 31, 151, 16 << 20
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


chunks = [make_read_chunk(BUF) for _ in range(3)]
sample = oracle.kmer_hashes(oracle.encode_bytes(chunks[0].bases[: READ_LEN * 5000]), K)
entry = np.unique(np.concatenate([
    rng.integers(0, 1 << 62, 2_000_000, dtype=np.uint64), rng.choice(sample, 2_000_000)]))
index = ki.TpuKmerIndex.from_entries(entry, rng.integers(0, 3_000_000, len(entry)).astype(np.int32))
table = index.table
config = MapperConfig(k=K, buf=BUF, max_reads=BUF // 64, probe="stream")
packed = [next(iter(pack_for_device(iter([c]), config.buf, config.max_reads, K)))
          for c in chunks]
resident = [(jax.device_put(p), jax.device_put(ln), jnp.int32(nb))
            for p, ln, nb, _, _ in packed]
bpb = min(stream_probe.CHAIN_BLOCK, table.n_buckets)


def chunk_no_kernel(counts, packed_arr, lengths, n_bases):
    lengths = lengths.astype(jnp.int32)
    starts = jnp.cumsum(lengths) - lengths
    valid = hashing.window_mask(starts, n_bases, K, BUF)
    n_valid = jnp.sum(valid.astype(jnp.uint32))
    lo, hi = hashing.rolling_kmer_hash_packed(packed_arr, K)
    sb, slo, shi = stream_probe.sort_queries(lo, hi, valid, table.n_buckets, table.seed)
    off = stream_probe.block_offsets(sb, table.n_buckets, bpb)
    # keep everything live without the kernel
    counts = counts.at[0].add(sb[0] + slo[-1] + shi[0] + off[-1].astype(jnp.uint32))
    return counts, n_valid


def window(counts, resident):
    total = jnp.uint32(0)
    for i in range(STEPS):
        p, ln, nb = resident[i % len(resident)]
        counts, nv = chunk_no_kernel(counts, p, ln, nb)
        total = total + nv
    return counts, total


fn = jax.jit(window, donate_argnums=(0,))
counts = jax.device_put(jnp.zeros(table.n_slots, dtype=jnp.uint32))
counts, total = fn(counts, resident)
km = int(jax.device_get(total))
best = 1e9
for _ in range(3):
    t = time.perf_counter()
    counts, total = fn(counts, resident)
    _ = int(jax.device_get(total))
    best = min(best, time.perf_counter() - t)
log(f"window WITHOUT kernel: {best:.3f}s for {km} kmers "
    f"({best / STEPS * 1e3:.1f} ms/chunk vs ~43.5 full)")
