"""Per-stage device timing: encode+hash, probe, accumulate. Run on TPU."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from kmer_mapper_tpu.index import kmer_index as ki
from kmer_mapper_tpu.ops import encode, hashing, probe
from kmer_mapper_tpu.ops.u32hash import split_u64

K = 31
BUF = 4 << 20
N_UNIQUE = 4_000_000


def bench(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))  # compile
    t = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / n
    print(f"{name:30s} {dt * 1e3:8.2f} ms  ({BUF / dt / 1e6:7.1f} Mkmer/s)", flush=True)
    return dt


rng = np.random.default_rng(0)
ascii_np = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), BUF + K)
ascii_buf = jnp.asarray(ascii_np)
starts = jnp.asarray(np.arange(0, BUF, 151, dtype=np.int32))

entry_kmers = np.unique(rng.integers(0, 1 << 62, N_UNIQUE, dtype=np.uint64))
index = ki.TpuKmerIndex.from_entries(entry_kmers, entry_kmers.astype(np.int32) & 0xFFFF)
table = index.table
key_lo, key_hi = jnp.asarray(table.key_lo), jnp.asarray(table.key_hi)
print(f"table: {table.n_buckets} buckets max_probe={table.max_probe}", flush=True)

codes_np = rng.integers(0, 4, BUF + K).astype(np.uint32)
codes = jnp.asarray(codes_np)

q = rng.integers(0, 1 << 62, BUF, dtype=np.uint64)
qlo_np, qhi_np = split_u64(q)
qlo, qhi = jnp.asarray(qlo_np), jnp.asarray(qhi_np)
slots_np = rng.integers(-1, table.n_slots, BUF).astype(np.int32)
slots = jnp.asarray(slots_np)
valid = jnp.asarray(rng.random(BUF) < 0.9)
counts = jnp.zeros(table.n_slots, dtype=jnp.uint32)

f_encode = jax.jit(lambda a: encode.encode_bases(a)[0])
bench("encode", f_encode, ascii_buf)

f_hash = jax.jit(lambda c: hashing.rolling_kmer_hash(c, K))
bench("rolling_hash", f_hash, codes)

f_mask = jax.jit(lambda s: hashing.window_mask(s, jnp.int32(BUF), K, BUF))
bench("window_mask", f_mask, starts)

f_probe = jax.jit(
    lambda kl, kh, a, b: probe.probe_slots(kl, kh, a, b, table.max_probe, table.seed)
)
bench("probe (max_probe rounds)", f_probe, key_lo, key_hi, qlo, qhi)

f_probe1 = jax.jit(lambda kl, kh, a, b: probe.probe_slots(kl, kh, a, b, 1, table.seed))
bench("probe (1 round)", f_probe1, key_lo, key_hi, qlo, qhi)

f_scatter = jax.jit(lambda c, s, v: probe.accumulate_scatter(c, s, v))
bench("accumulate_scatter", f_scatter, counts, slots, valid)

f_sorted = jax.jit(lambda c, s, v: probe.accumulate_sorted(c, s, v))
bench("accumulate_sorted", f_sorted, counts, slots, valid)

f_sort_only = jax.jit(lambda s: jnp.sort(s))
bench("sort int32 only", f_sort_only, slots)

# gather micro: rows only
rows = jnp.asarray(rng.integers(0, table.n_buckets, BUF).astype(np.int32))
f_gather = jax.jit(lambda kl, r: kl[r])
bench("row gather (N,8) x1", f_gather, key_lo, rows)

f_take1 = jax.jit(lambda kl, r: jnp.take(kl.reshape(-1), r))
bench("elem gather (N,) x1", f_take1, key_lo, rows)
