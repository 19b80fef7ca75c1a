import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from kmer_mapper_tpu.index import layout
from kmer_mapper_tpu.ops import stream_probe
from kmer_mapper_tpu.ops.u32hash import split_u64

rng = np.random.default_rng(0)
N_UNIQUE = 4_000_000
N = 4 << 20
keys = np.unique(rng.integers(0, 1 << 62, N_UNIQUE, dtype=np.uint64))
table = layout.build_table(keys)
print("table:", table.n_buckets, "buckets, max_probe", table.max_probe, flush=True)

queries = np.concatenate([rng.choice(keys, N // 2), rng.integers(0, 1 << 62, N - N // 2, dtype=np.uint64)])
qlo, qhi = split_u64(queries)
valid = np.ones(N, bool)
klo, khi = jnp.asarray(table.key_lo), jnp.asarray(table.key_hi)
qlo_d, qhi_d, valid_d = jnp.asarray(qlo), jnp.asarray(qhi), jnp.asarray(valid)
counts = jnp.zeros(table.n_slots, dtype=jnp.uint32)

f = jax.jit(lambda c, a, b, v: stream_probe.stream_probe_count(
    klo, khi, c, a, b, v, table.seed, table.max_probe, cap=2048), donate_argnums=(0,))
t = time.perf_counter()
counts = f(counts, qlo_d, qhi_d, valid_d)
s = int(counts.sum())
print(f"compile+first: {time.perf_counter()-t:.1f}s, hits {s}", flush=True)
t = time.perf_counter()
REPS = 10
for _ in range(REPS):
    counts = f(counts, qlo_d, qhi_d, valid_d)
s2 = int(counts.sum())
dt = (time.perf_counter()-t)/REPS
print(f"stream_probe_count: {dt*1e3:.1f} ms per 4Mi queries = {N/dt/1e6:.0f} Mquery/s", flush=True)
slots = layout.query_table(table, queries)
per_pass = np.bincount(slots[slots>=0], minlength=table.n_slots).astype(np.uint64)
np.testing.assert_array_equal(np.asarray(counts).astype(np.uint64), per_pass * (REPS+1))
print("EXACT MATCH on TPU", flush=True)
