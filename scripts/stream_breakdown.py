import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from kmer_mapper_tpu.index import layout
from kmer_mapper_tpu.ops import stream_probe
from kmer_mapper_tpu.ops.u32hash import split_u64

rng = np.random.default_rng(0)
N = 4 << 20
keys = np.unique(rng.integers(0, 1 << 62, 4_000_000, dtype=np.uint64))
table = layout.build_table(keys)
print("buckets", table.n_buckets, "max_probe", table.max_probe, flush=True)
queries = np.concatenate([rng.choice(keys, N//2), rng.integers(0, 1<<62, N - N//2, dtype=np.uint64)])
qlo, qhi = split_u64(queries)
klo, khi = jnp.asarray(table.key_lo), jnp.asarray(table.key_hi)
qlo_d, qhi_d = jnp.asarray(qlo), jnp.asarray(qhi)
valid_d = jnp.ones(N, bool)

def timeit(name, f, *args, reps=5, donate=None):
    g = jax.jit(f, donate_argnums=donate) if donate else jax.jit(f)
    out = g(*args)
    s = jax.device_get(jax.tree.leaves(out)[0])  # force
    t = time.perf_counter()
    for _ in range(reps):
        out = g(*args)
    s = jax.device_get(jax.tree.leaves(out)[-1])
    dt = (time.perf_counter()-t)/reps
    print(f"{name:30s} {dt*1e3:7.2f} ms", flush=True)
    return out

# sort only
sorted_out = timeit("sort_queries (3-op, 4M)", lambda a,b,v: stream_probe.sort_queries(a,b,v,table.n_buckets,table.seed), qlo_d, qhi_d, valid_d)
sb, slo, shi = sorted_out
bpb = min(layout.CHAIN_BLOCK, table.n_buckets)
off = timeit("block_offsets", lambda s: stream_probe.block_offsets(s, table.n_buckets, bpb), sb)

for cap in (1024, 2048, 4096):
    def kern(c, sb, slo, shi, off):
        return stream_probe.stream_count(klo, khi, c, sb, slo, shi, off, table.max_probe, cap=cap)
    counts = jnp.zeros(table.n_slots, jnp.uint32)
    try:
        timeit(f"stream kernel cap={cap}", kern, counts, sb, slo, shi, off)
    except Exception as e:
        print(f"cap={cap} failed: {type(e).__name__} {str(e)[:120]}", flush=True)

def full(c, a, b, v):
    return stream_probe.stream_probe_count(klo, khi, c, a, b, v, table.seed, table.max_probe, cap=2048)
counts = jnp.zeros(table.n_slots, jnp.uint32)
timeit("full stream_probe_count", full, counts, qlo_d, qhi_d, valid_d)
