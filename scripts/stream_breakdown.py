import sys; sys.path.insert(0, "/root/repo")
import time, functools, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from kmer_mapper_tpu.index import layout
from kmer_mapper_tpu.ops import stream_probe
from kmer_mapper_tpu.ops.u32hash import split_u64

rng = np.random.default_rng(0)
N = 4 << 20
REPS = 6
keys = np.unique(rng.integers(0, 1 << 62, 4_000_000, dtype=np.uint64))
table = layout.build_table(keys)
print("buckets", table.n_buckets, "max_probe", table.max_probe, flush=True)
queries = np.concatenate([rng.choice(keys, N//2), rng.integers(0, 1<<62, N - N//2, dtype=np.uint64)])
qlo, qhi = split_u64(queries)
klo, khi = jnp.asarray(table.key_lo), jnp.asarray(table.key_hi)
qlo_d, qhi_d = jnp.asarray(qlo), jnp.asarray(qhi)
valid_d = jnp.ones(N, bool)
bpb = min(layout.CHAIN_BLOCK, table.n_buckets)

def timeit(name, fn, *args, outer=3):
    g = jax.jit(fn)
    s = int(jax.device_get(g(*args)))
    t = time.perf_counter()
    for _ in range(outer):
        s = int(jax.device_get(g(*args)))
    dt = (time.perf_counter()-t)/outer/REPS
    print(f"{name:34s} {dt*1e3:7.2f} ms  ({N/dt/1e6:5.0f} Mq/s)", flush=True)

def sort_chain(a, b, v):
    acc = jnp.uint32(0)
    for i in range(REPS):
        sb, slo, shi = stream_probe.sort_queries(a ^ jnp.uint32(i), b, v, table.n_buckets, table.seed)
        acc += sb[0] + slo[-1]
    return acc
timeit("sort_queries", sort_chain, qlo_d, qhi_d, valid_d)

sb0, slo0, shi0 = jax.jit(lambda a,b,v: stream_probe.sort_queries(a,b,v,table.n_buckets,table.seed))(qlo_d, qhi_d, valid_d)
def off_chain(sb):
    acc = jnp.int32(0)
    for i in range(REPS):
        acc += stream_probe.block_offsets(sb + jnp.uint32(i) - jnp.uint32(i), table.n_buckets, bpb)[-1]
    return acc
timeit("block_offsets", off_chain, sb0)

off0 = jax.jit(lambda s: stream_probe.block_offsets(s, table.n_buckets, bpb))(sb0)
for cap in (1024, 2048, 4096):
    def kern_chain(c, sb, slo, shi, off):
        for i in range(REPS):
            c = stream_probe.stream_count(klo, khi, c, sb, slo, shi, off, table.max_probe, cap=cap)
        return c.sum()
    counts = jnp.zeros(table.n_slots, jnp.uint32)
    try:
        timeit(f"stream kernel cap={cap}", kern_chain, counts, sb0, slo0, shi0, off0)
    except Exception as e:
        print(f"cap={cap} failed: {type(e).__name__} {str(e)[:100]}", flush=True)
