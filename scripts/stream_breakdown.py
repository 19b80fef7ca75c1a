"""FROZEN round-2 measurement artifact: written against the pre-mixed-key
stream API (3-operand sort_queries / stream_count); kept for the measurement
record, NOT runnable against the current code. Round-3 equivalents:
r3_s_dissect.py, r3_true_window.py, r3_composed_sweep.py.

Per-stage device timing at the production configuration (16Mi-base chunks).
Chained in-jit, scalar-fetch timing (see CLAUDE.md measurement gotchas)."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from kmer_mapper_tpu.index import layout, kmer_index as ki
from kmer_mapper_tpu.ops import stream_probe, encode, hashing
from kmer_mapper_tpu.ops.u32hash import split_u64
from kmer_mapper_tpu.models.mapper import MapperConfig, chunk_step
import functools

rng = np.random.default_rng(0)
N = 16 << 20  # queries per chunk
REPS = 4
keys = np.unique(rng.integers(0, 1 << 62, 4_000_000, dtype=np.uint64))
table = layout.build_table(keys)
bp = table.block_max_probe()
print("buckets", table.n_buckets, "max_probe", table.max_probe, flush=True)
queries = np.concatenate([rng.choice(keys, N//2), rng.integers(0, 1<<62, N - N//2, dtype=np.uint64)])
qlo, qhi = split_u64(queries)
klo, khi = jnp.asarray(table.key_lo), jnp.asarray(table.key_hi)
qlo_d, qhi_d = jnp.asarray(qlo), jnp.asarray(qhi)
valid_d = jnp.ones(N, bool)
bpb = min(layout.CHAIN_BLOCK, table.n_buckets)

def timeit(name, fn, *args, outer=3):
    g = jax.jit(fn)
    s = float(np.asarray(jax.device_get(g(*args))).sum())
    best = 1e9
    for _ in range(outer):
        t = time.perf_counter()
        s = float(np.asarray(jax.device_get(g(*args))).sum())
        best = min(best, (time.perf_counter()-t)/REPS)
    print(f"{name:30s} {best*1e3:7.2f} ms  ({N/best/1e6:6.0f} Mq/s)", flush=True)

def sort_chain(a, b, v):
    acc = jnp.uint32(0)
    for i in range(REPS):
        sb, slo, shi = stream_probe.sort_queries(a ^ jnp.uint32(i), b, v, table.n_buckets, table.seed)
        acc += sb[0] + slo[-1]
    return acc
timeit("sort (unstable, 16.8M)", sort_chain, qlo_d, qhi_d, valid_d)

sb0, slo0, shi0 = jax.jit(lambda a,b,v: stream_probe.sort_queries(a,b,v,table.n_buckets,table.seed))(qlo_d, qhi_d, valid_d)
def off_chain(sb):
    acc = jnp.int32(0)
    for i in range(REPS):
        acc += stream_probe.block_offsets(sb ^ (jnp.uint32(i) & jnp.uint32(0)), table.n_buckets, bpb)[-1]
    return acc
timeit("block_offsets (bisection)", off_chain, sb0)

off0 = jax.jit(lambda s: stream_probe.block_offsets(s, table.n_buckets, bpb))(sb0)
def kern_chain(c, sb, slo, shi, off):
    for i in range(REPS):
        c = stream_probe.stream_count(klo, khi, c, sb, slo, shi, off, table.max_probe, block_probe=bp)
    return c.sum()
counts = jnp.zeros(table.n_slots, jnp.uint32)
timeit("stream kernel (chain-skip)", kern_chain, counts, sb0, slo0, shi0, off0)

# hash+mask+unpack cost
cfg = MapperConfig(k=31, buf=N, max_reads=N//32)
packed = rng.integers(0, 1<<32, cfg.packed_words, dtype=np.uint64).astype(np.uint32)
lengths = np.zeros(cfg.max_reads, np.uint16); lengths[:N//151] = 151
def hash_chain(p, ln):
    acc = jnp.uint32(0)
    for i in range(REPS):
        codes = encode.unpack_codes(p ^ jnp.uint32(i))[: cfg.buf + cfg.k]
        li = ln.astype(jnp.int32)
        starts = jnp.cumsum(li) - li
        vmask = hashing.window_mask(starts, jnp.int32(N), cfg.k, cfg.buf)
        lo, hi = hashing.rolling_kmer_hash(codes, cfg.k)
        acc += lo[0] + hi[-1] + jnp.sum(vmask.astype(jnp.uint32))
    return acc
timeit("unpack+hash+mask", hash_chain, jnp.asarray(packed), jnp.asarray(lengths))
