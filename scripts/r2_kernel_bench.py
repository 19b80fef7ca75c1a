"""FROZEN round-2 measurement artifact: written against the pre-mixed-key
stream API (3-operand sort_queries / stream_count); kept for the measurement
record, NOT runnable against the current code. Round-3 equivalents:
r3_s_dissect.py, r3_true_window.py, r3_composed_sweep.py.

Round-2 kernel experiment: exact-window fused-DMA kernel, coarse sweep.

Measures the new stream kernel (exact per-block query windows + fused (3,cap)
DMA + coarse grid) at the production config: 16.8M queries, 4M-unique-key
table (2^21 buckets). Round-1 baseline for the same stage: 40.6 ms.
Chained in-jit, scalar-fetch timing (CLAUDE.md gotchas).
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kmer_mapper_tpu.index import layout
from kmer_mapper_tpu.ops import stream_probe
from kmer_mapper_tpu.ops.u32hash import split_u64

rng = np.random.default_rng(0)
N = 16 << 20
REPS = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


keys = np.unique(rng.integers(0, 1 << 62, 4_000_000, dtype=np.uint64))
table = layout.build_table(keys)
bp = table.block_max_probe()
log(f"buckets {table.n_buckets} max_probe {table.max_probe}")
queries = np.concatenate(
    [rng.choice(keys, N // 2), rng.integers(0, 1 << 62, N - N // 2, dtype=np.uint64)]
)
qlo, qhi = split_u64(queries)
klo, khi = jnp.asarray(table.key_lo), jnp.asarray(table.key_hi)
qlo_d, qhi_d = jnp.asarray(qlo), jnp.asarray(qhi)
valid_d = jnp.ones(N, bool)
bpb = min(layout.CHAIN_BLOCK, table.n_buckets)

sb0, slo0, shi0 = jax.jit(
    lambda a, b, v: stream_probe.sort_queries(a, b, v, table.n_buckets, table.seed)
)(qlo_d, qhi_d, valid_d)
off0 = jax.jit(lambda s: stream_probe.block_offsets(s, table.n_buckets, bpb))(sb0)

# oracle check once (counts of a single kernel application)
expected_hits = N // 2  # every chosen key occurs; duplicates counted too


def timeit(name, fn, *args, outer=3):
    g = jax.jit(fn)
    t = time.perf_counter()
    s = float(np.asarray(jax.device_get(g(*args))).sum())
    log(f"{name:44s} compile+run {time.perf_counter() - t:.1f}s")
    best = 1e9
    for _ in range(outer):
        t = time.perf_counter()
        s = float(np.asarray(jax.device_get(g(*args))).sum())
        best = min(best, (time.perf_counter() - t) / REPS)
    log(f"{name:44s} {best * 1e3:7.2f} ms  ({N / best / 1e6:6.0f} Mq/s) sum={s}")
    return best


counts = jnp.zeros(table.n_slots, jnp.uint32)

# correctness on device first (one application)
one = jax.jit(
    stream_probe.stream_count, static_argnames=("max_probe", "coarse")
)(klo, khi, counts, sb0, slo0, shi0, off0, table.max_probe, block_probe=jnp.asarray(bp), coarse=8)
got = int(np.asarray(jax.device_get(one)).astype(np.uint64).sum())
slots = layout.query_table(table, queries)
want = int((slots >= 0).sum())
log(f"correctness: device total {got} vs oracle {want} -> {'OK' if got == want else 'MISMATCH'}")

bp_d = jnp.asarray(bp)
for coarse, cap in ((16, 2048), (16, 4096), (8, 2048)):
    def kern_chain(kl, kh, c, sb, slo, shi, off, bpd, _coarse=coarse, _cap=cap):
        for i in range(REPS):
            c = stream_probe.stream_count(
                kl, kh, c, sb, slo, shi, off, table.max_probe,
                block_probe=bpd, coarse=_coarse, cap=_cap,
            )
        return c.sum()

    timeit(f"stream kernel v2 coarse={coarse} cap={cap}", kern_chain, klo, khi, counts, sb0, slo0, shi0, off0, bp_d)
