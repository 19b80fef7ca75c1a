"""FROZEN round-2 measurement artifact: written against the pre-mixed-key
stream API (3-operand sort_queries / stream_count); kept for the measurement
record, NOT runnable against the current code. Round-3 equivalents:
r3_s_dissect.py, r3_true_window.py, r3_composed_sweep.py.

CHAIN_BLOCK / cap sweep for stream kernel v2 on real TPU.

Round-1 swept CHAIN_BLOCK with the old kernel (3 DMAs/tile, global tiles) and
locked 128; the v2 dissection showed per-block fixed cost (15.4 ms empty
floor) + DMA count (10.8 ms) dominate, which larger blocks amortize — and the
one-hot materialization that motivated small blocks measured ~free. Re-sweep.
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

N = 16 << 20
REPS = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


rng = np.random.default_rng(0)
keys = np.unique(rng.integers(0, 1 << 62, 4_000_000, dtype=np.uint64))
queries = np.concatenate(
    [rng.choice(keys, N // 2), rng.integers(0, 1 << 62, N - N // 2, dtype=np.uint64)]
)
qlo, qhi = split_u64(queries)
valid = jnp.ones(N, bool)
want = None

for bpb, cap, coarse in ((128, 1024, 8), (256, 1024, 4), (256, 2048, 4),
                         (512, 2048, 2), (1024, 2048, 1)):
    layout.CHAIN_BLOCK = bpb
    stream_probe.CHAIN_BLOCK = bpb
    t = time.perf_counter()
    table = layout.build_table(keys)
    bp = jnp.asarray(table.block_max_probe())
    log(f"bpb={bpb}: table built in {time.perf_counter() - t:.1f}s "
        f"(max_probe {table.max_probe})")
    if want is None:
        slots = layout.query_table(table, queries)
        want = int((slots >= 0).sum())
    klo, khi = jnp.asarray(table.key_lo), jnp.asarray(table.key_hi)
    sb, slo, shi = jax.jit(lambda a, b, v: stream_probe.sort_queries(
        a, b, v, table.n_buckets, table.seed))(jnp.asarray(qlo), jnp.asarray(qhi), valid)
    off = jax.jit(lambda s, _b=bpb: stream_probe.block_offsets(
        s, table.n_buckets, _b))(sb)
    counts = jnp.zeros(table.n_slots, jnp.uint32)

    def chain(kl, kh, c, sb, slo, shi, off, bpd, _cap=cap, _coarse=coarse):
        for _ in range(REPS):
            c = stream_probe.stream_count(kl, kh, c, sb, slo, shi, off,
                                          table.max_probe, cap=_cap,
                                          block_probe=bpd, coarse=_coarse)
        return c.sum()

    f = jax.jit(chain)
    t = time.perf_counter()
    s = int(np.asarray(jax.device_get(f(klo, khi, counts, sb, slo, shi, off, bp))))
    ok = s == REPS * want
    log(f"bpb={bpb} cap={cap}: compile+run {time.perf_counter() - t:.1f}s "
        f"{'OK' if ok else f'MISMATCH {s} vs {REPS * want}'}")
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        s = int(np.asarray(jax.device_get(f(klo, khi, counts, sb, slo, shi, off, bp))))
        best = min(best, (time.perf_counter() - t) / REPS)
    log(f"bpb={bpb:5d} cap={cap:5d} coarse={coarse}: {best * 1e3:7.2f} ms "
        f"({N / best / 1e6:5.0f} Mq/s)")
