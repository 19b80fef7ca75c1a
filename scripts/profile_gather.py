"""Honest TPU gather/scatter/sort micro-bench (chained in-jit, scalar fetch)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 4 << 20  # queries
NB = 2 << 20  # buckets
REPS = 8


def bench(name, make_fn, *args):
    fn = jax.jit(make_fn)
    s = float(fn(*args))  # compile + run
    t = time.perf_counter()
    for _ in range(3):
        s = float(fn(*args))
    dt = (time.perf_counter() - t) / 3 / REPS
    print(f"{name:42s} {dt * 1e3:8.2f} ms  ({N / dt / 1e6:7.0f} Mquery/s)", flush=True)
    return dt


rng = np.random.default_rng(0)
idx0 = jnp.asarray(rng.integers(0, NB, N).astype(np.int32))
table8 = jnp.asarray(rng.integers(0, 1 << 30, (NB, 8)).astype(np.uint32))
table4 = table8[:, :4]
table16 = jnp.concatenate([table8, table8], axis=1)
flat = table8.reshape(-1)
big_flat = jnp.asarray(rng.integers(0, 1 << 30, NB * 8).astype(np.uint32))


def chain(body):
    def fn(idx, t):
        acc = jnp.uint32(0)
        x = idx
        for _ in range(REPS):
            v = body(x, t)
            acc = acc + v.sum(dtype=jnp.uint32) if v.ndim else acc + v
            x = (x + 1) & jnp.int32(NB - 1)
        return acc

    return fn


bench("elem gather u32 (N,) from 16M", chain(lambda x, t: t[x]), idx0, big_flat)
bench("row gather (N,4)", chain(lambda x, t: t[x]), idx0, table4)
bench("row gather (N,8)", chain(lambda x, t: t[x]), idx0, table8)
bench("row gather (N,16)", chain(lambda x, t: t[x]), idx0, table16)

idx_sorted = jnp.sort(idx0)
bench("row gather (N,8) sorted idx", chain(lambda x, t: t[x]), idx_sorted, table8)

bench("sort u32 (N,)", chain(lambda x, t: jnp.sort(x).astype(jnp.uint32)), idx0, table8)
bench(
    "argsort u32 (N,)",
    chain(lambda x, t: jnp.argsort(x).astype(jnp.uint32)),
    idx0,
    table8,
)


def scatter_body(x, t):
    c = jnp.zeros(NB * 8, dtype=jnp.uint32).at[x].add(jnp.uint32(1), mode="drop")
    return c.sum(dtype=jnp.uint32)


bench("scatter-add (N,) into 16M", scatter_body and chain(scatter_body), idx0, table8)

idx_small = jnp.asarray(rng.integers(0, 65536, N).astype(np.int32))
small = jnp.asarray(rng.integers(0, 1 << 30, 65536).astype(np.uint32))
bench("elem gather from 256KB (VMEM-able)", chain(lambda x, t: t[x]), idx_small, small)


def onehot_body(x, t):
    # MXU lookup for tiny tables: one-hot matmul
    oh = jax.nn.one_hot(x & 127, 128, dtype=jnp.bfloat16)
    v = oh @ t
    return v.sum(dtype=jnp.float32).astype(jnp.uint32)


t128 = jnp.asarray(rng.random((128, 1)).astype(np.float32)).astype(jnp.bfloat16)
bench("one-hot matmul lookup 128", chain(onehot_body), idx0, t128)
