"""Kernel-vs-XLA-side attribution for the HEADLINE (plane, multi-stream)
config after the plane-layout (3-D group-blocked table) refactor.

bench.py measured 369.5 Mk/s (old (n,8) layout) -> 345 Mk/s (plane layout),
both <0.3% spread, i.e. +10 ms on the ~146 ms chunk. Two variants attribute
it: ``prep`` monkeypatches pl.pallas_call with a fake that consumes every
operand (schedule build, sorts, hash all run; kernel does not), ``full`` is
unpatched. kernel time = full - prep.

Usage: python scripts/r9_plane_dissect.py
Env: STEPS (default 8 distinct chunks — CSE-free), BUF_MI=64, STREAMS=4.
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

K = 31
READ_LEN = 151
BUF = int(os.environ.get("BUF_MI", 64)) << 20
STEPS = int(os.environ.get("STEPS", 8))
STREAMS = int(os.environ.get("STREAMS", 4))
N_WINDOWS = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from bench import make_read_chunk
    from kmer_mapper_tpu import oracle
    from kmer_mapper_tpu.index import layout
    from kmer_mapper_tpu.io.readers import pack_for_device
    from kmer_mapper_tpu.models import mapper as mapper_mod
    from kmer_mapper_tpu.models.mapper import auto_stream_cap, default_config
    from kmer_mapper_tpu.ops import stream_probe

    rng = np.random.default_rng(7)
    chunks = [make_read_chunk(rng, BUF) for _ in range(STEPS)]
    sample_codes = oracle.encode_bytes(chunks[0].bases[: READ_LEN * 5000])
    sample_kmers = oracle.kmer_hashes(sample_codes, K)
    entry_kmers = np.unique(
        np.concatenate(
            [
                rng.integers(0, 1 << 62, 1_350_000, dtype=np.uint64),
                rng.choice(sample_kmers, 1_350_000),
            ]
        )
    )
    table = layout.build_table(entry_kmers)
    bp = table.block_max_probe()
    log(f"{len(entry_kmers)} keys -> {table.n_buckets} buckets")
    config = default_config(
        k=K, buf=BUF, max_reads=max(1024, BUF // 64), read_len=READ_LEN,
        streams=STREAMS,
        stream_cap=auto_stream_cap(
            BUF // STREAMS, table.n_buckets, READ_LEN, k=K, streams=STREAMS
        ),
    )
    log(f"cap={config.stream_cap} streams={config.streams}")

    packed = [
        next(iter(pack_for_device(
            iter([c]), config.buf, config.max_reads, K, read_len=READ_LEN
        )))
        for c in chunks
    ]
    assert all(p[5] for p in packed)
    p_lo, p_hi = stream_probe.plane_keys(table.key_lo, table.key_hi)
    key_lo = jax.device_put(p_lo)
    key_hi = jax.device_put(p_hi)
    resident = [
        (jax.device_put(p), jnp.int32(nb // READ_LEN))
        for p, ln, nb, _, _, _ in packed
    ]

    real_pl = stream_probe.pl

    def fake_pallas_call(kernel, grid_spec=None, out_shape=None, **kw):
        def run(scalars, key_lo, key_hi, counts3d, q, *sched):
            extra = jnp.sum(scalars).astype(jnp.uint32)
            extra = extra + q[0, ::4096].sum() + q[1, ::4096].sum()
            for s in sched:
                extra = extra + jnp.sum(s).astype(jnp.uint32)
            return counts3d.at[0, 0, 0].add(extra)

        return run

    class _PL:
        pallas_call = staticmethod(fake_pallas_call)

        def __getattr__(self, k):
            return getattr(real_pl, k)

    f_rtt = jax.jit(lambda x: x[0] + jnp.uint32(1))
    z = jnp.zeros(4, jnp.uint32)
    _ = int(jax.device_get(f_rtt(z)))
    rtt = 1e9
    for _ in range(5):
        t = time.perf_counter()
        _ = int(jax.device_get(f_rtt(z)))
        rtt = min(rtt, time.perf_counter() - t)
    log(f"rtt {rtt*1e3:.1f} ms")

    results = {}
    for name in ("prep", "full"):
        stream_probe.pl = _PL() if name == "prep" else real_pl
        step = functools.partial(
            mapper_mod.plane_chunk_step, config=config,
            max_probe=table.max_probe, seed=table.seed, block_probe=bp,
        )

        def window(key_lo, key_hi, counts, resident):
            total = jnp.uint32(0)
            for i in range(STEPS):
                p, nr = resident[i]
                counts, n_valid = step(key_lo, key_hi, counts, p, nr)
                total = total + n_valid
            return counts, total

        window_fn = jax.jit(window, donate_argnums=(2,))
        counts = jax.device_put(jnp.zeros(table.n_slots, dtype=jnp.uint32))
        t = time.perf_counter()
        counts, total = window_fn(key_lo, key_hi, counts, resident)
        km = int(jax.device_get(total))
        log(f"{name:5s} compile+first {time.perf_counter()-t:.1f}s")
        best = 1e9
        for _ in range(N_WINDOWS):
            t = time.perf_counter()
            counts, total = window_fn(key_lo, key_hi, counts, resident)
            _ = int(jax.device_get(total))
            best = min(best, time.perf_counter() - t - rtt)
        per = best / STEPS * 1e3
        results[name] = per
        log(f"{name:5s} {per:8.1f} ms/chunk ({km/STEPS/(best/STEPS)/1e6:.1f} Mk/s cum)")
    stream_probe.pl = real_pl
    log(f"kernel = {results['full'] - results['prep']:.1f} ms/chunk")


if __name__ == "__main__":
    main()
