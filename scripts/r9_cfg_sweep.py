"""Config sweep for the plane-layout stream kernel at the BENCH index
(2.7M keys -> 1M buckets): the auto cap heuristic (mean queries/block *
1.05) was fitted on the pre-plane kernel; the plane kernel's cost surface
moved (old kernel 50.8 vs new 36.6 ms/chunk at 4096-group/cap-2048, but
30 vs 35.5 at the bench 8192-group/cap-1792 config), so re-tune.

Usage: python scripts/r9_cfg_sweep.py "cap,streams,coarse" ...
  e.g.  python scripts/r9_cfg_sweep.py 1792,4,16 2048,4,16 2560,4,16
Env: BUF_MI=64, STEPS=8 (distinct chunks, CSE-free), N_WINDOWS=3.
coarse=0 keeps DEFAULT_COARSE (16).
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
N_WINDOWS = int(os.environ.get("N_WINDOWS", 3))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from bench import make_read_chunk
    from kmer_mapper_tpu import oracle
    from kmer_mapper_tpu.index import kmer_index as ki
    from kmer_mapper_tpu.io.readers import pack_for_device
    from kmer_mapper_tpu.models import mapper as mapper_mod
    from kmer_mapper_tpu.models.mapper import default_config
    from kmer_mapper_tpu.ops import stream_probe

    configs = []
    for a in sys.argv[1:]:
        cap, streams, coarse = (int(x) for x in a.split(","))
        configs.append((cap, streams, coarse))
    if not configs:
        configs = [(1792, 4, 16), (2048, 4, 16), (2560, 4, 16)]

    rng = np.random.default_rng(0)
    chunks = [make_read_chunk(rng, BUF) for _ in range(STEPS)]
    # the exact bench index construction (bench.py main)
    sample_codes = oracle.encode_bytes(chunks[0].bases[: READ_LEN * 10_000])
    sample_kmers = oracle.kmer_hashes(sample_codes, K)
    entry_kmers = np.unique(
        np.concatenate(
            [
                rng.integers(0, 1 << 62, 1_850_000, dtype=np.uint64),
                rng.choice(sample_kmers, 1_000_000),
            ]
        )
    )
    nodes = rng.integers(0, 3_000_000, len(entry_kmers)).astype(np.int32)
    index = ki.TpuKmerIndex.from_entries(entry_kmers, nodes)
    table = index.table
    bp = table.block_max_probe()
    log(
        f"index: {len(entry_kmers)} keys, {table.n_buckets} buckets, "
        f"max_probe {table.max_probe}, rounds mean {bp.mean():.2f}"
    )
    p_lo, p_hi = stream_probe.plane_keys(table.key_lo, table.key_hi)
    key_lo = jax.device_put(p_lo)
    key_hi = jax.device_put(p_hi)

    packed = [
        next(iter(pack_for_device(
            iter([c]), BUF, max(1024, BUF // 64), K, read_len=READ_LEN
        )))
        for c in chunks
    ]
    assert all(p[5] for p in packed)
    resident = [
        (jax.device_put(p), jnp.int32(nb // READ_LEN))
        for p, ln, nb, _, _, _ in packed
    ]

    f_rtt = jax.jit(lambda x: x[0] + jnp.uint32(1))
    z = jnp.zeros(4, jnp.uint32)
    _ = int(jax.device_get(f_rtt(z)))
    rtt = 1e9
    for _ in range(5):
        t = time.perf_counter()
        _ = int(jax.device_get(f_rtt(z)))
        rtt = min(rtt, time.perf_counter() - t)
    log(f"rtt {rtt*1e3:.1f} ms")

    default_coarse = stream_probe.DEFAULT_COARSE
    for cap, streams, coarse in configs:
        stream_probe.DEFAULT_COARSE = coarse or default_coarse
        config = default_config(
            k=K, buf=BUF, max_reads=max(1024, BUF // 64), read_len=READ_LEN,
            streams=streams, stream_cap=cap,
        )
        plan = stream_probe.plan_schedule(
            table.n_buckets, BUF // streams + 2 * cap, cap=cap,
            max_probe=table.max_probe, streams=streams, block_probe=bp,
        )
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
        n_k = int(jax.device_get(total))
        log(
            f"cap={cap} S={streams} coarse={stream_probe.DEFAULT_COARSE} "
            f"meta={plan.use_meta} t_pad={plan.t_pad}: compile+first "
            f"{time.perf_counter() - t:.1f}s"
        )
        best = 0.0
        for _ in range(N_WINDOWS):
            t = time.perf_counter()
            counts, total = window_fn(key_lo, key_hi, counts, resident)
            _ = int(jax.device_get(total))
            el = time.perf_counter() - t - rtt
            best = max(best, n_k / el)
        log(f"cap={cap} S={streams} coarse={stream_probe.DEFAULT_COARSE}: "
            f"{best/1e6:.1f} Mk/s")
    stream_probe.DEFAULT_COARSE = default_coarse


if __name__ == "__main__":
    main()
