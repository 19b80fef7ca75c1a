"""Stage dissection of the PRODUCTION config (64 Mi, 4-stream plane path).

Round-3 session 6: at the 368.2 Mk/s headline the working cost model was
"sorts ~84 + kernel ~30 + schedule-prep/offsets ~25-30 + hash ~6 ms" — this
script measures that split for real, with the same monkeypatch-attribution
technique as r3_lt_dissect.py (fakes ride the REAL code path, so there is no
drift between what is measured and what ships):

  hash  stream_probe_count_mixed -> fake consuming (m_lo, m_hi) full sums
        (plane_hash_mixed is elementwise; slices would let XLA skip work)
  sort  stream_count -> fake consuming strided slices of the S sorted
        segments (a sort is a barrier; block_offsets is DCE'd)
  off   + consuming the per-stream block offsets
  prep  pl.pallas_call -> fake consuming scalars/schedule (build runs)
  full  unpatched

Windows chain STEPS=8 DISTINCT device-resident chunks (the CSE trap).

Usage: python scripts/r5_budget.py [N_UNIQUE_MILLIONS=4] [STREAMS=4]
Env: KMT_BENCH_BUF (bytes, default 64Mi), STEPS (default 8).
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

K = 31
READ_LEN = 151
BUF = int(os.environ.get("KMT_BENCH_BUF", 64 << 20))
STEPS = int(os.environ.get("STEPS", 8))
N_WINDOWS = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    n_unique_m = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    streams = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from kmer_mapper_tpu import oracle
    from kmer_mapper_tpu.index import kmer_index as ki
    from kmer_mapper_tpu.io.readers import pack_for_device
    from kmer_mapper_tpu.models import mapper as mapper_mod
    from kmer_mapper_tpu.models.mapper import auto_stream_cap, default_config
    from kmer_mapper_tpu.ops import stream_probe
    from bench import make_read_chunk

    rng = np.random.default_rng(0)
    chunks = [make_read_chunk(rng, BUF) for _ in range(STEPS)]
    sample_kmers = oracle.kmer_hashes(
        oracle.encode_bytes(chunks[0].bases[: READ_LEN * 5000]), K
    )
    n_unique = n_unique_m * 1_000_000
    t = time.perf_counter()
    entry_kmers = np.unique(
        np.concatenate(
            [
                rng.integers(0, 1 << 62, n_unique // 2, dtype=np.uint64),
                rng.choice(sample_kmers, n_unique // 2),
            ]
        )
    )
    nodes = rng.integers(0, 3_000_000, len(entry_kmers)).astype(np.int32)
    index = ki.TpuKmerIndex.from_entries(entry_kmers, nodes)
    table = index.table
    bp = table.block_max_probe()
    cap = auto_stream_cap(
        BUF // streams, table.n_buckets, READ_LEN, streams=streams
    )
    plan = stream_probe.plan_schedule(
        table.n_buckets, 0, cap=cap, max_probe=table.max_probe,
        block_probe=np.asarray(bp), streams=streams,
    )
    log(
        f"{len(entry_kmers)} keys -> {table.n_buckets} buckets "
        f"({table.n_buckets // 128} blocks), max_probe={table.max_probe}, "
        f"rounds mean={np.asarray(bp).mean():.2f}, cap={cap}, "
        f"built {time.perf_counter() - t:.1f}s"
    )
    n_per_seg = -(-(BUF // READ_LEN) * (READ_LEN - K + 1) // streams)
    t_pad = plan.max_rounds * ((n_per_seg * streams) // cap + 1) + 2 * plan.sum_rounds
    log(
        f"plan: max_rounds={plan.max_rounds} sum_rounds={plan.sum_rounds} "
        f"t_pad~{t_pad} use_meta={plan.use_meta}"
    )
    config = default_config(
        k=K, buf=BUF, max_reads=BUF // 64, read_len=READ_LEN,
        stream_cap=cap, streams=streams, probe="stream",
    )
    packed = [
        next(iter(pack_for_device(
            iter([c]), config.buf, config.max_reads, K, read_len=READ_LEN
        )))
        for c in chunks
    ]
    assert all(p[5] for p in packed)
    key_lo = jax.device_put(table.key_lo)
    key_hi = jax.device_put(table.key_hi)
    resident = [
        (jax.device_put(p), jnp.int32(nb // READ_LEN))
        for p, ln, nb, _, _, _ in packed
    ]

    real_spcm = stream_probe.stream_probe_count_mixed
    real_sc = stream_probe.stream_count
    real_pl = stream_probe.pl

    def fake_spcm(key_lo, key_hi, counts, m_lo, m_hi, *a, **kw):
        # full sums: the plane hash is elementwise-derived from the packed
        # words, so strided slices would let XLA compute only sampled combos
        return counts.at[0].add(jnp.sum(m_lo) + jnp.sum(m_hi))

    def fake_sc_sort(key_lo, key_hi, counts, sm_lo, sm_hi, off, *a, **kw):
        return counts.at[0].add(sm_lo[::4096].sum() + sm_hi[::4096].sum())

    def fake_sc_off(key_lo, key_hi, counts, sm_lo, sm_hi, off, *a, **kw):
        return counts.at[0].add(
            sm_lo[::4096].sum() + sm_hi[::4096].sum()
            + jnp.sum(off).astype(jnp.uint32)
        )

    def fake_pallas_call(kernel, grid_spec=None, out_shape=None, **kw):
        def run(scalars, key_lo, key_hi, counts2d, q, *sched):
            extra = jnp.sum(scalars).astype(jnp.uint32)  # incl. meta schedule
            extra = extra + q[0, ::4096].sum() + q[1, ::4096].sum()
            for s in sched:  # paged mode: HBM schedule pages
                extra = extra + jnp.sum(s).astype(jnp.uint32)
            return counts2d.at[0, 0].add(extra)

        return run

    class _PL:
        pallas_call = staticmethod(fake_pallas_call)

        def __getattr__(self, k):
            return getattr(real_pl, k)

    variants = {
        "hash": lambda: setattr(
            stream_probe, "stream_probe_count_mixed", fake_spcm
        ),
        "sort": lambda: setattr(stream_probe, "stream_count", fake_sc_sort),
        "off": lambda: setattr(stream_probe, "stream_count", fake_sc_off),
        "prep": lambda: setattr(stream_probe, "pl", _PL()),
        "full": lambda: None,
    }

    def restore():
        stream_probe.stream_probe_count_mixed = real_spcm
        stream_probe.stream_count = real_sc
        stream_probe.pl = real_pl
        assert mapper_mod.stream_probe is stream_probe

    f_rtt = jax.jit(lambda x: x[0] + jnp.uint32(1))
    z = jnp.zeros(4, jnp.uint32)
    _ = int(jax.device_get(f_rtt(z)))
    rtt = 1e9
    for _ in range(5):
        t = time.perf_counter()
        _ = int(jax.device_get(f_rtt(z)))
        rtt = min(rtt, time.perf_counter() - t)
    log(f"rtt {rtt * 1e3:.1f} ms")

    prev = 0.0
    results = {}
    for name, apply in variants.items():
        restore()
        apply()
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
        log(f"{name:5s} compile+first {time.perf_counter() - t:.1f}s")
        best = 1e9
        for _ in range(N_WINDOWS):
            t = time.perf_counter()
            counts, total = window_fn(key_lo, key_hi, counts, resident)
            _ = int(jax.device_get(total))
            best = min(best, time.perf_counter() - t - rtt)
        per = best / STEPS * 1e3
        results[name] = per
        log(
            f"{name:5s} {per:8.1f} ms/chunk  (+{per - prev:7.1f} ms)  "
            f"[{km / STEPS / (best / STEPS) / 1e6:.1f} Mk/s cum]"
        )
        prev = per
    restore()
    print("RESULT " + " ".join(f"{k}={v:.1f}ms" for k, v in results.items()))


if __name__ == "__main__":
    main()
