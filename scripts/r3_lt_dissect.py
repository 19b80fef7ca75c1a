"""Stage dissection for the LARGE-table (paged-schedule) stream path.

Recovered E-sweep (v5e, 14.2M keys -> 4.19M buckets, paged schedule):
16Mi aug=1 150.8 / aug=2 170.5 / group=2 166.6 Mk/s; 64Mi aug=2 214.3 but
64Mi aug=1 collapsed to 11.5 Mk/s. This script attributes the per-chunk time
to stages by MONKEYPATCHING the real path (so there is no drift between the
measured code and production):

  hash  stream_probe_count -> fake: rolling hash + read_len slicing only
  sort  stream_count -> fake consuming sorted arrays (offsets DCE'd)
  off   stream_count -> fake consuming sorted arrays + block offsets
  prep  pl.pallas_call -> fake: everything incl. schedule build, no kernel
  full  unpatched

Fakes consume full reductions of elementwise-derived arrays (slices would let
XLA's slice-sinking skip the work) and strided slices of sort outputs (a sort
is a barrier, it cannot be partially evaluated); the added reduction cost is
<1 ms/chunk at 64Mi.

Usage: r3_lt_dissect.py [N_UNIQUE_MILLIONS=16] [AUG=1] [CAP=0] [GROUP=0]
Env: KMT_BENCH_BUF (bytes, default 64Mi), STEPS (default 4 distinct chunks).
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
STEPS = int(os.environ.get("STEPS", 4))
N_WINDOWS = 2


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    n_unique_m = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    aug = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cap_arg = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    grp = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from kmer_mapper_tpu import oracle
    from kmer_mapper_tpu.index import layout
    from kmer_mapper_tpu.io.readers import pack_for_device
    from kmer_mapper_tpu.models import mapper as mapper_mod
    from kmer_mapper_tpu.models.mapper import auto_stream_cap, default_config
    from kmer_mapper_tpu.ops import stream_probe
    from bench import make_read_chunk

    rng = np.random.default_rng(0)
    chunks = [make_read_chunk(rng, BUF) for _ in range(STEPS)]
    sample_codes = oracle.encode_bytes(chunks[0].bases[: READ_LEN * 20000])
    sample_kmers = oracle.kmer_hashes(sample_codes, K)
    n_unique = n_unique_m * 1_000_000
    t = time.perf_counter()
    entry_kmers = np.unique(
        np.concatenate(
            [
                rng.integers(0, 1 << 62, n_unique * 3 // 4, dtype=np.uint64),
                rng.choice(sample_kmers, n_unique // 4),
            ]
        )
    )
    table = layout.build_table(entry_kmers)
    bp = table.block_max_probe()
    log(
        f"{len(entry_kmers)} keys -> {table.n_buckets} buckets, "
        f"max_probe={table.max_probe}, rounds mean={bp.mean():.2f}, "
        f"built {time.perf_counter()-t:.1f}s"
    )
    cap = cap_arg or auto_stream_cap(BUF, table.n_buckets, READ_LEN)
    config = default_config(
        k=K, buf=BUF, max_reads=BUF // 64, read_len=READ_LEN,
        stream_cap=cap, aug=aug, group=grp,
    )
    log(f"cap={cap} aug={aug} group={grp} buf={BUF >> 20}Mi steps={STEPS}")

    packed = [
        next(iter(pack_for_device(iter([c]), config.buf, config.max_reads, K)))
        for c in chunks
    ]
    if aug > 1:
        key_lo, key_hi = (jax.device_put(a) for a in table.aug_keys(aug))
    else:
        key_lo = jax.device_put(table.key_lo)
        key_hi = jax.device_put(table.key_hi)
    resident = [
        (jax.device_put(p), jax.device_put(ln), jnp.int32(nb))
        for p, ln, nb, _, _ in packed
    ]

    real_spc = stream_probe.stream_probe_count
    real_sc = stream_probe.stream_count
    real_pl = stream_probe.pl

    def fake_spc(key_lo, key_hi, counts, q_lo, q_hi, valid, *a, **kw):
        # full reductions: hash outputs are elementwise-derived, slices would
        # let XLA compute only the sliced windows
        return counts.at[0].add(
            jnp.sum(q_lo) + jnp.sum(q_hi) + jnp.sum(valid.astype(jnp.uint32))
        )

    def fake_sc_sort(key_lo, key_hi, counts, sm_lo, sm_hi, off, *a, **kw):
        return counts.at[0].add(
            sm_lo[::4096].sum() + sm_hi[::4096].sum()
        )

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
        "hash": lambda: setattr(stream_probe, "stream_probe_count", fake_spc),
        "sort": lambda: setattr(stream_probe, "stream_count", fake_sc_sort),
        "off": lambda: setattr(stream_probe, "stream_count", fake_sc_off),
        "prep": lambda: setattr(stream_probe, "pl", _PL()),
        "full": lambda: None,
    }

    def restore():
        stream_probe.stream_probe_count = real_spc
        stream_probe.stream_count = real_sc
        stream_probe.pl = real_pl
        # mapper binds stream_probe.stream_probe_count by module attribute —
        # confirm, else the hash patch is a no-op
        assert mapper_mod.stream_probe is stream_probe

    f_rtt = jax.jit(lambda x: x[0] + jnp.uint32(1))
    z = jnp.zeros(4, jnp.uint32)
    _ = int(jax.device_get(f_rtt(z)))
    rtt = 1e9
    for _ in range(5):
        t = time.perf_counter()
        _ = int(jax.device_get(f_rtt(z)))
        rtt = min(rtt, time.perf_counter() - t)
    log(f"rtt {rtt*1e3:.1f} ms")

    prev = 0.0
    results = {}
    for name, apply in variants.items():
        restore()
        apply()
        step = functools.partial(
            mapper_mod.chunk_step, config=config, max_probe=table.max_probe,
            seed=table.seed, block_probe=bp,
        )

        def window(key_lo, key_hi, counts, resident):
            total = jnp.uint32(0)
            for i in range(STEPS):
                p, ln, nb = resident[i]
                counts, n_valid = step(key_lo, key_hi, counts, p, ln, nb)
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
        log(f"{name:5s} {per:8.1f} ms/chunk  (+{per-prev:7.1f} ms)  "
            f"[{km/STEPS/ (best/STEPS) /1e6:.1f} Mk/s cum]")
        prev = per
    restore()
    print("RESULT " + " ".join(f"{k}={v:.1f}ms" for k, v in results.items()))


if __name__ == "__main__":
    main()
