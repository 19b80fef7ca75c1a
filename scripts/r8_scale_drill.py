"""Human-scale index drill (round 4): build, store, load, and map against a
~100-300M-entry index — the reference's production regime (Readme.md:17-20
sizes its memory guidance for human whole-genome indexes).

Phases (each timed; host peak RSS checkpointed):
  1. synthesize N unique kmers (half drawn from the read sample so the
     mapping has real hits), build TpuKmerIndex.from_entries
  2. save .tpuidx (what `convert-index` writes) + load it back
  3. device: ship the table, compile the production fixed-read-length step
     (auto group widening + auto cap), run CSE-free distinct-chunk windows
  4. node-count finalization (host gathers + bincount over all entries)

Usage: python scripts/r8_scale_drill.py [N_KEYS_MILLIONS=150]
Env: STEPS (default 4: distinct buffer-sized chunks resident at once),
     BUF_MI (default: the production `_buf_floor` policy — 128 Mi when the
     estimated single-chip schedule needs group >= 4, else 64 Mi),
     STREAMS (default: production policy), SKIP_DEVICE=1 (host phases only),
     REUSE_INDEX=1 (load /tmp/drill.tpuidx.npz from a prior run instead of
     rebuilding — only comparable across runs with the same BUF_MI, since
     half the keys are sampled from the first chunk).
Measured here (150M keys): group=4 era (pre self-contained schedule):
64 Mi = 110.4, 128 Mi = 127.5, STREAMS=2 (widened groups to 8) = 81.2.
group=1 era (self-contained schedule entries, round-5 session 5):
128 Mi S=1/2/4 = 158.0/140.0/117.8 Mk/s — hence the production policy
(S=1, 128 Mi floor) for >= 2^25-bucket tables.
"""
import functools
import os
import resource
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

K = 31
READ_LEN = 151
BUF_ENV = int(os.environ.get("BUF_MI", 0)) << 20  # 0 = production floor
STEPS = int(os.environ.get("STEPS", 4))
N_WINDOWS = 3


def log(m):
    print(m, file=sys.stderr, flush=True)


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    n_keys = (int(sys.argv[1]) if len(sys.argv) > 1 else 150) * 1_000_000
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from bench import make_read_chunk
    from kmer_mapper_tpu import oracle, pipeline
    from kmer_mapper_tpu.index import kmer_index as ki
    from kmer_mapper_tpu.io.readers import pack_for_device
    from kmer_mapper_tpu.models.mapper import (KmerMapper, default_config,
                                               plane_chunk_step)
    from kmer_mapper_tpu.ops import stream_probe

    from kmer_mapper_tpu.index import layout

    rng = np.random.default_rng(0)

    # the production buffer floor, estimated pre-build (mirrors
    # pipeline._buf_floor's human-scale bucket-count gate; build_table's
    # bucket count is deterministic in n_keys up to rare chain-bound growth)
    n_buckets_est = max(4, layout._next_pow2(
        int(np.ceil(n_keys / (layout.BUCKET_KEYS * layout.DEFAULT_MAX_LOAD)))
    ))
    floor_est = (128 if n_buckets_est >= 1 << 25 else 64) << 20
    BUF = BUF_ENV or floor_est
    log(f"buffer: {BUF >> 20} Mi ({'env' if BUF_ENV else 'production floor'})")

    # --- phase 1: keys + build ------------------------------------------------
    chunks = [make_read_chunk(rng, BUF) for _ in range(STEPS)]
    path = "/tmp/drill.tpuidx.npz"
    if os.environ.get("REUSE_INDEX") == "1" and os.path.exists(path):
        t = time.perf_counter()
        index = ki.TpuKmerIndex.from_file(path)
        log(
            f"REUSED index from {path} in {time.perf_counter() - t:.1f}s: "
            f"{index.n_unique} keys (RSS {rss_gb():.1f} GB)"
        )
        t_build = t_save = sz = t_load = 0.0
        table = index.table
        reused = True
    else:
        reused = False
        sample_codes = oracle.encode_bytes(chunks[0].bases[: READ_LEN * 100_000])
        sample_kmers = oracle.kmer_hashes(sample_codes, K)
        t = time.perf_counter()
        entry_kmers = np.unique(
            np.concatenate(
                [
                    rng.integers(0, 1 << 62, n_keys * 3 // 4, dtype=np.uint64),
                    rng.choice(sample_kmers, n_keys // 2),
                ]
            )
        )[:n_keys]
        t_gen = time.perf_counter() - t
        nodes = rng.integers(0, 30_000_000, len(entry_kmers)).astype(np.int32)
        log(f"keys: {len(entry_kmers)} unique in {t_gen:.1f}s (RSS {rss_gb():.1f} GB)")

        t = time.perf_counter()
        index = ki.TpuKmerIndex.from_entries(entry_kmers, nodes)
        t_build = time.perf_counter() - t
        table = index.table
    bp = table.block_max_probe()
    log(
        f"BUILD {t_build:.1f}s: {table.n_buckets} buckets, table "
        f"{table.nbytes / 1e9:.2f} GB, max_probe={table.max_probe}, "
        f"block rounds mean={bp.mean():.2f} (RSS {rss_gb():.1f} GB)"
    )

    # --- phase 2: .tpuidx save/load (the convert-index artifact) -------------
    if not reused:
        t = time.perf_counter()
        index.to_file(path)
        t_save = time.perf_counter() - t
        sz = os.path.getsize(path) / 1e9
        t = time.perf_counter()
        index2 = ki.TpuKmerIndex.from_file(path)
        t_load = time.perf_counter() - t
        assert index2.n_unique == index.n_unique
        log(
            f"SAVE {t_save:.1f}s ({sz:.2f} GB on disk), LOAD {t_load:.1f}s "
            f"(RSS {rss_gb():.1f} GB)"
        )
        del index2

    # --- feasibility report: single-chip schedule + per-shard re-plans -------
    floor, paged = pipeline._buf_floor(index, K)
    g1 = stream_probe.min_feasible_group(table.n_buckets)
    log(
        f"schedule: paged={paged}, min feasible group (1 chip) = {g1}, "
        f"production buf floor = {floor >> 20} Mi"
        + (" [!= drill buffer]" if not BUF_ENV and floor != BUF else "")
    )
    for shards in (2, 4, 8):
        n_local = table.n_buckets // shards
        g = stream_probe.min_feasible_group(n_local)
        plan = stream_probe.plan_schedule(
            n_local, 1 << 25, cap=512, max_probe=table.max_probe, group=g
        )
        log(
            f"  {shards}-way shard: {n_local} buckets/shard, group={g}, "
            f"mode={'meta' if plan.use_meta else 'paged'}"
        )

    if os.environ.get("SKIP_DEVICE") == "1":
        return

    # --- phase 3: device mapping windows (production config) -----------------
    streams = int(
        os.environ.get("STREAMS")
        or pipeline._pick_streams(READ_LEN, paged, BUF, K, table.n_buckets)
    )
    config = default_config(
        k=K, buf=BUF, max_reads=max(1024, BUF // 64), read_len=READ_LEN,
        streams=streams, group=int(os.environ.get("GROUP", 0)),
    )
    mapper = KmerMapper(index, config)  # resolves auto group + cap
    config = mapper.config
    log(
        f"config: streams={config.streams} group={config.group} "
        f"cap={config.stream_cap}"
    )
    del mapper  # windows run manually (one jit over STEPS distinct chunks)

    use_plane = config.probe == "stream"
    packed = [
        next(iter(pack_for_device(
            iter([c]), config.buf, config.max_reads, K,
            read_len=READ_LEN if use_plane else 0,
        )))
        for c in chunks
    ]
    t = time.perf_counter()
    p_lo, p_hi = stream_probe.plane_keys(
        table.key_lo, table.key_hi, group=max(1, config.group)
    )
    key_lo = jax.device_put(p_lo)
    key_hi = jax.device_put(p_hi)
    key_lo.block_until_ready()
    log(f"table -> device: {time.perf_counter() - t:.1f}s (tunnel-bound here)")
    counts = jax.device_put(jnp.zeros(table.n_slots, dtype=jnp.uint32))
    resident = [
        (jax.device_put(p), jnp.int32(nb // READ_LEN))
        for p, ln, nb, _, _, _ in packed
    ]
    step = functools.partial(
        plane_chunk_step, config=config, max_probe=table.max_probe,
        seed=table.seed, block_probe=table.block_max_probe(),
    )

    def window(key_lo, key_hi, counts, resident):
        total = jnp.uint32(0)
        for i in range(STEPS):
            p, nr = resident[i]
            counts, n_valid = step(key_lo, key_hi, counts, p, nr)
            total = total + n_valid
        return counts, total

    window_fn = jax.jit(window, donate_argnums=(2,))
    t = time.perf_counter()
    counts, total = window_fn(key_lo, key_hi, counts, resident)
    kmers_per_window = int(jax.device_get(total))
    log(f"compile+first window: {time.perf_counter() - t:.1f}s")
    best = 0.0
    for w in range(N_WINDOWS):
        t = time.perf_counter()
        counts, total = window_fn(key_lo, key_hi, counts, resident)
        _ = int(jax.device_get(total))
        r = kmers_per_window / (time.perf_counter() - t)
        best = max(best, r)
        log(f"window {w}: {r / 1e6:.1f} Mkmers/s")

    # --- phase 4: finalization ------------------------------------------------
    t = time.perf_counter()
    slot_counts = stream_probe.plane_to_slot(
        np.asarray(jax.device_get(counts)),
        table.n_buckets,
        stream_probe.plane_gpb(table.n_buckets, max(1, config.group)),
    )
    t_fetch = time.perf_counter() - t
    t = time.perf_counter()
    node_counts = index.node_counts(slot_counts)
    t_final = time.perf_counter() - t
    log(
        f"finalize: counts fetch {t_fetch:.1f}s ({table.n_slots * 4 / 1e9:.1f} GB,"
        f" tunnel-bound here), node_counts {t_final:.1f}s, "
        f"{int(node_counts.sum())} node hits (RSS {rss_gb():.1f} GB)"
    )
    print(
        f"RESULT n_keys={index.n_unique} buckets={table.n_buckets} "
        f"table_gb={table.nbytes / 1e9:.2f} build_s={t_build:.1f} "
        f"save_s={t_save:.1f} load_s={t_load:.1f} disk_gb={sz:.2f} "
        f"group={config.group} streams={config.streams} cap={config.stream_cap} "
        f"paged={paged} best={best / 1e6:.1f} Mk/s rss_gb={rss_gb():.1f}"
    )


if __name__ == "__main__":
    main()
