"""Stream (sort + MXU one-hot) probe kernel vs oracle — interpreter mode on CPU.

The same kernel runs compiled on TPU (bench.py measures it); these tests pin
its semantics bit-exactly: hits, misses, heavy duplicates (poly-A style skew),
invalid-window masking, chain wrapping, accumulation across calls, and the
full chunk step in stream mode.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from kmer_mapper_tpu import oracle
from kmer_mapper_tpu.index import kmer_index as ki
from kmer_mapper_tpu.index import layout
from kmer_mapper_tpu.models.mapper import KmerMapper, MapperConfig
from kmer_mapper_tpu.ops import encode, stream_probe
from kmer_mapper_tpu.ops.u32hash import split_u64


def _run_stream(table, queries, valid, counts0=None, cap=512, aug=1, **kw):
    qlo, qhi = split_u64(queries)
    # the kernel consumes plane-layout keys + plane-order counts; tests keep
    # the external slot order at the edges (stream_probe.plane_* helpers)
    counts = jnp.asarray(
        stream_probe.slot_to_plane(
            counts0 if counts0 is not None else np.zeros(table.n_slots, np.uint32),
            table.n_buckets,
        )
    )
    key_lo, key_hi = stream_probe.plane_keys(
        *(table.aug_keys(aug) if aug > 1 else (table.key_lo, table.key_hi))
    )
    out = stream_probe.stream_probe_count(
        jnp.asarray(key_lo),
        jnp.asarray(key_hi),
        counts,
        jnp.asarray(qlo),
        jnp.asarray(qhi),
        jnp.asarray(valid),
        table.seed,
        table.max_probe,
        cap=cap,
        interpret=True,
        **kw,
    )
    return stream_probe.plane_to_slot(np.asarray(out), table.n_buckets)


def _expect(table, queries, valid, counts0=None):
    slots = layout.query_table(table, np.asarray(queries)[valid])
    base = counts0 if counts0 is not None else np.zeros(table.n_slots, np.uint32)
    return base + np.bincount(slots[slots >= 0], minlength=table.n_slots).astype(
        np.uint32
    )


def test_stream_probe_hits_misses_and_masking():
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << 62, 20000, dtype=np.uint64))
    table = layout.build_table(keys)
    queries = np.concatenate(
        [rng.choice(keys, 4000), rng.integers(0, 1 << 62, 3000, dtype=np.uint64)]
    )
    rng.shuffle(queries)
    valid = rng.random(len(queries)) < 0.85
    np.testing.assert_array_equal(
        _run_stream(table, queries, valid), _expect(table, queries, valid)
    )


def test_stream_probe_heavy_duplicates_skew():
    """A single kmer repeated far beyond the kernel's per-tile capacity (the
    poly-A case) must still count exactly (dynamic per-block iteration)."""
    rng = np.random.default_rng(1)
    keys = np.unique(rng.integers(0, 1 << 62, 2000, dtype=np.uint64))
    table = layout.build_table(keys)
    queries = np.concatenate(
        [np.full(5000, keys[3], np.uint64), rng.choice(keys, 500)]
    )
    valid = np.ones(len(queries), bool)
    got = _run_stream(table, queries, valid, cap=256)
    expect = _expect(table, queries, valid)
    np.testing.assert_array_equal(got, expect)
    slot3 = layout.query_table(table, keys[3:4])[0]
    assert got[slot3] >= 5000


def test_stream_probe_accumulates_into_existing_counts():
    rng = np.random.default_rng(2)
    keys = np.unique(rng.integers(0, 1 << 62, 5000, dtype=np.uint64))
    table = layout.build_table(keys)
    counts0 = rng.integers(0, 7, table.n_slots).astype(np.uint32)
    queries = rng.choice(keys, 2000)
    valid = np.ones(len(queries), bool)
    np.testing.assert_array_equal(
        _run_stream(table, queries, valid, counts0=counts0.copy()),
        _expect(table, queries, valid, counts0=counts0),
    )


@pytest.mark.parametrize("aug", [1, 2, 3])
def test_stream_probe_chained_table(aug):
    """High-load table with wrapped collision chains: keys stored at probe
    offsets > 0 are found via the rolled-tile matmuls — and, with chain
    augmentation, via the widened per-row compare (scheduled rounds stride
    by ``aug``)."""
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 1 << 62, 4000, dtype=np.uint64))
    n_buckets = layout._next_pow2(int(np.ceil(len(keys) / layout.BUCKET_KEYS / 0.8)))
    table = layout.build_table(keys, n_buckets=n_buckets)
    assert table.max_probe > 1
    queries = np.concatenate([keys, rng.integers(0, 1 << 62, 1000, dtype=np.uint64)])
    valid = np.ones(len(queries), bool)
    np.testing.assert_array_equal(
        _run_stream(table, queries, valid, aug=aug), _expect(table, queries, valid)
    )


@pytest.mark.parametrize("aug", [2, 4])
def test_stream_probe_augmented_with_block_probe(aug):
    """Chain augmentation combined with per-block round bounds: blocks with
    bound <= aug get exactly one scheduled round, deeper blocks stride."""
    rng = np.random.default_rng(13)
    keys = np.unique(rng.integers(0, 1 << 62, 6000, dtype=np.uint64))
    n_buckets = layout._next_pow2(int(np.ceil(len(keys) / layout.BUCKET_KEYS / 0.9)))
    table = layout.build_table(keys, n_buckets=n_buckets)
    queries = np.concatenate([keys, rng.integers(0, 1 << 62, 500, dtype=np.uint64)])
    valid = rng.random(len(queries)) < 0.9
    np.testing.assert_array_equal(
        _run_stream(
            table, queries, valid, aug=aug,
            block_probe=table.block_max_probe(),
        ),
        _expect(table, queries, valid),
    )


def test_aug_keys_layout():
    """aug_keys column group h must hold the keys of chain_next(b, h)."""
    rng = np.random.default_rng(21)
    keys = np.unique(rng.integers(0, 1 << 62, 3000, dtype=np.uint64))
    table = layout.build_table(keys)
    for aug in (2, 3):
        alo, ahi = table.aug_keys(aug)
        b = np.arange(table.n_buckets)
        for h in range(aug):
            nb = layout.chain_next(b, h, table.n_buckets)
            np.testing.assert_array_equal(
                alo[:, h * layout.BUCKET_KEYS : (h + 1) * layout.BUCKET_KEYS],
                table.key_lo[nb],
            )
            np.testing.assert_array_equal(
                ahi[:, h * layout.BUCKET_KEYS : (h + 1) * layout.BUCKET_KEYS],
                table.key_hi[nb],
            )


def test_stream_probe_tiny_table():
    keys = np.array([5, 9, 1 << 40], dtype=np.uint64)
    table = layout.build_table(keys)
    queries = np.array([5, 5, 9, 123, 1 << 40], dtype=np.uint64)
    valid = np.ones(5, bool)
    np.testing.assert_array_equal(
        _run_stream(table, queries, valid, cap=8), _expect(table, queries, valid)
    )


def _pack_reads(reads, config):
    flat = "".join(reads)
    bases = np.frombuffer(flat.encode(), dtype=np.uint8)
    packed, n_invalid = encode.host_encode_pack(bases, config.packed_words)
    lengths = np.zeros(config.max_reads, dtype=np.uint16)
    lengths[: len(reads)] = [len(r) for r in reads]
    return packed, lengths, len(flat), n_invalid


@pytest.mark.parametrize("revcomp", [False, True])
def test_chunk_step_stream_mode_matches_oracle(revcomp):
    rng = np.random.default_rng(7)
    k = 9
    reads = ["".join(rng.choice(list("ACGT"), rng.integers(6, 50))) for _ in range(80)]
    read_codes = [oracle.encode_string(r) for r in reads]
    fwd = oracle.kmer_hashes_ragged(
        np.concatenate(read_codes), np.array([len(r) for r in reads]), k
    )
    pool = np.concatenate([fwd, oracle.revcomp_hash(fwd, k)])
    entry_kmers = np.concatenate(
        [rng.choice(pool, 150), rng.integers(0, 4**k, 60, dtype=np.uint64)]
    )
    nodes = rng.integers(0, 70, len(entry_kmers)).astype(np.int32)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 997)
    tpu = ki.TpuKmerIndex.from_arrays(arrays)

    config = MapperConfig(
        k=k, buf=8192, max_reads=256, revcomp=revcomp, probe="stream", interpret=True
    )
    mapper = KmerMapper(tpu, config)
    mapper.map_chunk(*_pack_reads(reads, config))
    got = mapper.node_counts()

    queries = np.concatenate([fwd, oracle.revcomp_hash(fwd, k)]) if revcomp else fwd
    expect = oracle.map_kmers_to_index(arrays, queries)
    np.testing.assert_array_equal(got, expect)


def test_chunk_step_group_config_matches_oracle():
    """MapperConfig.group plumbs block-group widening through chunk_step;
    counts stay oracle-exact."""
    rng = np.random.default_rng(21)
    k = 9
    reads = ["".join(rng.choice(list("ACGT"), rng.integers(6, 50))) for _ in range(80)]
    read_codes = [oracle.encode_string(r) for r in reads]
    fwd = oracle.kmer_hashes_ragged(
        np.concatenate(read_codes), np.array([len(r) for r in reads]), k
    )
    entry_kmers = np.concatenate(
        [rng.choice(fwd, 150), rng.integers(0, 4**k, 60, dtype=np.uint64)]
    )
    nodes = rng.integers(0, 70, len(entry_kmers)).astype(np.int32)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 997)
    tpu = ki.TpuKmerIndex.from_arrays(arrays)

    config = MapperConfig(
        k=k, buf=8192, max_reads=256, probe="stream", interpret=True, group=2
    )
    mapper = KmerMapper(tpu, config)
    mapper.map_chunk(*_pack_reads(reads, config))
    np.testing.assert_array_equal(
        mapper.node_counts(), oracle.map_kmers_to_index(arrays, fwd)
    )


@pytest.mark.parametrize("streams", [2, 3, 4])
def test_stream_probe_multistream_matches_oracle(streams):
    """streams > 1 on UNSORTED queries (the ragged-path / map_hashes layout):
    the array splits into S independently sorted segments served by
    multi-stream kernel tiles — counts must stay oracle-exact, including
    invalid masking, chained tables, and per-block round bounds."""
    rng = np.random.default_rng(31)
    keys = np.unique(rng.integers(0, 1 << 62, 6000, dtype=np.uint64))
    n_buckets = layout._next_pow2(int(np.ceil(len(keys) / layout.BUCKET_KEYS / 0.9)))
    table = layout.build_table(keys, n_buckets=n_buckets)
    assert table.max_probe > 1
    # odd length so segment splits are uneven; heavy duplicates in one segment
    queries = np.concatenate(
        [
            rng.choice(keys, 3000),
            np.full(1200, keys[7], np.uint64),
            rng.integers(0, 1 << 62, 1501, dtype=np.uint64),
        ]
    )
    valid = rng.random(len(queries)) < 0.85
    np.testing.assert_array_equal(
        _run_stream(
            table, queries, valid, cap=256, streams=streams,
            block_probe=table.block_max_probe(),
        ),
        _expect(table, queries, valid),
    )


@pytest.mark.parametrize("streams", [1, 3])
def test_rel_bound_entries_adversarial_windows(streams, monkeypatch):
    """The self-contained entries' packed rel-bound masks under adversarial
    window shapes: one bucket's window spans MANY cap-sized tiles (rel_lo
    only nonzero on the first, rel_hi < cap on the last), tiny cap keeps
    starts lane-unaligned, the schedule is FORCED PAGED across several
    pages, and uneven segments make per-stream windows disagree per group —
    counts must stay bit-exact vs the oracle."""
    from kmer_mapper_tpu.ops import stream_probe as sp

    rng = np.random.default_rng(97)
    keys = np.unique(rng.integers(0, 1 << 62, 5000, dtype=np.uint64))
    table = layout.build_table(keys)
    # extreme skew: a handful of hot keys dominate -> multi-tile windows
    hot = rng.choice(keys, 5)
    queries = np.concatenate(
        [
            np.repeat(hot, 700),  # 3500 duplicates over 5 buckets
            rng.choice(keys, 900),
            rng.integers(0, 1 << 62, 601, dtype=np.uint64),
        ]
    )
    rng.shuffle(queries)
    valid = rng.random(len(queries)) < 0.9
    monkeypatch.setattr(sp, "PAGE", 64)  # many pages at this entry count
    monkeypatch.setattr(sp, "SMEM_I32_BUDGET", 400)  # force paged mode
    out = _run_stream(
        table, queries, valid, cap=128, streams=streams,
        block_probe=table.block_max_probe(),
    )
    np.testing.assert_array_equal(out, _expect(table, queries, valid))


def test_chunk_step_ragged_multistream_matches_oracle():
    """MapperConfig.streams > 1 on the RAGGED step (read_len == 0): same
    counts as the oracle and as the single-stream step."""
    rng = np.random.default_rng(33)
    k = 9
    reads = ["".join(rng.choice(list("ACGT"), rng.integers(6, 50))) for _ in range(80)]
    read_codes = [oracle.encode_string(r) for r in reads]
    fwd = oracle.kmer_hashes_ragged(
        np.concatenate(read_codes), np.array([len(r) for r in reads]), k
    )
    entry_kmers = np.concatenate(
        [rng.choice(fwd, 150), rng.integers(0, 4**k, 60, dtype=np.uint64)]
    )
    nodes = rng.integers(0, 70, len(entry_kmers)).astype(np.int32)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 997)
    tpu = ki.TpuKmerIndex.from_arrays(arrays)

    config = MapperConfig(
        k=k, buf=8192, max_reads=256, probe="stream", interpret=True, streams=3
    )
    mapper = KmerMapper(tpu, config)
    mapper.map_chunk(*_pack_reads(reads, config))
    np.testing.assert_array_equal(
        mapper.node_counts(), oracle.map_kmers_to_index(arrays, fwd)
    )


def test_block_max_probe_and_chain_skip():
    """Per-block probe limits: chain-free blocks skip extra rounds; chained
    blocks still resolve exactly."""
    rng = np.random.default_rng(9)
    keys = np.unique(rng.integers(0, 1 << 62, 4000, dtype=np.uint64))
    n_buckets = layout._next_pow2(int(np.ceil(len(keys) / layout.BUCKET_KEYS / 0.8)))
    table = layout.build_table(keys, n_buckets=n_buckets)
    assert table.max_probe > 1
    bp = table.block_max_probe()
    assert bp.max() == table.max_probe
    assert (bp >= 1).all()

    queries = np.concatenate([keys, rng.integers(0, 1 << 62, 800, dtype=np.uint64)])
    valid = np.ones(len(queries), bool)
    qlo, qhi = split_u64(queries)
    p_lo, p_hi = stream_probe.plane_keys(table.key_lo, table.key_hi)
    out = stream_probe.stream_probe_count(
        jnp.asarray(p_lo),
        jnp.asarray(p_hi),
        jnp.zeros(table.n_slots, jnp.uint32),
        jnp.asarray(qlo),
        jnp.asarray(qhi),
        jnp.asarray(valid),
        table.seed,
        table.max_probe,
        cap=512,
        interpret=True,
        block_probe=bp,
    )
    np.testing.assert_array_equal(
        stream_probe.plane_to_slot(np.asarray(out), table.n_buckets),
        _expect(table, queries, valid),
    )


def test_custom_bisection_matches_numpy_searchsorted():
    rng = np.random.default_rng(13)
    vals = np.sort(rng.integers(0, 1 << 32, 10000, dtype=np.uint32))
    queries = np.concatenate(
        [vals[::37], rng.integers(0, 1 << 32, 500, dtype=np.uint32),
         np.array([0, vals[0], vals[-1], 0xFFFFFFFF], dtype=np.uint32)]
    )
    got = np.asarray(stream_probe._searchsorted_u32(jnp.asarray(vals), jnp.asarray(queries)))
    expect = np.searchsorted(vals, queries, side="left")
    np.testing.assert_array_equal(got, expect)

    # long duplicate runs (poly-A skew): the interpolation step degrades to
    # linear creep here; the interleaved bisection must keep it exact
    vals = np.sort(
        np.concatenate(
            [
                np.full(40000, 7_000_000, np.uint32),
                np.full(30000, 7_000_001, np.uint32),
                rng.integers(0, 1 << 32, 1000, dtype=np.uint32),
                np.full(20000, 0xFFFFFFFF, np.uint32),
            ]
        )
    )
    queries = np.array(
        [0, 6_999_999, 7_000_000, 7_000_001, 7_000_002, 0xFFFFFFFF], np.uint32
    )
    got = np.asarray(
        stream_probe._searchsorted_u32(jnp.asarray(vals), jnp.asarray(queries))
    )
    np.testing.assert_array_equal(got, np.searchsorted(vals, queries, side="left"))


def test_paged_schedule_fallback_matches_meta(monkeypatch):
    """Large tables page the schedule HBM->VMEM->SMEM when the
    per-tile metadata would overflow SMEM; both schedules must count
    identically (forced here by shrinking the budget)."""
    from kmer_mapper_tpu.ops import stream_probe as sp

    rng = np.random.default_rng(77)
    keys = np.unique(rng.integers(0, 1 << 62, 4000, dtype=np.uint64))
    table = layout.build_table(keys)
    queries = np.concatenate(
        [rng.choice(keys, 3000), rng.integers(0, 1 << 62, 1096, dtype=np.uint64)]
    )
    valid = np.ones(len(queries), dtype=bool)
    valid[::7] = False
    meta = _run_stream(table, queries, valid, cap=256)
    monkeypatch.setattr(sp, "SMEM_I32_BUDGET", 200)  # force paged mode
    paged = _run_stream(table, queries, valid, cap=256)
    np.testing.assert_array_equal(meta, paged)


def test_paged_schedule_many_pages(monkeypatch):
    """Multi-page regime: shrink PAGE so the schedule spans many pages and the
    in-kernel page advance (double-buffered SMEM slots, HBM->VMEM prefetch,
    final drain) is actually exercised — the default forced-paged test above
    fits in a single page."""
    from kmer_mapper_tpu.ops import stream_probe as sp

    rng = np.random.default_rng(123)
    keys = np.unique(rng.integers(0, 1 << 62, 30000, dtype=np.uint64))
    table = layout.build_table(keys)
    queries = np.concatenate(
        [rng.choice(keys, 9000), rng.integers(0, 1 << 62, 7384, dtype=np.uint64)]
    )
    rng.shuffle(queries)
    valid = rng.random(len(queries)) < 0.9
    meta = _run_stream(table, queries, valid, cap=128)
    monkeypatch.setattr(sp, "SMEM_I32_BUDGET", 200)
    monkeypatch.setattr(sp, "PAGE", 32)
    paged = _run_stream(table, queries, valid, cap=128)
    np.testing.assert_array_equal(meta, paged)
    np.testing.assert_array_equal(meta, _expect(table, queries, valid))


@pytest.mark.parametrize("probe_mode", ["stream", "gather"])
@pytest.mark.parametrize("revcomp", [False, True])
def test_chunk_step_fixed_read_len_matches_ragged(probe_mode, revcomp):
    """config.read_len slices the static valid-window pattern instead of
    masking; counts must be identical to the ragged step and the oracle."""
    rng = np.random.default_rng(11)
    k, L, n_reads = 9, 37, 70
    reads = ["".join(rng.choice(list("ACGT"), L)) for _ in range(n_reads)]
    read_codes = [oracle.encode_string(r) for r in reads]
    fwd = oracle.kmer_hashes_ragged(
        np.concatenate(read_codes), np.full(n_reads, L), k
    )
    pool = np.concatenate([fwd, oracle.revcomp_hash(fwd, k)])
    entry_kmers = np.concatenate(
        [rng.choice(pool, 120), rng.integers(0, 4**k, 50, dtype=np.uint64)]
    )
    nodes = rng.integers(0, 70, len(entry_kmers)).astype(np.int32)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 997)
    tpu = ki.TpuKmerIndex.from_arrays(arrays)

    kw = dict(k=k, buf=4096, max_reads=256, revcomp=revcomp,
              probe=probe_mode, interpret=probe_mode == "stream")
    fixed = KmerMapper(tpu, MapperConfig(read_len=L, **kw))
    fixed.map_chunk(*_pack_reads(reads, fixed.config))
    ragged = KmerMapper(tpu, MapperConfig(**kw))
    ragged.map_chunk(*_pack_reads(reads, ragged.config))

    queries = np.concatenate([fwd, oracle.revcomp_hash(fwd, k)]) if revcomp else fwd
    expect = oracle.map_kmers_to_index(arrays, queries)
    np.testing.assert_array_equal(fixed.node_counts(), expect)
    np.testing.assert_array_equal(ragged.node_counts(), expect)
    assert fixed.n_kmers_mapped == ragged.n_kmers_mapped == len(fwd)


def test_fixed_read_len_falls_back_on_ragged_chunk():
    """A chunk whose reads are not uniformly read_len long must take the
    ragged twin step and still count exactly."""
    rng = np.random.default_rng(12)
    k, L = 9, 31
    uniform = ["".join(rng.choice(list("ACGT"), L)) for _ in range(20)]
    ragged = ["".join(rng.choice(list("ACGT"), rng.integers(12, 60)))
              for _ in range(20)]
    all_reads = uniform + ragged
    codes = [oracle.encode_string(r) for r in all_reads]
    fwd = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(r) for r in all_reads]), k
    )
    entry_kmers = np.concatenate(
        [rng.choice(fwd, 80), rng.integers(0, 4**k, 40, dtype=np.uint64)]
    )
    nodes = rng.integers(0, 50, len(entry_kmers)).astype(np.int32)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 499)
    tpu = ki.TpuKmerIndex.from_arrays(arrays)

    config = MapperConfig(k=k, buf=4096, max_reads=128, read_len=L,
                          probe="stream", interpret=True)
    mapper = KmerMapper(tpu, config)
    mapper.map_chunk(*_pack_reads(uniform, config))  # fixed fast path
    mapper.map_chunk(*_pack_reads(ragged, config))  # fallback twin
    assert mapper._ragged_step is not None
    expect = oracle.map_kmers_to_index(arrays, fwd)
    np.testing.assert_array_equal(mapper.node_counts(), expect)
    assert mapper.n_kmers_mapped == len(fwd)


@pytest.mark.parametrize("group", [2, 4])
def test_stream_probe_group_widening_matches_oracle(group):
    """group > 1 serves several adjacent chain blocks with one widened
    one-hot tile; counts must be bit-identical, including chained tables."""
    rng = np.random.default_rng(21)
    keys = np.unique(rng.integers(0, 1 << 62, 4000, dtype=np.uint64))
    n_buckets = layout._next_pow2(int(np.ceil(len(keys) / layout.BUCKET_KEYS / 0.8)))
    table = layout.build_table(keys, n_buckets=n_buckets)
    assert table.max_probe > 1
    queries = np.concatenate([keys, rng.integers(0, 1 << 62, 1500, dtype=np.uint64)])
    valid = rng.random(len(queries)) < 0.9
    qlo, qhi = split_u64(queries)
    sm_lo, sm_hi = stream_probe.sort_queries(
        jnp.asarray(qlo), jnp.asarray(qhi), jnp.asarray(valid),
        table.n_buckets, table.seed,
    )
    bpb = min(layout.CHAIN_BLOCK, table.n_buckets)
    off = stream_probe.block_offsets(sm_lo, table.n_buckets, bpb)
    p_lo, p_hi = stream_probe.plane_keys(table.key_lo, table.key_hi, group=group)
    out = stream_probe.stream_count(
        jnp.asarray(p_lo),
        jnp.asarray(p_hi),
        jnp.zeros(table.n_slots, jnp.uint32),
        sm_lo, sm_hi, off, table.max_probe,
        cap=256, interpret=True, group=group,
        block_probe=jnp.asarray(table.block_max_probe()),
    )
    gpb = stream_probe.plane_gpb(table.n_buckets, group)
    np.testing.assert_array_equal(
        stream_probe.plane_to_slot(np.asarray(out), table.n_buckets, gpb),
        _expect(table, queries, valid),
    )


@pytest.mark.parametrize("k", [1, 5, 15, 16, 17, 31])
def test_stream_path_k_boundaries(k):
    """k sweep across the 16-base word boundary (k<=16: hi word is 0; the
    mixed words still spread over both) — full chunk step vs oracle."""
    rng = np.random.default_rng(100 + k)
    reads = ["".join(rng.choice(list("ACGT"), rng.integers(k, k + 40)))
             for _ in range(50)]
    codes = [oracle.encode_string(r) for r in reads]
    fwd = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(r) for r in reads]), k
    )
    mask = np.uint64(4**k - 1) if k < 32 else np.uint64(-1)
    entry_kmers = np.concatenate(
        [rng.choice(fwd, 60), rng.integers(0, 1 << 62, 30, dtype=np.uint64) & mask]
    )
    nodes = rng.integers(0, 40, len(entry_kmers)).astype(np.int32)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 499)
    tpu = ki.TpuKmerIndex.from_arrays(arrays)
    config = MapperConfig(k=k, buf=4096, max_reads=128, probe="stream",
                          interpret=True, stream_cap=256)
    mapper = KmerMapper(tpu, config)
    mapper.map_chunk(*_pack_reads(reads, config))
    np.testing.assert_array_equal(
        mapper.node_counts(), oracle.map_kmers_to_index(arrays, fwd)
    )


def test_paged_schedule_with_chained_table(monkeypatch):
    """Paged-schedule mode with a chained high-load table (rounds > 1):
    page reads must deliver the same (group, round, offset) stream."""
    from kmer_mapper_tpu.ops import stream_probe as sp

    rng = np.random.default_rng(88)
    keys = np.unique(rng.integers(0, 1 << 62, 4000, dtype=np.uint64))
    n_buckets = layout._next_pow2(int(np.ceil(len(keys) / layout.BUCKET_KEYS / 0.8)))
    table = layout.build_table(keys, n_buckets=n_buckets)
    assert table.max_probe > 1
    queries = np.concatenate([keys, rng.integers(0, 1 << 62, 777, dtype=np.uint64)])
    valid = np.ones(len(queries), bool)
    monkeypatch.setattr(sp, "SMEM_I32_BUDGET", 200)  # force paged mode
    got = _run_stream(table, queries, valid, cap=256)
    np.testing.assert_array_equal(got, _expect(table, queries, valid))


@pytest.mark.parametrize("aug", [2, 4])
def test_stream_probe_dense_table_deep_chains(aug):
    """Dense table (chains beyond the default 8-round limit, built with a
    raised max_probe_limit): augmentation schedules ceil(chain/aug) rounds
    and must stay bit-exact."""
    rng = np.random.default_rng(31)
    keys = np.unique(rng.integers(0, 1 << 62, 6000, dtype=np.uint64))
    # force ~5.9 keys/bucket so chains run deep
    n_buckets = layout._next_pow2(len(keys) // 6)
    table = layout.build_table(keys, n_buckets=n_buckets, max_probe_limit=16)
    assert table.n_buckets == n_buckets, "build must not have grown"
    queries = np.concatenate([keys, rng.integers(0, 1 << 62, 1000, dtype=np.uint64)])
    valid = rng.random(len(queries)) < 0.95
    np.testing.assert_array_equal(
        _run_stream(
            table, queries, valid, aug=aug,
            block_probe=table.block_max_probe(),
        ),
        _expect(table, queries, valid),
    )


def test_min_feasible_group_matches_plan_feasibility():
    """Self-contained schedule entries: only tile_bounds occupies SMEM, so
    group=1 stays feasible through human-genome scale (the old
    streams*(n_groups+1)-word goff cliff at ~12M buckets is gone) and the
    boundary only appears at extreme sizes, where min_feasible_group is
    exactly the plan's base_len feasibility edge."""
    sp = stream_probe
    # human-scale tables (incl. the 150M-key drill's 2^25 buckets) plan at
    # group=1, any stream count
    for n_buckets in (1 << 15, 1 << 22, 1 << 25, 1 << 27):
        assert sp.min_feasible_group(n_buckets) == 1
        plan = sp.plan_schedule(n_buckets, 1 << 20, cap=512, max_probe=5, group=1)
        assert plan.group == 1
    assert sp.min_feasible_group(1 << 27, streams=6) == 1
    # the boundary still exists far out (> ~400M buckets at the defaults):
    # the returned group plans cleanly, half of it raises
    big = 1 << 33
    g = sp.min_feasible_group(big)
    assert g > 1
    plan = sp.plan_schedule(big, 1 << 20, cap=512, max_probe=5, group=g)
    assert plan.group == g
    with pytest.raises(ValueError, match="too large"):
        sp.plan_schedule(big, 1 << 20, cap=512, max_probe=5, group=g // 2)


def test_mapper_human_scale_group_pairing(monkeypatch):
    """KmerMapper pairs chain blocks (group=2) on human-scale tables
    (drill: group=1/2/4 = 158.0/160.7/126.9 Mk/s); an explicit config.group
    wins over the policy, and counts stay oracle-exact at group=2."""
    sp = stream_probe
    rng = np.random.default_rng(11)
    keys = np.unique(rng.integers(0, 1 << 62, 16000, dtype=np.uint64))
    table = layout.build_table(keys)  # 4096 buckets -> 32 chain blocks
    monkeypatch.setattr(sp, "HUMAN_SCALE_BUCKETS", table.n_buckets)
    index = ki.TpuKmerIndex.from_entries(
        keys, rng.integers(0, 500, len(keys)).astype(np.int32)
    )
    config = MapperConfig(
        k=31, buf=1 << 12, max_reads=256, probe="stream", interpret=True
    )
    mapper = KmerMapper(index, config)
    assert mapper.config.group == 2
    explicit = KmerMapper(index, dataclasses.replace(config, group=1))
    assert explicit.config.group == 1
    # oracle-exact at the paired-group layout
    reads = ["".join(rng.choice(list("ACGT"), 64)) for _ in range(30)]
    from kmer_mapper_tpu.io import readers

    flat = "".join(reads)
    chunk = readers.SequenceChunk(
        bases=np.frombuffer(flat.encode(), np.uint8),
        read_starts=np.cumsum([0] + [64] * 29).astype(np.int64),
    )
    for packed, lengths, nb, _, ninv in readers.pack_for_device(
        iter([chunk]), config.buf, config.max_reads, 31
    ):
        mapper.map_chunk(packed, lengths, nb, ninv)
    hashes = oracle.kmer_hashes_ragged(
        oracle.encode_bytes(chunk.bases), chunk.read_lengths, 31
    )
    slots = layout.query_table(table, hashes)
    expect = np.bincount(slots[slots >= 0], minlength=table.n_slots).astype(
        np.uint32
    )
    np.testing.assert_array_equal(mapper.slot_counts(), expect)


def test_mapper_auto_widens_groups_when_schedule_overflows(monkeypatch):
    """KmerMapper bumps config.group to min_feasible_group when the table's
    per-block scalar metadata would overflow SMEM (forced via a tiny budget);
    counts stay bit-exact vs the oracle."""
    sp = stream_probe
    rng = np.random.default_rng(77)
    keys = np.unique(rng.integers(0, 1 << 62, 16000, dtype=np.uint64))
    table = layout.build_table(keys)  # 4096 buckets -> 32 chain blocks
    monkeypatch.setattr(sp, "SMEM_I32_BUDGET", 3)
    needed = sp.min_feasible_group(table.n_buckets)
    assert needed > 1
    index = ki.TpuKmerIndex.from_entries(
        keys, rng.integers(0, 500, len(keys)).astype(np.int32)
    )
    config = MapperConfig(
        k=31, buf=1 << 12, max_reads=256, probe="stream", interpret=True
    )
    mapper = KmerMapper(index, config)
    assert mapper.config.group == needed
    # map one small chunk end-to-end and compare against the oracle
    reads = ["".join(rng.choice(list("ACGT"), 64)) for _ in range(30)]
    from kmer_mapper_tpu.io import readers

    flat = "".join(reads)
    chunk = readers.SequenceChunk(
        bases=np.frombuffer(flat.encode(), np.uint8),
        read_starts=np.cumsum([0] + [64] * 29).astype(np.int64),
    )
    for packed, lengths, nb, _, ninv in readers.pack_for_device(
        iter([chunk]), config.buf, config.max_reads, 31
    ):
        mapper.map_chunk(packed, lengths, nb, ninv)
    hashes = oracle.kmer_hashes_ragged(
        oracle.encode_bytes(chunk.bases), chunk.read_lengths, 31
    )
    slots = layout.query_table(table, hashes)
    expect = np.bincount(slots[slots >= 0], minlength=table.n_slots).astype(np.uint32)
    np.testing.assert_array_equal(np.asarray(mapper.slot_counts()), expect)
