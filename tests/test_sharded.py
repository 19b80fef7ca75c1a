"""Multi-device tests on the 8-virtual-CPU-device mesh: sharded table probe,
data-parallel accumulation, collective finalization — bit-exact vs oracle."""
import numpy as np
import pytest

import jax

from kmer_mapper_tpu import oracle
from kmer_mapper_tpu.index import kmer_index as ki
from kmer_mapper_tpu.index import layout
from kmer_mapper_tpu.io import readers
from kmer_mapper_tpu.models.mapper import MapperConfig
from kmer_mapper_tpu.parallel import ShardedKmerMapper, batch_packed_chunks, make_mesh


def _setup(rng, k, n_reads=200):
    reads = ["".join(rng.choice(list("ACGT"), rng.integers(20, 80))) for _ in range(n_reads)]
    codes = [oracle.encode_string(r) for r in reads]
    read_kmers = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    mask = np.uint64(4**k - 1) if k < 32 else np.uint64(-1)
    entry_kmers = np.concatenate(
        [rng.choice(read_kmers, 300), rng.integers(0, 1 << 62, 100, dtype=np.uint64) & mask]
    )
    nodes = rng.integers(0, 150, len(entry_kmers)).astype(np.int32)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 1999)
    expect = oracle.map_kmers_to_index(arrays, read_kmers)
    return reads, arrays, expect


def _chunks_from_reads(reads, config):
    flat = "".join(reads)
    chunk = readers.SequenceChunk(
        bases=np.frombuffer(flat.encode(), dtype=np.uint8),
        read_starts=np.cumsum([0] + [len(r) for r in reads[:-1]]).astype(np.int64),
    )
    return readers.pack_for_device(iter([chunk]), config.buf, config.max_reads, config.k)


def _run(mapper, reads, config):
    packed = _chunks_from_reads(reads, config)
    for batch in batch_packed_chunks(
        packed, mapper.n_data, config.packed_words, config.max_reads
    ):
        mapper.map_batch(*batch)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_mapping_matches_oracle(shape):
    d, x = shape
    assert len(jax.devices()) >= d * x
    rng = np.random.default_rng(d * 10 + x)
    k = 9
    reads, arrays, expect = _setup(rng, k)
    mesh = make_mesh(n_devices=d * x, index_parallel=x)
    config = MapperConfig(k=k, buf=1024, max_reads=64)
    mapper = ShardedKmerMapper(ki.TpuKmerIndex.from_arrays(arrays), config, mesh)
    _run(mapper, reads, config)
    got = mapper.node_counts()
    np.testing.assert_array_equal(got, expect)
    assert mapper.n_kmers_mapped == sum(max(0, len(r) - k + 1) for r in reads)


def test_sharded_revcomp_and_frequency():
    rng = np.random.default_rng(42)
    k = 7
    reads = ["".join(rng.choice(list("ACGT"), 40)) for _ in range(50)]
    codes = [oracle.encode_string(r) for r in reads]
    fwd = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    entry_kmers = rng.choice(np.concatenate([fwd, oracle.revcomp_hash(fwd, k)]), 150)
    nodes = rng.integers(0, 60, len(entry_kmers)).astype(np.int32)
    freqs = rng.choice([1, 1001], len(entry_kmers), p=[0.9, 0.1]).astype(np.uint16)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 499, frequencies=freqs)
    queries = np.concatenate([fwd, oracle.revcomp_hash(fwd, k)])
    expect = oracle.map_kmers_to_index(arrays, queries)

    mesh = make_mesh(n_devices=8, index_parallel=2)
    config = MapperConfig(k=k, buf=512, max_reads=32, revcomp=True, accumulate="sorted")
    mapper = ShardedKmerMapper(ki.TpuKmerIndex.from_arrays(arrays), config, mesh)
    _run(mapper, reads, config)
    np.testing.assert_array_equal(mapper.node_counts(), expect)


def test_sharded_probe_chained_high_load():
    """High-load table -> long collision chains; with 8 index shards every key
    must still count exactly once (chains wrap inside CHAIN_BLOCK-aligned
    blocks, so block-aligned shards contain them fully)."""
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 1 << 62, 2048, dtype=np.uint64))
    n_buckets = layout._next_pow2(int(np.ceil(len(keys) / layout.BUCKET_KEYS / 0.85)))
    table = layout.build_table(keys, n_buckets=n_buckets)
    slots = layout.query_table(table, keys)
    tpu = ki.TpuKmerIndex(
        table=table,
        entry_slot=slots.astype(np.int32),
        entry_node=np.arange(len(keys), dtype=np.int32),
        entry_frequency=np.ones(len(keys), dtype=np.uint16),
        max_node_id=len(keys) - 1,
        n_unique=len(keys),
    )
    k = 31
    mesh = make_mesh(n_devices=8, index_parallel=8)
    config = MapperConfig(k=k, buf=256, max_reads=16)
    mapper = ShardedKmerMapper(tpu, config, mesh)
    reads = [
        "".join(oracle.ALPHABET[(int(key) >> (2 * i)) & 3] for i in range(k)) for key in keys
    ]
    _run(mapper, reads, config)
    np.testing.assert_array_equal(mapper.node_counts(), 1)


def test_sharded_stream_probe_matches_oracle():
    """Stream (sort + MXU) probe inside shard_map: chain-block-aligned table
    shards, interpret-mode kernel, bit-exact vs oracle."""
    rng = np.random.default_rng(77)
    k = 9
    reads, arrays, expect = _setup(rng, k, n_reads=100)
    # force a table big enough that each of 2 index shards holds >= 1 chain block
    unique = np.unique(arrays.kmers)
    table = layout.build_table(unique, n_buckets=2 * layout.CHAIN_BLOCK)
    slots = layout.query_table(table, arrays.kmers)
    tpu = ki.TpuKmerIndex(
        table=table,
        entry_slot=slots.astype(np.int32),
        entry_node=arrays.nodes,
        entry_frequency=arrays.frequencies,
        max_node_id=arrays.max_node_id(),
        n_unique=len(unique),
    )
    mesh = make_mesh(n_devices=4, index_parallel=2)
    config = MapperConfig(
        k=k, buf=1024, max_reads=64, probe="stream", interpret=True
    )
    mapper = ShardedKmerMapper(tpu, config, mesh)
    _run(mapper, reads, config)
    np.testing.assert_array_equal(mapper.node_counts(), expect)

    # fused revcomp on the sharded stream path
    config_rc = MapperConfig(
        k=k, buf=1024, max_reads=64, probe="stream", interpret=True, revcomp=True
    )
    mapper_rc = ShardedKmerMapper(tpu, config_rc, mesh)
    _run(mapper_rc, reads, config_rc)
    codes = [oracle.encode_string(r) for r in reads]
    fwd = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    queries = np.concatenate([fwd, oracle.revcomp_hash(fwd, k)])
    expect_rc = oracle.map_kmers_to_index(arrays, queries)
    np.testing.assert_array_equal(mapper_rc.node_counts(), expect_rc)


def test_sharded_ragged_multistream_matches_oracle():
    """streams=3 on the sharded RAGGED stream step (read_len == 0): each
    shard sorts its query stream as 3 independent segments
    (stream_probe.mix_pad_segments) — counts stay oracle-exact across
    shard-local bucket ranges."""
    rng = np.random.default_rng(78)
    k = 9
    reads, arrays, expect = _setup(rng, k, n_reads=100)
    unique = np.unique(arrays.kmers)
    table = layout.build_table(unique, n_buckets=2 * layout.CHAIN_BLOCK)
    slots = layout.query_table(table, arrays.kmers)
    tpu = ki.TpuKmerIndex(
        table=table,
        entry_slot=slots.astype(np.int32),
        entry_node=arrays.nodes,
        entry_frequency=arrays.frequencies,
        max_node_id=arrays.max_node_id(),
        n_unique=len(unique),
    )
    mesh = make_mesh(n_devices=4, index_parallel=2)
    config = MapperConfig(
        k=k, buf=1024, max_reads=64, probe="stream", interpret=True, streams=3
    )
    mapper = ShardedKmerMapper(tpu, config, mesh)
    _run(mapper, reads, config)
    np.testing.assert_array_equal(mapper.node_counts(), expect)


def test_sharded_save_load_state_round_trip(tmp_path):
    """Checkpoint mid-run on one mesh, resume on a fresh mapper: final counts
    must equal the uninterrupted run (multi-chip resume parity with
    KmerMapper.save_state/load_state)."""
    rng = np.random.default_rng(77)
    k = 9
    reads, arrays, expect = _setup(rng, k)
    mesh = make_mesh(n_devices=4, index_parallel=2)
    config = MapperConfig(k=k, buf=1024, max_reads=64)
    index = ki.TpuKmerIndex.from_arrays(arrays)

    half = len(reads) // 2
    mapper = ShardedKmerMapper(index, config, mesh)
    _run(mapper, reads[:half], config)
    ckpt = tmp_path / "state.npz"
    mapper.save_state(ckpt)
    kmers_at_ckpt = mapper.n_kmers_mapped

    resumed = ShardedKmerMapper(index, config, mesh)
    resumed.load_state(ckpt)
    assert resumed.n_kmers_mapped == kmers_at_ckpt
    _run(resumed, reads[half:], config)
    np.testing.assert_array_equal(resumed.node_counts(), expect)

    # shape mismatch (different mesh) is refused, not silently mis-sharded
    other = ShardedKmerMapper(index, config, make_mesh(n_devices=8, index_parallel=2))
    with pytest.raises(ValueError, match="does not match"):
        other.load_state(ckpt)


def test_sharded_stream_fixed_read_len_plane_path():
    """Fixed-length reads on the sharded stream path take the word-plane
    step (host restride + plane hash inside shard_map) — bit-exact vs the
    oracle, and a batch with an off-length read falls back to the ragged
    twin with identical totals."""
    rng = np.random.default_rng(91)
    k, L = 9, 37
    reads = ["".join(rng.choice(list("ACGT"), L)) for _ in range(120)]
    codes = [oracle.encode_string(r) for r in reads]
    read_kmers = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    entry_kmers = np.concatenate(
        [rng.choice(read_kmers, 200),
         rng.integers(0, 1 << (2 * k), 100, dtype=np.uint64)]
    )
    nodes = rng.integers(0, 150, len(entry_kmers)).astype(np.int32)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 1999)
    expect = oracle.map_kmers_to_index(arrays, read_kmers)
    unique = np.unique(arrays.kmers)
    table = layout.build_table(unique, n_buckets=2 * layout.CHAIN_BLOCK)
    slots = layout.query_table(table, arrays.kmers)
    tpu = ki.TpuKmerIndex(
        table=table,
        entry_slot=slots.astype(np.int32),
        entry_node=arrays.nodes,
        entry_frequency=arrays.frequencies,
        max_node_id=arrays.max_node_id(),
        n_unique=len(unique),
    )
    mesh = make_mesh(n_devices=4, index_parallel=2)
    config = MapperConfig(
        k=k, buf=1024, max_reads=64, probe="stream", interpret=True,
        read_len=L, stream_cap=128,
    )
    mapper = ShardedKmerMapper(tpu, config, mesh)
    _run(mapper, reads, config)
    assert mapper._plane_step is not None  # the plane twin actually ran
    assert mapper._ragged_step is None
    np.testing.assert_array_equal(mapper.node_counts(), expect)
    assert mapper.n_kmers_mapped == len(reads) * (L - k + 1)

    # an off-length read anywhere in the batch -> ragged fallback, same math
    reads_mixed = reads[:40] + ["ACGT" * 12] + reads[40:]
    codes_m = [oracle.encode_string(r) for r in reads_mixed]
    kmers_m = oracle.kmer_hashes_ragged(
        np.concatenate(codes_m), np.array([len(c) for c in codes_m]), k
    )
    expect_m = oracle.map_kmers_to_index(arrays, kmers_m)
    mapper_m = ShardedKmerMapper(tpu, config, mesh)
    _run(mapper_m, reads_mixed, config)
    assert mapper_m._ragged_step is not None
    np.testing.assert_array_equal(mapper_m.node_counts(), expect_m)


def test_sharded_plane_multi_stream():
    """streams=2 on the sharded plane path: per-shard block offsets over two
    independently sorted segments, one tile schedule — bit-exact vs oracle."""
    rng = np.random.default_rng(93)
    k, L = 9, 37
    reads = ["".join(rng.choice(list("ACGT"), L)) for _ in range(100)]
    codes = [oracle.encode_string(r) for r in reads]
    read_kmers = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    entry_kmers = np.concatenate(
        [rng.choice(read_kmers, 150),
         rng.integers(0, 1 << (2 * k), 80, dtype=np.uint64)]
    )
    nodes = rng.integers(0, 120, len(entry_kmers)).astype(np.int32)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 1999)
    expect = oracle.map_kmers_to_index(arrays, read_kmers)
    unique = np.unique(arrays.kmers)
    table = layout.build_table(unique, n_buckets=2 * layout.CHAIN_BLOCK)
    slots = layout.query_table(table, arrays.kmers)
    tpu = ki.TpuKmerIndex(
        table=table,
        entry_slot=slots.astype(np.int32),
        entry_node=arrays.nodes,
        entry_frequency=arrays.frequencies,
        max_node_id=arrays.max_node_id(),
        n_unique=len(unique),
    )
    mesh = make_mesh(n_devices=4, index_parallel=2)
    config = MapperConfig(
        k=k, buf=1024, max_reads=64, probe="stream", interpret=True,
        read_len=L, stream_cap=128, streams=2,
    )
    mapper = ShardedKmerMapper(tpu, config, mesh)
    _run(mapper, reads, config)
    assert mapper._plane_step is not None
    np.testing.assert_array_equal(mapper.node_counts(), expect)


def test_sharded_plane_revcomp():
    rng = np.random.default_rng(92)
    k, L = 7, 33
    reads = ["".join(rng.choice(list("ACGT"), L)) for _ in range(60)]
    codes = [oracle.encode_string(r) for r in reads]
    fwd = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    entry_kmers = rng.choice(np.concatenate([fwd, oracle.revcomp_hash(fwd, k)]), 150)
    nodes = rng.integers(0, 60, len(entry_kmers)).astype(np.int32)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 499)
    unique = np.unique(arrays.kmers)
    table = layout.build_table(unique, n_buckets=2 * layout.CHAIN_BLOCK)
    slots = layout.query_table(table, arrays.kmers)
    tpu = ki.TpuKmerIndex(
        table=table,
        entry_slot=slots.astype(np.int32),
        entry_node=arrays.nodes,
        entry_frequency=arrays.frequencies,
        max_node_id=arrays.max_node_id(),
        n_unique=len(unique),
    )
    mesh = make_mesh(n_devices=4, index_parallel=2)
    config = MapperConfig(
        k=k, buf=1024, max_reads=64, probe="stream", interpret=True,
        read_len=L, revcomp=True, stream_cap=128,
    )
    mapper = ShardedKmerMapper(tpu, config, mesh)
    _run(mapper, reads, config)
    assert mapper._plane_step is not None
    queries = np.concatenate([fwd, oracle.revcomp_hash(fwd, k)])
    np.testing.assert_array_equal(
        mapper.node_counts(), oracle.map_kmers_to_index(arrays, queries)
    )


@pytest.mark.parametrize(
    "shape,probe",
    [((4, 2), "gather"), ((2, 4), "stream"), ((1, 8), "stream")],
)
def test_sharded_map_hashes_matches_oracle(shape, probe):
    """ShardedKmerMapper.map_hashes — the KAGE pre-hashed library surface on
    a sharded index (batch over the data axis, each index shard counts its
    keys): counts bit-exact vs the oracle incl. duplicates and misses."""
    d, x = shape
    rng = np.random.default_rng(100 * d + x + (probe == "stream"))
    k = 11
    reads, arrays, _ = _setup(rng, k)
    codes = [oracle.encode_string(r) for r in reads]
    read_kmers = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    # duplicates, misses, and an awkward (non-pow2, non-multiple-of-D) length
    batch = np.concatenate(
        [
            rng.choice(read_kmers, 700),
            rng.integers(0, 1 << 62, 311, dtype=np.uint64),
        ]
    )
    mesh = make_mesh(n_devices=d * x, index_parallel=x)
    kwargs = dict(probe=probe)
    if probe == "stream":
        kwargs.update(interpret=True, stream_cap=128)
        # chain-block-aligned shards: one CHAIN_BLOCK per index shard
        unique = np.unique(arrays.kmers)
        table = layout.build_table(unique, n_buckets=x * layout.CHAIN_BLOCK)
        slots = layout.query_table(table, arrays.kmers)
        index = ki.TpuKmerIndex(
            table=table,
            entry_slot=slots.astype(np.int32),
            entry_node=arrays.nodes,
            entry_frequency=arrays.frequencies,
            max_node_id=arrays.max_node_id(),
            n_unique=len(unique),
        )
    else:
        index = ki.TpuKmerIndex.from_arrays(arrays)
    config = MapperConfig(k=k, buf=1024, max_reads=64, **kwargs)
    mapper = ShardedKmerMapper(index, config, mesh)
    mapper.map_hashes(batch)
    mapper.map_hashes(batch[:37])  # second, differently-sized batch
    got = mapper.node_counts()
    want = oracle.map_kmers_to_index(
        arrays, np.concatenate([batch, batch[:37]])
    )
    np.testing.assert_array_equal(got, want)
    assert mapper.n_kmers_mapped == len(batch) + 37

    # mixing pre-hashed batches with packed chunk batches accumulates
    _run(mapper, reads, config)
    got2 = mapper.node_counts()
    want2 = want + oracle.map_kmers_to_index(arrays, read_kmers)
    np.testing.assert_array_equal(got2, want2)


@pytest.mark.parametrize("streams", [1, 2])
def test_sharded_paged_schedule_matches_meta(monkeypatch, streams):
    """The HBM-paged schedule under shard_map (VERDICT r3 weak #1): per-shard
    re-plan flips to paged when the schedule overflows the (shrunken) SMEM
    budget, with PAGE forced small so the in-kernel page advance runs — counts
    bit-exact vs the meta run and the oracle, ragged S=1 and S=2."""
    from kmer_mapper_tpu.ops import stream_probe as sp

    rng = np.random.default_rng(300 + streams)
    k = 9
    reads, arrays, expect = _setup(rng, k, n_reads=150)
    unique = np.unique(arrays.kmers)
    table = layout.build_table(unique, n_buckets=4 * layout.CHAIN_BLOCK)
    slots = layout.query_table(table, arrays.kmers)
    tpu = ki.TpuKmerIndex(
        table=table,
        entry_slot=slots.astype(np.int32),
        entry_node=arrays.nodes,
        entry_frequency=arrays.frequencies,
        max_node_id=arrays.max_node_id(),
        n_unique=len(unique),
    )
    mesh = make_mesh(n_devices=4, index_parallel=2)
    config = MapperConfig(
        k=k, buf=2048, max_reads=256, probe="stream", interpret=True,
        stream_cap=128, streams=streams,
    )

    def run_once():
        mapper = ShardedKmerMapper(tpu, config, mesh)
        _run(mapper, reads, config)
        return mapper.node_counts()

    nb_local = table.n_buckets // 2
    meta_plan = sp.plan_schedule(
        nb_local, 4096, cap=128, max_probe=table.max_probe, streams=streams
    )
    assert meta_plan.use_meta
    meta = run_once()
    np.testing.assert_array_equal(meta, expect)

    monkeypatch.setattr(sp, "SMEM_I32_BUDGET", 40)
    monkeypatch.setattr(sp, "PAGE", 16)
    paged_plan = sp.plan_schedule(
        nb_local, 4096, cap=128, max_probe=table.max_probe, streams=streams
    )
    assert not paged_plan.use_meta and paged_plan.n_pages >= 2
    paged = run_once()
    np.testing.assert_array_equal(paged, expect)


def test_sharded_plane_paged_schedule(monkeypatch):
    """Paged schedule on the sharded word-plane (fixed read_len) step: the
    --index-parallel huge-table combination on the fast path."""
    from kmer_mapper_tpu.ops import stream_probe as sp

    rng = np.random.default_rng(92)
    k, L = 9, 37
    reads = ["".join(rng.choice(list("ACGT"), L)) for _ in range(120)]
    codes = [oracle.encode_string(r) for r in reads]
    read_kmers = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    entry_kmers = np.concatenate(
        [rng.choice(read_kmers, 200),
         rng.integers(0, 1 << (2 * k), 100, dtype=np.uint64)]
    )
    nodes = rng.integers(0, 150, len(entry_kmers)).astype(np.int32)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 1999)
    expect = oracle.map_kmers_to_index(arrays, read_kmers)
    unique = np.unique(arrays.kmers)
    table = layout.build_table(unique, n_buckets=2 * layout.CHAIN_BLOCK)
    slots = layout.query_table(table, arrays.kmers)
    tpu = ki.TpuKmerIndex(
        table=table,
        entry_slot=slots.astype(np.int32),
        entry_node=arrays.nodes,
        entry_frequency=arrays.frequencies,
        max_node_id=arrays.max_node_id(),
        n_unique=len(unique),
    )
    mesh = make_mesh(n_devices=4, index_parallel=2)
    config = MapperConfig(
        k=k, buf=1024, max_reads=64, probe="stream", interpret=True,
        read_len=L, stream_cap=128, streams=2,
    )
    monkeypatch.setattr(sp, "SMEM_I32_BUDGET", 40)
    monkeypatch.setattr(sp, "PAGE", 16)
    mapper = ShardedKmerMapper(tpu, config, mesh)
    _run(mapper, reads, config)
    assert mapper._plane_step is not None
    np.testing.assert_array_equal(mapper.node_counts(), expect)


def test_sharded_auto_widens_groups_per_shard(monkeypatch):
    """ShardedKmerMapper bumps config.group when the per-SHARD schedule base
    arrays would overflow SMEM (tiny forced budget); counts stay oracle-exact
    across the mesh."""
    from kmer_mapper_tpu.ops import stream_probe as sp

    rng = np.random.default_rng(91)
    k = 9
    reads, arrays, expect = _setup(rng, k, n_reads=100)
    unique = np.unique(arrays.kmers)
    table = layout.build_table(unique, n_buckets=8 * layout.CHAIN_BLOCK)
    slots = layout.query_table(table, arrays.kmers)
    tpu = ki.TpuKmerIndex(
        table=table,
        entry_slot=slots.astype(np.int32),
        entry_node=arrays.nodes,
        entry_frequency=arrays.frequencies,
        max_node_id=arrays.max_node_id(),
        n_unique=len(unique),
    )
    mesh = make_mesh(n_devices=4, index_parallel=2)  # 4 blocks per shard
    # self-contained schedule entries leave only tile_bounds in SMEM
    # (n_groups/coarse words), so forcing the cliff on a tiny table needs
    # coarse=1 plus a budget below the per-shard tile_bounds length
    monkeypatch.setattr(sp, "DEFAULT_COARSE", 1)
    monkeypatch.setattr(sp, "SMEM_I32_BUDGET", 5)
    assert sp.min_feasible_group(table.n_buckets // 2) > 1
    config = MapperConfig(
        k=k, buf=1024, max_reads=64, probe="stream", interpret=True
    )
    mapper = ShardedKmerMapper(tpu, config, mesh)
    assert mapper.config.group == sp.min_feasible_group(table.n_buckets // 2)
    _run(mapper, reads, config)
    np.testing.assert_array_equal(mapper.node_counts(), expect)
