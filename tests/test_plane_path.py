"""Fixed-read-length word-plane fast path: strided packing, restride, plane
hash, and the plane chunk step — all bit-exact vs the continuous path and the
numpy oracle.

The plane path (``hashing.plane_hash_mixed`` + ``stream_probe_count_mixed``)
replaces the interleaved rolling hash + lane-misaligned window slice with
contiguous word-plane shift/ORs over stride-padded reads (measured 0.83 vs
4.7 ms per 16 Mi chunk on v5e, scripts/r4_plane_hash.py). Counting semantics
must be identical to the ragged/continuous paths; these tests pin that.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from kmer_mapper_tpu import oracle, pipeline
from kmer_mapper_tpu.index import kmer_index as ki
from kmer_mapper_tpu.io import readers
from kmer_mapper_tpu.models.mapper import KmerMapper, MapperConfig
from kmer_mapper_tpu.ops import hashing, stream_probe

rng = np.random.default_rng(7)


def _uniform_reads(n, L, with_n=False):
    alphabet = list("ACGT" + ("N" if with_n else ""))
    return ["".join(rng.choice(alphabet, L)) for _ in range(n)]


def _chunk_from_reads(reads):
    flat = "".join(reads)
    starts = np.cumsum([0] + [len(r) for r in reads[:-1]]).astype(np.int64)
    return readers.SequenceChunk(
        bases=np.frombuffer(flat.encode(), np.uint8).copy(), read_starts=starts
    )


def _pack(reads, buf, max_reads, k, read_len=0):
    return list(
        readers.pack_for_device(
            iter([_chunk_from_reads(reads)]), buf, max_reads, k, read_len=read_len
        )
    )


def _index_for(reads, k, n_nodes=60):
    """(reference-layout oracle arrays, device TpuKmerIndex) for the reads."""
    codes = [oracle.encode_string(r.upper().replace("N", "A")) for r in reads]
    kmers = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    mask = np.uint64(4**k - 1)
    entries = np.unique(
        np.concatenate(
            [kmers[:: max(1, len(kmers) // 64)],
             rng.integers(0, 1 << min(62, 2 * k), 64, dtype=np.uint64) & mask]
        )
    )
    nodes = rng.integers(0, n_nodes, len(entries)).astype(np.int32)
    arrays = oracle.build_kmer_index(entries, nodes, 997)
    return arrays, ki.TpuKmerIndex.from_arrays(arrays)


def _oracle_node_counts(arrays, reads, k, revcomp=False):
    codes = [oracle.encode_string(r.upper().replace("N", "A")) for r in reads]
    hashes = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    if revcomp:
        hashes = np.concatenate([hashes, oracle.revcomp_hash(hashes, k)])
    return oracle.map_kmers_to_index(arrays, hashes)


@pytest.mark.parametrize("L,k", [(51, 31), (48, 31), (37, 13), (16, 11)])
def test_strided_pack_matches_restride(L, k):
    reads = _uniform_reads(40, L, with_n=True)
    buf, max_reads = 1 << 12, 256
    direct = _pack(reads, buf, max_reads, k, read_len=L)
    cont = _pack(reads, buf, max_reads, k)
    assert len(direct) == len(cont)
    for d, c in zip(direct, cont):
        packed_d, lengths_d, nb_d, nr_d, ninv_d, strided = d
        packed_c, lengths_c, nb_c, nr_c, ninv_c = c
        assert strided
        assert (nb_d, nr_d, ninv_d) == (nb_c, nr_c, ninv_c)
        np.testing.assert_array_equal(lengths_d, lengths_c)
        restrided = readers.restride_packed(
            packed_c, nr_c, L, readers.strided_rows(buf, L)
        )
        np.testing.assert_array_equal(packed_d, restrided)


@pytest.mark.parametrize("L", [151, 48, 37, 16])
def test_restride_native_matches_numpy(L, monkeypatch):
    from kmer_mapper_tpu.io import native as native_mod

    if not native_mod.available():
        pytest.skip("native loader unavailable")
    reads = _uniform_reads(50, L, with_n=True)
    buf = 1 << 13
    (packed_c, lengths, nb, nr, _), = _pack(reads, buf, 256, 15)
    rows = readers.strided_rows(buf, L)
    nat = native_mod.restride_native(packed_c, nr, L, rows)
    monkeypatch.setattr(native_mod, "available", lambda: False)
    ref = readers.restride_packed(packed_c, nr, L, rows)
    np.testing.assert_array_equal(nat, ref)


@pytest.mark.parametrize("L,k", [(51, 31), (48, 31), (37, 13)])
def test_plane_hash_matches_sorted_queries(L, k):
    reads = _uniform_reads(30, L)
    buf, max_reads, cap = 1 << 12, 256, 128
    (packed_s, lengths, nb, nr, _, strided), = _pack(reads, buf, max_reads, k, read_len=L)
    assert strided
    (packed_c, *_), = _pack(reads, buf, max_reads, k)
    arrays, index = _index_for(reads, k)
    table = index.table
    W = L - k + 1

    # continuous path: rolling hash + static slice + sort_queries
    R = buf // L
    lo, hi = hashing.rolling_kmer_hash_packed(jnp.asarray(packed_c), k)
    lo = lo[: R * L].reshape(R, L)[:, :W].reshape(R * W)
    hi = hi[: R * L].reshape(R, L)[:, :W].reshape(R * W)
    valid = (
        lax.broadcasted_iota(jnp.int32, (R, W), 0) < nr
    ).reshape(R * W)
    old_lo, old_hi = stream_probe.sort_queries(
        lo, hi, valid, table.n_buckets, table.seed, pad_to=cap
    )

    # plane path: strided packing + plane hash + plain sort
    m_lo, m_hi = hashing.plane_hash_mixed(
        jnp.asarray(packed_s), k, L, jnp.int32(nr), table.seed, pad_to=cap
    )
    new_lo, new_hi = lax.sort((m_lo, m_hi), dimension=0, num_keys=1, is_stable=False)

    n_valid = nr * W
    assert int(jnp.sum(new_lo != stream_probe.INVALID_WORD)) >= n_valid
    np.testing.assert_array_equal(
        np.asarray(old_lo)[:n_valid], np.asarray(new_lo)[:n_valid]
    )
    np.testing.assert_array_equal(
        np.asarray(old_hi)[:n_valid], np.asarray(new_hi)[:n_valid]
    )
    # everything past the valid prefix is the invalid pattern in both
    assert np.all(np.asarray(new_lo)[n_valid:] == stream_probe.INVALID_WORD)


@pytest.mark.parametrize("revcomp", [False, True])
def test_plane_chunk_step_counts_match_oracle(revcomp):
    L, k = 51, 31
    reads = _uniform_reads(60, L, with_n=True)
    arrays, index = _index_for(reads, k)
    config = MapperConfig(
        k=k, buf=1 << 12, max_reads=256, probe="stream", interpret=True,
        read_len=L, revcomp=revcomp, stream_cap=128,
    )
    mapper = KmerMapper(index, config)
    for packed, lengths, nb, nr, ninv, strided in _pack(
        reads, config.buf, config.max_reads, k, read_len=L
    ):
        assert strided
        mapper.map_chunk(packed, lengths, nb, ninv, strided=True)
    assert mapper.n_kmers_mapped == len(reads) * (L - k + 1)
    np.testing.assert_array_equal(
        mapper.node_counts(), _oracle_node_counts(arrays, reads, k, revcomp=revcomp)
    )

    # identical result through the continuous (slice) fast path
    mapper2 = KmerMapper(index, config)
    for packed, lengths, nb, nr, ninv in _pack(
        reads, config.buf, config.max_reads, k
    ):
        mapper2.map_chunk(packed, lengths, nb, ninv)
    np.testing.assert_array_equal(mapper2.node_counts(), mapper.node_counts())


@pytest.mark.parametrize("streams,revcomp", [(2, False), (3, False), (2, True)])
def test_plane_multi_stream_counts_match_oracle(streams, revcomp):
    """Multi-stream tiles: the chunk's window combos split into S
    independently sorted segments served by one kernel schedule — counts must
    be identical to the single-stream plane step and the oracle."""
    L, k = 51, 31
    reads = _uniform_reads(70, L, with_n=True)
    arrays, index = _index_for(reads, k)
    base = dict(k=k, buf=1 << 12, max_reads=256, probe="stream",
                interpret=True, read_len=L, revcomp=revcomp, stream_cap=128)
    mapper = KmerMapper(index, MapperConfig(streams=streams, **base))
    for packed, lengths, nb, nr, ninv, strided in _pack(
        reads, 1 << 12, 256, k, read_len=L
    ):
        assert strided
        mapper.map_chunk(packed, lengths, nb, ninv, strided=True)
    assert mapper.n_kmers_mapped == len(reads) * (L - k + 1)
    np.testing.assert_array_equal(
        mapper.node_counts(), _oracle_node_counts(arrays, reads, k, revcomp=revcomp)
    )


def test_plane_multi_stream_paged_schedule(monkeypatch):
    """streams=2 with the schedule forced into the HBM-paged mode: the paged
    page rows carry [meta | off_s x streams] — counts must match both the
    SMEM-mode result and the oracle."""
    from kmer_mapper_tpu.ops import stream_probe as sp

    L, k = 51, 31
    reads = _uniform_reads(60, L)
    arrays, index = _index_for(reads, k)
    config = MapperConfig(
        k=k, buf=1 << 12, max_reads=256, probe="stream", interpret=True,
        read_len=L, stream_cap=128, streams=2,
    )

    def run():
        mapper = KmerMapper(index, config)
        for packed, lengths, nb, nr, ninv, strided in _pack(
            reads, 1 << 12, 256, k, read_len=L
        ):
            mapper.map_chunk(packed, lengths, nb, ninv, strided=strided)
        return mapper.node_counts()

    meta = run()
    monkeypatch.setattr(sp, "SMEM_I32_BUDGET", 200)  # force paged mode
    paged = run()
    np.testing.assert_array_equal(meta, paged)
    np.testing.assert_array_equal(meta, _oracle_node_counts(arrays, reads, k))


def test_plane_multi_stream_heavy_duplicates():
    """Skewed queries (one read repeated everywhere) across segment bounds:
    every stream's window of the hot block must count exactly."""
    L, k = 37, 21
    hot = "".join(rng.choice(list("ACGT"), L))
    reads = [hot] * 90 + _uniform_reads(30, L)
    arrays, index = _index_for(reads, k)
    config = MapperConfig(
        k=k, buf=1 << 12, max_reads=256, probe="stream", interpret=True,
        read_len=L, stream_cap=128, streams=4,
    )
    mapper = KmerMapper(index, config)
    for packed, lengths, nb, nr, ninv, strided in _pack(
        reads, 1 << 12, 256, k, read_len=L
    ):
        mapper.map_chunk(packed, lengths, nb, ninv, strided=strided)
    np.testing.assert_array_equal(
        mapper.node_counts(), _oracle_node_counts(arrays, reads, k)
    )


def test_strided_chunks_generator_mixed_lengths_fallback():
    """Uniform buffers restride + take the plane step; a buffer containing an
    off-length read passes through continuous and takes the ragged step —
    counts equal the oracle either way."""
    L, k = 37, 21
    reads = _uniform_reads(50, L) + ["ACGT" * 20] + _uniform_reads(50, L)
    arrays, index = _index_for(reads, k)
    config = MapperConfig(
        k=k, buf=1 << 11, max_reads=64, probe="stream", interpret=True,
        read_len=L, stream_cap=128,
    )
    mapper = KmerMapper(index, config)
    tuples = list(
        pipeline._strided_chunks(
            iter(_pack(reads, config.buf, config.max_reads, k)), config
        )
    )
    flags = [t[5] for t in tuples]
    assert any(flags) and not all(flags)
    for packed, lengths, nb, nr, ninv, strided in tuples:
        mapper.map_chunk(packed, lengths, nb, ninv, strided=strided)
    np.testing.assert_array_equal(
        mapper.node_counts(), _oracle_node_counts(arrays, reads, k)
    )


def test_map_file_stream_plane_end_to_end(tmp_path):
    """pipeline.map_file with a stream-probe mapper on fixed-length reads
    drives the plane path (restride inside _strided_chunks) — vs oracle."""
    L, k = 31, 16
    reads = _uniform_reads(80, L, with_n=True)
    arrays, index = _index_for(reads, k)
    path = tmp_path / "reads.fa"
    path.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))

    import kmer_mapper_tpu.pipeline as pl

    orig = pl.default_config

    def force_stream(**kw):
        kw["probe"] = "stream"
        kw["interpret"] = True
        return orig(**kw)

    pl.default_config = force_stream
    try:
        got = pipeline.map_file(index, str(path), k=k, chunk_size=1 << 11,
                                progress=False)
    finally:
        pl.default_config = orig
    np.testing.assert_array_equal(got, _oracle_node_counts(arrays, reads, k))
