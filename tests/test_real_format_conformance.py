"""Conformance: ``load_index`` against the REAL packages' artifact formats.

Every artifact here is written by ``tests/gki_conformance.py``, which
replicates the published ``graph_kmer_index`` / ``shared_memory_wrapper``
writers byte-level (field names, dtypes, 0-d scalars, object-array Nones,
pickle-named-npz containers, extensionless paths). Counts are pinned
bit-exact against the numpy oracle end to end (VERDICT r3 next-step #1;
reference read sites: ``util.py:38-68``, ``mapper.pyx:22-29``).
"""
from __future__ import annotations

import numpy as np
import pytest

from kmer_mapper_tpu import compat, oracle
from kmer_mapper_tpu.index.kmer_index import load_index

from gki_conformance import (
    make_real_counter_index_obj,
    make_real_kmer_index_obj,
    write_collision_free_npz,
    write_index_bundle,
    write_minimal_npz,
    write_shared_memory_wrapper_file,
)


def _arrays(rng, n=400, n_nodes=60, modulo=997, with_high_freq=True):
    kmers = np.unique(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    entry_kmers = np.concatenate([kmers, rng.choice(kmers, n // 5)])
    nodes = rng.integers(0, n_nodes, len(entry_kmers)).astype(np.int32)
    freqs = None
    if with_high_freq:
        freqs = rng.choice([1, 3, 1001], len(entry_kmers), p=[0.8, 0.1, 0.1]).astype(
            np.uint16
        )
    return oracle.build_kmer_index(entry_kmers, nodes, modulo, frequencies=freqs)


def _queries(rng, arrays, n_miss=300):
    hits = rng.choice(arrays.kmers, 500)
    misses = rng.integers(0, 1 << 62, n_miss, dtype=np.uint64)
    return np.concatenate([hits, misses])


def _check_counts(index, arrays, queries, max_frequency=1000):
    got = compat.map_kmers_to_graph_index(
        index, arrays.max_node_id(), queries, max_index_lookup_frequency=max_frequency
    )
    want = oracle.map_kmers_to_index(
        arrays, queries, max_node_id=arrays.max_node_id(), max_frequency=max_frequency
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("wide", [True, False])
def test_collision_free_npz(tmp_path, wide):
    """The full 8-field KmerIndex .npz, both the from_flat_kmers 64-bit layout
    and the post-convert_to_int32 layout; frequency filter honored."""
    rng = np.random.default_rng(41)
    arrays = _arrays(rng)
    real = write_collision_free_npz(tmp_path / "index", arrays, wide=wide)
    assert real.endswith(".npz")
    index = load_index(real)
    _check_counts(index, arrays, _queries(rng, arrays))


def test_collision_free_npz_extensionless_path(tmp_path):
    """Production KAGE configs pass extensionless paths (the real from_file
    tries path + '.npz' first)."""
    rng = np.random.default_rng(42)
    arrays = _arrays(rng)
    write_collision_free_npz(tmp_path / "human_index", arrays)
    index = load_index(str(tmp_path / "human_index"))  # no .npz suffix
    _check_counts(index, arrays, _queries(rng, arrays))


def test_collision_free_npz_none_object_fields(tmp_path):
    """None attributes become 0-d object arrays in the real writer's savez;
    the loader must skip them (allele_frequencies) and default them
    (frequencies -> filter inert) instead of tripping allow_pickle."""
    rng = np.random.default_rng(43)
    arrays = _arrays(rng, with_high_freq=False)  # loader defaults freq to 1
    real = write_collision_free_npz(
        tmp_path / "nofreq", arrays, allele_frequencies="none", frequencies=False
    )
    index = load_index(real)
    _check_counts(index, arrays, _queries(rng, arrays))


def test_minimal_npz(tmp_path):
    """MinimalKmerIndex 5-field form ('minimal' in filename selects the class
    in the reference; the loader handles it uniformly)."""
    rng = np.random.default_rng(44)
    arrays = _arrays(rng, with_high_freq=False)
    real = write_minimal_npz(tmp_path / "minimal_index", arrays)
    index = load_index(real)
    _check_counts(index, arrays, _queries(rng, arrays))


def test_pickled_counter_index_real_layout(tmp_path):
    """shared_memory_wrapper pickle (named .npz, NOT a zip) of a
    CounterKmerIndex with RaggedArray-bucketed keys/values."""
    rng = np.random.default_rng(45)
    kmers = np.unique(rng.integers(0, 1 << 62, 300, dtype=np.uint64))
    entry_kmers = np.concatenate([kmers, rng.choice(kmers, 50)])
    nodes = rng.integers(0, 40, len(entry_kmers)).astype(np.int32)
    obj = make_real_counter_index_obj(kmers, entry_kmers, nodes)
    real = write_shared_memory_wrapper_file(tmp_path / "counter_index", obj)
    assert real.endswith(".npz")
    index = load_index(real)
    assert index.n_unique == len(kmers)
    arrays = oracle.build_kmer_index(entry_kmers, nodes, 997)
    _check_counts(index, arrays, _queries(rng, arrays))


@pytest.mark.parametrize("as_object", [True, False])
def test_pickled_index_bundle(tmp_path, as_object):
    """IndexBundle pickles (bundle object or raw indexes dict), with decoy
    bundle members that must not be mistaken for the kmer index."""
    rng = np.random.default_rng(46)
    arrays = _arrays(rng)
    real = write_index_bundle(tmp_path / "bundle", arrays, as_object=as_object)
    index = load_index(real)
    assert index.n_unique == len(np.unique(arrays.kmers))  # not the 3-kmer decoy
    _check_counts(index, arrays, _queries(rng, arrays))


def test_pickled_full_kmer_index(tmp_path):
    """A directly pickled CollisionFreeKmerIndex (underscore attrs, wide
    dtypes) — the shared_memory_wrapper fallback can also surface these."""
    rng = np.random.default_rng(47)
    arrays = _arrays(rng)
    obj = make_real_kmer_index_obj(arrays)
    real = write_shared_memory_wrapper_file(tmp_path / "full_index", obj)
    index = load_index(real)
    _check_counts(index, arrays, _queries(rng, arrays))


def test_cli_maps_real_format_index(tmp_path):
    """End-to-end through the CLI driver with a real-format npz: counts equal
    the oracle on a synthesized FASTA."""
    from kmer_mapper_tpu.command_line_interface import map_bnp
    import types

    rng = np.random.default_rng(48)
    k = 7
    reads = ["".join(rng.choice(list("ACGT"), 60)) for _ in range(50)]
    codes = [oracle.encode_string(r) for r in reads]
    kmers = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    entries = np.unique(rng.choice(kmers, 300))
    nodes = rng.integers(0, 30, len(entries)).astype(np.int32)
    arrays = oracle.build_kmer_index(entries, nodes, 499)
    real = write_collision_free_npz(tmp_path / "idx", arrays)
    reads_path = tmp_path / "r.fa"
    reads_path.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    args = types.SimpleNamespace(
        kmer_index=str(tmp_path / "idx"),  # extensionless, like KAGE configs
        index_bundle=None,
        reads=str(reads_path),
        kmer_size=k,
        output_file=None,
    )
    got = map_bnp(args)
    want = oracle.map_kmers_to_index(arrays, kmers, max_node_id=int(nodes.max()))
    np.testing.assert_array_equal(got, want)


def test_extensionless_prefers_npz_when_both_exist(tmp_path):
    """The real from_file tries path + '.npz' BEFORE the bare name — when
    both files exist, the .npz twin must win (advisor r4)."""
    rng = np.random.default_rng(48)
    arrays_npz = _arrays(rng)
    write_collision_free_npz(tmp_path / "both", arrays_npz)
    # a DIFFERENT valid index at the bare path: picking it would "work" but
    # return the wrong index, so n_unique disambiguates which file was read
    arrays_bare = _arrays(rng, n=40)
    import shutil

    bare_src = write_collision_free_npz(tmp_path / "baretmp", arrays_bare)
    shutil.move(bare_src, tmp_path / "both")
    index = load_index(str(tmp_path / "both"))
    assert index.n_unique == len(np.unique(arrays_npz.kmers))
    _check_counts(index, arrays_npz, _queries(rng, arrays_npz))


def test_none_plain_field_with_real_underscored_twin(tmp_path):
    """A 0-d object-None PLAIN field must not mask a real '_'-prefixed twin:
    _npz_get keeps trying the underscored variant (advisor r4). Pinned via
    the frequency filter — dropping _frequencies would change the counts."""
    rng = np.random.default_rng(49)
    arrays = _arrays(rng, with_high_freq=True)
    path = tmp_path / "mixed.npz"
    np.savez(
        path,
        hashes_to_index=arrays.hashes_to_index.astype(np.int64),
        n_kmers=arrays.n_kmers.astype(np.int64),
        nodes=arrays.nodes.astype(np.uint32),
        ref_offsets=np.arange(len(arrays.kmers), dtype=np.uint64),
        kmers=arrays.kmers.astype(np.uint64),
        modulo=int(arrays.modulo),
        frequencies=np.array(None, dtype=object),  # None-valued plain field
        _frequencies=arrays.frequencies.astype(np.uint16),  # the real data
        allele_frequencies=np.array(None, dtype=object),
    )
    index = load_index(str(path))
    _check_counts(index, arrays, _queries(rng, arrays))


def test_pickled_bundle_reverse_kmer_index_decoy(tmp_path):
    """A bundle member whose NAME merely contains 'kmer_index' as a substring
    (reverse_kmer_index) and is index-shaped must not be harvested: the
    match is on an exact path segment (advisor r4). The decoy is ordered
    FIRST so substring matching would have picked it."""
    from gki_conformance import (
        _fake_class,
        make_real_kmer_index_obj,
    )

    rng = np.random.default_rng(50)
    arrays = _arrays(rng)
    Decoy = _fake_class("graph_kmer_index.flat_kmers", "FlatKmers")
    d = Decoy()
    d._kmers = np.array([5, 6, 7], dtype=np.uint64)
    d._nodes = np.array([1, 1, 1], dtype=np.uint32)
    indexes = {
        "reverse_kmer_index": d,  # walk reaches this first
        "kmer_index": make_real_kmer_index_obj(arrays),
    }
    real = write_shared_memory_wrapper_file(tmp_path / "bundle_rev", indexes)
    index = load_index(real)
    assert index.n_unique == len(np.unique(arrays.kmers))  # not the 3-kmer decoy
    _check_counts(index, arrays, _queries(rng, arrays))
