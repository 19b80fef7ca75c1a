"""Oracle semantic-core tests: hash convention, encoding, revcomp, bucketed probe.

The hash convention is validated against an independent convolution formulation,
mirroring the reference's own oracle (reference tests/test_hashing.py:11-27).
"""
import numpy as np
import pytest

from kmer_mapper_tpu import oracle


def test_encode_basic():
    codes = oracle.encode_string("ACGT")
    assert codes.tolist() == [0, 1, 2, 3]
    assert oracle.encode_string("acgt").tolist() == [0, 1, 2, 3]
    # N maps to A (reference substitutes N->A before hashing, CLI :40-41)
    assert oracle.encode_string("NnA").tolist() == [0, 0, 0]
    with pytest.raises(ValueError):
        oracle.encode_string("ACGX")


def test_hash_first_base_least_significant():
    # "CA" with k=2: C=1 in bits [0,1], A=0 in bits [2,3] -> 1
    assert oracle.kmer_hashes(oracle.encode_string("CA"), 2).tolist() == [1]
    # "AC": A=0, C=1<<2 -> 4
    assert oracle.kmer_hashes(oracle.encode_string("AC"), 2).tolist() == [4]
    # "GTT" k=3: 2 + 3*4 + 3*16 = 62
    assert oracle.kmer_hashes(oracle.encode_string("GTT"), 3).tolist() == [62]


@pytest.mark.parametrize("k", [1, 2, 5, 16, 21, 31])
def test_hash_matches_convolve_oracle(k):
    rng = np.random.default_rng(k)
    codes = rng.integers(0, 4, 200).astype(np.uint8)
    a = oracle.kmer_hashes(codes, k)
    b = oracle.kmer_hashes_convolve(codes, k)
    np.testing.assert_array_equal(a, b)


def test_hash_windows_count_and_short_reads():
    codes = oracle.encode_string("ACGTA")
    assert len(oracle.kmer_hashes(codes, 3)) == 3
    assert len(oracle.kmer_hashes(codes, 5)) == 1
    assert len(oracle.kmer_hashes(codes, 6)) == 0


def test_ragged_hashes_do_not_cross_reads():
    r1 = oracle.encode_string("ACGT")
    r2 = oracle.encode_string("TTG")
    flat = np.concatenate([r1, r2])
    got = oracle.kmer_hashes_ragged(flat, np.array([4, 3]), 3)
    expect = np.concatenate([oracle.kmer_hashes(r1, 3), oracle.kmer_hashes(r2, 3)])
    np.testing.assert_array_equal(got, expect)
    # read shorter than k contributes nothing
    got2 = oracle.kmer_hashes_ragged(flat, np.array([4, 3]), 4)
    np.testing.assert_array_equal(got2, oracle.kmer_hashes(r1, 4))


@pytest.mark.parametrize("k", [1, 3, 16, 31])
def test_revcomp_hash(k):
    rng = np.random.default_rng(k + 100)
    codes = rng.integers(0, 4, 64).astype(np.uint8)
    h = oracle.kmer_hashes(codes, k)
    rc = oracle.revcomp_hash(h, k)
    # independent check: hash of the literally reverse-complemented sequence
    rc_codes = (3 - codes)[::-1]
    expect = oracle.kmer_hashes(rc_codes, k)[::-1]
    np.testing.assert_array_equal(rc, expect)
    # revcomp is an involution
    np.testing.assert_array_equal(oracle.revcomp_hash(rc, k), h)


def test_revcomp_string_example():
    # revcomp("ACGT") == "ACGT" (palindrome); revcomp("AAAC") == "GTTT"
    h = oracle.kmer_hashes(oracle.encode_string("ACGT"), 4)
    np.testing.assert_array_equal(oracle.revcomp_hash(h, 4), h)
    h2 = oracle.kmer_hashes(oracle.encode_string("AAAC"), 4)
    e2 = oracle.kmer_hashes(oracle.encode_string("GTTT"), 4)
    np.testing.assert_array_equal(oracle.revcomp_hash(h2, 4), e2)


def _toy_index(k=3, modulo=21):
    # kmers with deliberate duplicate (same kmer, two nodes) and shared buckets
    seqs = ["ACT", "CTT", "CCG", "ATT", "ACT"]
    kmers = np.array([oracle.kmer_hashes(oracle.encode_string(s), k)[0] for s in seqs])
    nodes = np.array([0, 1, 2, 3, 4], dtype=np.int32)
    return oracle.build_kmer_index(kmers, nodes, modulo), kmers


def test_map_kmers_counts_every_matching_entry():
    index, kmers = _toy_index()
    counts = oracle.map_kmers_to_index(index, kmers[:1], max_node_id=4)
    # query "ACT" matches two entries (nodes 0 and 4)
    np.testing.assert_array_equal(counts, [1, 0, 0, 0, 1])
    counts = oracle.map_kmers_to_index(index, kmers, max_node_id=4)
    np.testing.assert_array_equal(counts, [2, 1, 1, 1, 2])


def test_map_kmers_frequency_filter_strictly_greater():
    kmers = np.array([5, 9], dtype=np.uint64)
    nodes = np.array([0, 1], dtype=np.int32)
    index = oracle.build_kmer_index(kmers, nodes, 21, frequencies=np.array([1000, 1001]))
    counts = oracle.map_kmers_to_index(index, kmers, max_node_id=1, max_frequency=1000)
    # freq == 1000 passes (strict > skip, mapper.pyx:64), 1001 is skipped
    np.testing.assert_array_equal(counts, [1, 0])


def test_map_kmers_collision_rejection():
    # two kmers in the same bucket (same % modulo) must not cross-count
    modulo = 7
    kmers = np.array([3, 3 + modulo, 3 + 2 * modulo], dtype=np.uint64)
    nodes = np.array([0, 1, 2], dtype=np.int32)
    index = oracle.build_kmer_index(kmers, nodes, modulo)
    counts = oracle.map_kmers_to_index(index, np.array([3 + modulo], dtype=np.uint64), 2)
    np.testing.assert_array_equal(counts, [0, 1, 0])
    # absent kmer hashing into an occupied bucket counts nothing
    counts = oracle.map_kmers_to_index(index, np.array([3 + 3 * modulo], dtype=np.uint64), 2)
    np.testing.assert_array_equal(counts, [0, 0, 0])


def test_in_index():
    index, kmers = _toy_index()
    queries = np.concatenate([kmers[:2], np.array([12345], dtype=np.uint64)])
    got = oracle.in_index(index, queries)
    np.testing.assert_array_equal(got, [1, 1, 0])


def test_counter_semantics_match_probe_factorization():
    """GPU-path factorization (count unique kmers, then weighted bincount) must
    equal the CPU probe's node counts (reference §3.2 note)."""
    rng = np.random.default_rng(0)
    k = 31
    entry_kmers = rng.integers(0, 1 << 62, 50, dtype=np.uint64)
    entry_kmers = np.concatenate([entry_kmers, entry_kmers[:10]])  # dup kmers
    nodes = rng.integers(0, 30, len(entry_kmers)).astype(np.int32)
    index = oracle.build_kmer_index(entry_kmers, nodes, 101)
    queries = np.concatenate(
        [rng.choice(entry_kmers, 200), rng.integers(0, 1 << 62, 50, dtype=np.uint64)]
    )
    direct = oracle.map_kmers_to_index(index, queries, 29)

    unique = np.unique(entry_kmers)
    kcounts = oracle.count_unique_kmers(unique, queries)
    factored = oracle.node_counts_from_kmer_counts(
        index.kmers, index.nodes, unique, kcounts, min_nodes=29,
        entry_frequencies=index.frequencies, max_frequency=1000,
    )
    np.testing.assert_array_equal(direct, factored)
