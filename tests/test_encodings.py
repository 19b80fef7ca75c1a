"""Legacy codec parity (kmer_mapper_tpu/encodings.py vs the reference's
kmer_mapper/encodings.py surface): bit tables, complement XOR, 2-bit swap."""
import numpy as np
import pytest

from kmer_mapper_tpu.encodings import (
    ACTGTwoBitEncoding,
    BaseEncoding,
    SimpleEncoding,
    twobit_swap,
)


def test_base_encoding_roundtrip():
    arr = BaseEncoding.from_string("AcTg")
    assert arr.dtype == np.uint8 and BaseEncoding.to_string(arr) == "AcTg"
    assert BaseEncoding.from_bytes(arr) is arr and BaseEncoding.to_bytes(arr) is arr


def test_packing_bit_convention():
    """Legacy codes A=0 C=1 T=2 G=3, first base least-significant
    (reference encodings.py:26-28): 'ACTG' packs to 0b11_10_01_00."""
    packed = ACTGTwoBitEncoding.from_string("ACTG")
    assert packed.dtype == np.uint8 and packed.tolist() == [0b11100100]
    # case-insensitive like the reference's `& 31`
    assert ACTGTwoBitEncoding.from_string("actg").tolist() == [0b11100100]


def test_roundtrip_lowercase():
    s = "ACTGGTCAACCTTGGA"
    packed = ACTGTwoBitEncoding.from_string(s)
    assert ACTGTwoBitEncoding.to_string(packed) == s.lower()
    assert SimpleEncoding.to_string(SimpleEncoding.from_string(s)) == s.lower()


def test_simple_equals_actg():
    rng = np.random.default_rng(0)
    seq = rng.choice(np.frombuffer(b"ACTGactg", dtype=np.uint8), 64)
    np.testing.assert_array_equal(
        SimpleEncoding.from_bytes(seq), ACTGTwoBitEncoding.from_bytes(seq)
    )


def test_length_must_be_multiple_of_four():
    with pytest.raises(AssertionError):
        ACTGTwoBitEncoding.from_string("ACT")


def test_complement_is_base_complement():
    """XOR 0b10101010 flips A<->T and C<->G per packed base
    (reference encodings.py:45-48)."""
    packed = ACTGTwoBitEncoding.from_string("ACTGGTCA")
    comp = ACTGTwoBitEncoding.complement(packed)
    np.testing.assert_array_equal(comp, ACTGTwoBitEncoding.from_string("TGACCAGT"))
    # dtype is preserved through the uint8 view
    as64 = np.frombuffer(packed.tobytes() * 8, dtype=np.uint64)
    assert ACTGTwoBitEncoding.complement(as64).dtype == np.uint64


def test_twobit_swap_reverses_digits():
    """twobit_swap reverses the 2-bit groups of each integer (reference
    encodings.py:104-112) — independent base-4 digit oracle."""
    rng = np.random.default_rng(1)
    for dtype, ndig in [(np.uint8, 4), (np.uint16, 8), (np.uint32, 16), (np.uint64, 32)]:
        digits = rng.integers(0, 4, (5, ndig)).astype(np.uint64)
        fwd = (digits * (np.uint64(4) ** np.arange(ndig, dtype=np.uint64))).sum(1)
        rev = (digits[:, ::-1] * (np.uint64(4) ** np.arange(ndig, dtype=np.uint64))).sum(1)
        got = twobit_swap(fwd.astype(dtype))
        assert got.dtype == dtype
        np.testing.assert_array_equal(got.astype(np.uint64), rev.astype(dtype).astype(np.uint64))


def test_swap_complement_is_reverse_complement():
    """twobit_swap(complement(packed)) == packed reverse complement of the
    string — the legacy revcomp recipe the reference composed these for."""
    s = "ACTGGTCAACCTTGGATTGGCCAAGGTTCCAA"
    rc = s[::-1].translate(str.maketrans("ACGT", "TGCA"))
    packed = ACTGTwoBitEncoding.from_string(s)
    # one uint64 holds all 32 bases; swap reverses base order across the word
    word = packed.view(np.uint64)
    got = twobit_swap(ACTGTwoBitEncoding.complement(word))
    np.testing.assert_array_equal(
        got, ACTGTwoBitEncoding.from_string(rc).view(np.uint64)
    )
