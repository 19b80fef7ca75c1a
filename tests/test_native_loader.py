"""Native C++ data loader vs numpy framer: bit-identical packed buffers."""
import gzip
import io

import numpy as np
import pytest

from kmer_mapper_tpu.io import native, readers

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader unavailable (no g++)"
)


def _numpy_path(data: bytes, fmt, max_bases, max_reads, k, block):
    chunks = readers.read_chunks(io.BytesIO(data), fmt=fmt, min_chunk_size=block)
    return list(readers.pack_for_device(chunks, max_bases, max_reads, k))


def _native_path(data: bytes, fmt, max_bases, max_reads, k, block):
    return list(
        native.pack_stream_native(io.BytesIO(data), fmt, max_bases, max_reads, k, block)
    )


def _assert_same(a, b):
    assert len(a) == len(b), (len(a), len(b))
    for (p1, l1, nb1, nr1, ni1), (p2, l2, nb2, nr2, ni2) in zip(a, b):
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(l1, l2)
        assert (nb1, nr1, ni1) == (nb2, nr2, ni2)


def _random_reads(rng, n, lo=10, hi=120, alphabet="ACGT"):
    return ["".join(rng.choice(list(alphabet), rng.integers(lo, hi))) for _ in range(n)]


@pytest.mark.parametrize("block", [64, 300, 1 << 16])
def test_fastq_matches_numpy(block):
    rng = np.random.default_rng(0)
    reads = _random_reads(rng, 150)
    data = "".join(f"@r{i} c\n{s}\n+\n{'F' * len(s)}\n" for i, s in enumerate(reads)).encode()
    args = ("fastq", 1024, 64, 31, block)
    _assert_same(_native_path(data, *args), _numpy_path(data, *args))


@pytest.mark.parametrize("block", [64, 511, 1 << 16])
def test_fasta_multiline_matches_numpy(block):
    rng = np.random.default_rng(1)
    reads = _random_reads(rng, 100, lo=5, hi=200)
    parts = []
    for i, s in enumerate(reads):
        wrapped = "\n".join(s[j : j + 60] for j in range(0, len(s), 60))
        parts.append(f">r{i}\n{wrapped}\n")
    data = "".join(parts).encode()
    args = ("fasta", 1024, 64, 31, block)
    _assert_same(_native_path(data, *args), _numpy_path(data, *args))


def test_fasta_crlf_and_no_trailing_newline():
    data = b">a\r\nACGT\r\nTTAA\r\n>b\r\nGGCC"
    args = ("fasta", 256, 16, 5, 32)
    _assert_same(_native_path(data, *args), _numpy_path(data, *args))


def test_n_and_invalid_bases_counted():
    data = b">a\nACGTNNXACGT\n"
    got = _native_path(data, "fasta", 256, 16, 5, 64)
    expect = _numpy_path(data, "fasta", 256, 16, 5, 64)
    _assert_same(got, expect)
    assert got[0][4] == 1  # one invalid (X); N's count as A


def test_long_read_split_matches_numpy():
    rng = np.random.default_rng(2)
    long_read = "".join(rng.choice(list("ACGT"), 3000))
    data = f">chr\n{long_read}\n".encode()
    args = ("fasta", 512, 64, 31, 200)
    _assert_same(_native_path(data, *args), _numpy_path(data, *args))


def test_fastq_lowercase_and_short_reads():
    data = b"@a\nacgtn\n+\n!!!!!\n@b\nAC\n+\n!!\n@c\nggttaacc\n+zz\n!!!!!!!!\n"
    args = ("fastq", 128, 8, 3, 16)
    _assert_same(_native_path(data, *args), _numpy_path(data, *args))


def test_fastq_truncated_raises():
    data = b"@a\nACGT\n+\n!!!!\n@b\nACG\n"
    with pytest.raises(ValueError, match="truncated FASTQ"):
        _native_path(data, "fastq", 128, 8, 3, 16)


def test_fastq_bad_header_raises():
    data = b"xa\nACGT\n+\n!!!!\n"
    with pytest.raises(ValueError, match="header"):
        _native_path(data, "fastq", 128, 8, 3, 16)


def test_gzip_stream_end_to_end(tmp_path):
    rng = np.random.default_rng(3)
    reads = _random_reads(rng, 200)
    text = "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n" for i, s in enumerate(reads))
    path = tmp_path / "r.fq.gz"
    with gzip.open(path, "wt") as f:
        f.write(text)
    stream = readers.open_bytes(str(path))
    got = list(native.pack_stream_native(stream, "fastq", 2048, 128, 31, 1024))
    expect = _numpy_path(text.encode(), "fastq", 2048, 128, 31, 1024)
    _assert_same(got, expect)


def test_pipeline_native_vs_numpy_counts(tmp_path, monkeypatch):
    """End-to-end map_file must give identical node counts on both loaders."""
    from kmer_mapper_tpu import oracle, pipeline
    from kmer_mapper_tpu.index import kmer_index as ki

    rng = np.random.default_rng(4)
    k = 7
    reads = _random_reads(rng, 100, alphabet="ACGTN")
    codes = [oracle.encode_string(r.replace("N", "A")) for r in reads]
    read_kmers = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    entry_kmers = rng.choice(read_kmers, 200)
    arrays = oracle.build_kmer_index(
        entry_kmers, rng.integers(0, 60, 200).astype(np.int32), 997
    )
    path = tmp_path / "reads.fa"
    path.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    idx = ki.TpuKmerIndex.from_arrays(arrays)
    native_counts = pipeline.map_file(idx, str(path), k=k, chunk_size=1 << 14)
    monkeypatch.setenv("KMT_NO_NATIVE", "1")
    numpy_counts = pipeline.map_file(idx, str(path), k=k, chunk_size=1 << 14)
    np.testing.assert_array_equal(native_counts, numpy_counts)
    expect = oracle.map_kmers_to_index(arrays, read_kmers)
    np.testing.assert_array_equal(native_counts, expect)


def test_fastq_long_read_resume_across_buffers():
    """A FASTQ record longer than a whole device buffer resumes across
    buffers with k-1 overlap, matching the numpy packer exactly."""
    rng = np.random.default_rng(6)
    long_seq = "".join(rng.choice(list("ACGT"), 2000))
    data = (
        f"@a\n{long_seq}\n+\n{'I' * 2000}\n@b\nACGTACGTACGT\n+\n{'I' * 12}\n"
    ).encode()
    args = ("fastq", 256, 64, 21, 128)
    _assert_same(_native_path(data, *args), _numpy_path(data, *args))


# --- strided (word-plane) layout emitted directly by the C++ pass ----------


def _numpy_path_rl(data: bytes, fmt, max_bases, max_reads, k, block, read_len):
    chunks = readers.read_chunks(io.BytesIO(data), fmt=fmt, min_chunk_size=block)
    return list(
        readers.pack_for_device(chunks, max_bases, max_reads, k, read_len=read_len)
    )


def _native_path_rl(data: bytes, fmt, max_bases, max_reads, k, block, read_len):
    return list(
        native.pack_stream_native(
            io.BytesIO(data), fmt, max_bases, max_reads, k, block, read_len=read_len
        )
    )


def _assert_same6(a, b):
    assert len(a) == len(b), (len(a), len(b))
    for (p1, l1, nb1, nr1, ni1, s1), (p2, l2, nb2, nr2, ni2, s2) in zip(a, b):
        assert s1 == s2
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(l1, l2)
        assert (nb1, nr1, ni1) == (nb2, nr2, ni2)


@pytest.mark.parametrize("block", [64, 300, 1 << 16])
def test_strided_fastq_uniform_matches_numpy(block):
    """Uniform-length FASTQ with read_len: the C++ pass emits the word-plane
    strided layout directly, bit-identical to pack_for_device(read_len=L)."""
    rng = np.random.default_rng(10)
    L = 37
    reads = ["".join(rng.choice(list("ACGTN"), L)) for _ in range(200)]
    data = "".join(f"@r{i}\n{s}\n+\n{'F' * L}\n" for i, s in enumerate(reads)).encode()
    args = ("fastq", 1024, 64, 31, block, L)
    got, expect = _native_path_rl(data, *args), _numpy_path_rl(data, *args)
    assert all(t[5] for t in got)  # every buffer conforms -> strided
    _assert_same6(got, expect)


def test_strided_fasta_wrapped_lines_matches_numpy():
    """FASTA records wrapped across lines still conform when the TOTAL
    length is read_len."""
    rng = np.random.default_rng(11)
    L = 100
    parts = []
    for i in range(80):
        s = "".join(rng.choice(list("ACGT"), L))
        wrapped = "\n".join(s[j : j + 60] for j in range(0, L, 60))
        parts.append(f">r{i}\n{wrapped}\n")
    data = "".join(parts).encode()
    args = ("fasta", 1 << 12, 64, 31, 200, L)
    got, expect = _native_path_rl(data, *args), _numpy_path_rl(data, *args)
    assert all(t[5] for t in got)
    _assert_same6(got, expect)


@pytest.mark.parametrize("block", [128, 1 << 16])
def test_strided_mixed_lengths_fall_back_per_buffer(block):
    """Buffers containing an off-length read re-frame continuously (identical
    greedy boundaries); conforming buffers stay strided — exactly
    pack_for_device's per-buffer decision."""
    rng = np.random.default_rng(12)
    L = 41
    reads = ["".join(rng.choice(list("ACGT"), L)) for _ in range(120)]
    reads[30] = reads[30][:-3]  # short read
    reads[77] = reads[77] + "ACGT"  # long read
    data = "".join(f"@r{i}\n{s}\n+\n{'F' * len(s)}\n" for i, s in enumerate(reads)).encode()
    args = ("fastq", 512, 64, 31, block, L)
    got, expect = _native_path_rl(data, *args), _numpy_path_rl(data, *args)
    flags = [t[5] for t in got]
    assert any(flags) and not all(flags)
    _assert_same6(got, expect)


def test_strided_nonconforming_at_exact_capacity_boundary():
    """A nonconforming record that would NOT have fit the current buffer is a
    plain capacity stop: the all-conforming buffer ships strided and the
    off-length record opens the (continuous) next buffer."""
    rng = np.random.default_rng(13)
    L = 32
    reads = ["".join(rng.choice(list("ACGT"), L)) for _ in range(8)]
    reads.append("".join(rng.choice(list("ACGT"), L + 5)))
    reads += ["".join(rng.choice(list("ACGT"), L)) for _ in range(3)]
    data = "".join(f"@r{i}\n{s}\n+\n{'F' * len(s)}\n" for i, s in enumerate(reads)).encode()
    # max_bases = exactly 8 conforming reads
    args = ("fastq", 8 * L, 64, 31, 1 << 16, L)
    got, expect = _native_path_rl(data, *args), _numpy_path_rl(data, *args)
    assert got[0][5] is True and got[0][3] == 8
    assert got[1][5] is False
    _assert_same6(got, expect)


def test_strided_long_record_split_falls_back():
    """Records longer than the buffer (split with k-1 overlap) are never
    conforming; the whole stream re-frames continuously and still matches."""
    rng = np.random.default_rng(14)
    long_seq = "".join(rng.choice(list("ACGT"), 2000))
    data = (
        f"@a\n{long_seq}\n+\n{'I' * 2000}\n@b\n{'ACGT' * 8}\n+\n{'I' * 32}\n"
    ).encode()
    args = ("fastq", 256, 64, 21, 128, 32)
    got, expect = _native_path_rl(data, *args), _numpy_path_rl(data, *args)
    _assert_same6(got, expect)


def test_strided_invalid_read_len_disables():
    """read_len below k or above the buffer silently packs continuous."""
    rng = np.random.default_rng(15)
    L = 40
    reads = ["".join(rng.choice(list("ACGT"), L)) for _ in range(20)]
    data = "".join(f"@r{i}\n{s}\n+\n{'F' * L}\n" for i, s in enumerate(reads)).encode()
    for bad_rl in (2048,):  # > max_bases
        got = _native_path_rl(data, "fastq", 1024, 64, 31, 1 << 16, bad_rl)
        expect = _numpy_path(data, "fastq", 1024, 64, 31, 1 << 16)
        _assert_same(got, expect)


def test_zero_length_record_at_full_buffer_carries_over():
    """A zero-length record arriving exactly when the buffer is full must be
    a capacity stop (ships the buffer, opens the next one with a 0-length
    entry), never silently consumed: emit_record signals it with -1 because
    done == 0 == sp.total would otherwise read as "completed". Covers the
    continuous path, the strided path (nonconforming record at capacity ->
    strided buffer ships, next buffer re-frames continuously), and FASTA."""
    rng = np.random.default_rng(16)
    L = 32
    reads = ["".join(rng.choice(list("ACGT"), L)) for _ in range(4)]
    reads.append("")  # zero-length read lands at n_reads == max_reads
    reads += ["".join(rng.choice(list("ACGT"), L)) for _ in range(2)]
    fq = "".join(
        f"@r{i}\n{s}\n+\n{'F' * len(s)}\n" for i, s in enumerate(reads)
    ).encode()
    args = ("fastq", 1 << 12, 4, 31, 1 << 16)
    got, expect = _native_path(fq, *args), _numpy_path(fq, *args)
    assert len(got) == 2 and got[1][1][0] == 0  # 0-length opens buffer 2
    _assert_same(got, expect)

    got6 = _native_path_rl(fq, *args, L)
    expect6 = _numpy_path_rl(fq, *args, L)
    assert got6[0][5] is True and got6[1][5] is False
    _assert_same6(got6, expect6)

    fa = "".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)).encode()
    args_fa = ("fasta", 1 << 12, 4, 31, 1 << 16)
    _assert_same(_native_path(fa, *args_fa), _numpy_path(fa, *args_fa))
