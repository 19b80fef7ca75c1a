"""Host I/O tests: FASTA/FASTQ framing, gzip, carry-over, device packing."""
import gzip

import numpy as np
import pytest

from kmer_mapper_tpu.io import readers


def _write(tmp_path, name, text, gz=False):
    path = tmp_path / name
    data = text.encode()
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        path.write_bytes(data)
    return str(path)


def _collect(path, **kw):
    seqs = []
    for chunk in readers.read_chunks(path, **kw):
        ends = np.append(chunk.read_starts[1:], chunk.n_bases)
        for s, e in zip(chunk.read_starts, ends):
            seqs.append(bytes(chunk.bases[s:e]).decode())
    return seqs


def test_fasta_two_line(tmp_path):
    path = _write(tmp_path, "x.fa", ">r1\nACGT\n>r2\nTTGACA\n")
    assert _collect(path) == ["ACGT", "TTGACA"]


def test_fasta_multiline_and_no_trailing_newline(tmp_path):
    path = _write(tmp_path, "x.fa", ">r1\nACGT\nTTAA\nCC\n>r2\nGG")
    assert _collect(path) == ["ACGTTTAACC", "GG"]


def test_fasta_crlf(tmp_path):
    path = _write(tmp_path, "x.fa", ">r1\r\nACGT\r\n>r2\r\nTT\r\n")
    assert _collect(path) == ["ACGT", "TT"]


def test_fasta_chunked_carry_over(tmp_path):
    # tiny min_chunk_size forces records to straddle block boundaries
    seqs = ["ACGTACGTAC", "TT", "GGGAAACCCTTTGGG", "A" * 50, "CGCG"]
    text = "".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs))
    path = _write(tmp_path, "x.fa", text)
    for block in (4, 7, 16, 64):
        assert _collect(path, min_chunk_size=block) == seqs


def test_fastq(tmp_path):
    text = "@r1\nACGT\n+\n!!!!\n@r2\nTTGA\n+r2\nIIII\n"
    path = _write(tmp_path, "x.fq", text)
    assert _collect(path) == ["ACGT", "TTGA"]


def test_fastq_chunked_and_gzipped(tmp_path):
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), rng.integers(20, 80))) for _ in range(100)]
    text = "".join(f"@read{i}\n{s}\n+\n{'I' * len(s)}\n" for i, s in enumerate(seqs))
    path = _write(tmp_path, "x.fq.gz", text, gz=True)
    for block in (97, 1024):
        assert _collect(path, min_chunk_size=block) == seqs


def test_fasta_gzipped(tmp_path):
    path = _write(tmp_path, "x.fa.gz", ">a\nACGTAC\n>b\nGGTT\n", gz=True)
    assert _collect(path) == ["ACGTAC", "GGTT"]


def test_fastq_truncated_raises(tmp_path):
    path = _write(tmp_path, "x.fq", "@r1\nACGT\n+\n!!!!\n@r2\nACGT\n")
    with pytest.raises(ValueError, match="truncated FASTQ"):
        _collect(path)


def test_fastq_malformed_header_raises(tmp_path):
    path = _write(tmp_path, "x.fq", "r1\nACGT\n+\n!!!!\n")
    with pytest.raises(ValueError, match="FASTQ"):
        _collect(path)


def test_detect_format():
    assert readers.detect_format("x.fa") == "fasta"
    assert readers.detect_format("x.fasta.gz") == "fasta"
    assert readers.detect_format("x.fq.gz") == "fastq"
    assert readers.detect_format("x.fastq") == "fastq"
    assert readers.detect_format("x.bin", peek=b">abc") == "fasta"
    assert readers.detect_format("x.bin", peek=b"@abc") == "fastq"
    with pytest.raises(ValueError):
        readers.detect_format("x.bin", peek=b"junk")


def _unpack_host(packed, n):
    codes = np.zeros(len(packed) * 16, dtype=np.uint8)
    for i in range(16):
        codes[i::16] = (packed >> np.uint32(2 * i)) & 3
    return codes[:n]


def test_pack_for_device_shapes_and_content(tmp_path):
    from kmer_mapper_tpu import oracle

    rng = np.random.default_rng(1)
    seqs = ["".join(rng.choice(list("ACGT"), rng.integers(5, 60))) for _ in range(200)]
    text = "".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs))
    path = _write(tmp_path, "x.fa", text)
    max_bases, max_reads, k = 512, 32, 31
    got = []
    for packed, lengths, n_bases, n_reads, n_invalid in readers.pack_for_device(
        readers.read_chunks(path, min_chunk_size=300), max_bases, max_reads, k
    ):
        assert packed.shape == (max_bases // 16 + 2,)
        assert lengths.shape == (max_reads,)
        assert n_bases <= max_bases and n_reads <= max_reads
        assert n_invalid == 0
        assert (lengths[n_reads:] == 0).all()
        codes = _unpack_host(packed, n_bases)
        starts = np.cumsum(lengths[:n_reads]) - lengths[:n_reads]
        for s, ln in zip(starts, lengths[:n_reads]):
            got.append(oracle.decode_to_string(codes[s : s + ln]))
    assert got == seqs


def test_pack_for_device_long_read_split_preserves_kmers(tmp_path):
    """A read longer than the device buffer is split with k-1 overlap; the
    window set is preserved exactly."""
    from kmer_mapper_tpu import oracle

    rng = np.random.default_rng(2)
    k = 7
    long_read = "".join(rng.choice(list("ACGT"), 1000))
    path = _write(tmp_path, "x.fa", f">r\n{long_read}\n")
    max_bases = 256
    all_kmers = []
    for packed, lengths, n_bases, n_reads, _ in readers.pack_for_device(
        readers.read_chunks(path), max_bases, 32, k
    ):
        codes = _unpack_host(packed, n_bases)
        all_kmers.append(
            oracle.kmer_hashes_ragged(codes, lengths[:n_reads].astype(np.int64), k)
        )
    got = np.concatenate(all_kmers)
    expect = oracle.kmer_hashes(oracle.encode_string(long_read), k)
    np.testing.assert_array_equal(got, expect)


def test_threaded_gz_reader_matches_plain(tmp_path):
    rng = np.random.default_rng(5)
    seqs = ["".join(rng.choice(list("ACGT"), 80)) for _ in range(500)]
    text = "".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs))
    path = tmp_path / "x.fa.gz"
    with gzip.open(path, "wt") as f:
        f.write(text)
    threaded = readers.open_bytes(str(path), threaded_gz=True)
    plain = readers.open_bytes(str(path), threaded_gz=False)
    a = b"".join(iter(lambda: threaded.read(7777), b""))
    b = plain.read(1 << 30)
    assert a == b
    threaded.close()
    plain.close()


def test_threaded_reader_propagates_errors(tmp_path):
    path = tmp_path / "bad.fa.gz"
    path.write_bytes(b"not gzip at all")
    stream = readers.open_bytes(str(path))
    with pytest.raises(Exception):
        while stream.read(4096):
            pass
