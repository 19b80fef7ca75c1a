"""Byte-region-parallel host framing (io/parallel_reader.py): region splits
land exactly on record boundaries, every record is framed exactly once, and
the parallel pipeline's node counts equal the sequential pipeline's
(reference ``-t`` parity: command_line_interface.py:124-130)."""
import numpy as np
import pytest

from kmer_mapper_tpu import oracle, pipeline
from kmer_mapper_tpu.io import parallel_reader, readers
from kmer_mapper_tpu.index import kmer_index as ki


def _reads(rng, n, lo=20, hi=90):
    return ["".join(rng.choice(list("ACGT"), rng.integers(lo, hi))) for _ in range(n)]


def _write_fasta(path, reads, multiline=False):
    out = []
    for i, s in enumerate(reads):
        body = "\n".join(s[j : j + 17] for j in range(0, len(s), 17)) if multiline else s
        out.append(f">read{i} desc\n{body}\n")
    path.write_text("".join(out))
    return str(path)


def _write_fastq(path, reads, rng, adversarial=True):
    """Quality strings that start with '@' or '+' (the classic splitter trap)."""
    out = []
    for i, s in enumerate(reads):
        lead = rng.choice(["@", "+", "I"]) if adversarial else "I"
        qual = lead + "I" * (len(s) - 1)
        out.append(f"@q{i} xx\n{s}\n+\n{qual}\n")
    path.write_text("".join(out))
    return str(path)


def _region_reads(path, fmt, region):
    """All read strings framed from one byte region."""
    stream = parallel_reader.RangeReader(path, *region)
    try:
        got = []
        for chunk in readers.read_chunks(stream, fmt=fmt, min_chunk_size=512):
            starts = chunk.read_starts
            lens = chunk.read_lengths
            got += [
                chunk.bases[s : s + l].tobytes().decode()
                for s, l in zip(starts, lens)
            ]
        return got
    finally:
        stream.close()


@pytest.mark.parametrize("fmt,multiline", [("fasta", False), ("fasta", True), ("fastq", False)])
def test_split_regions_partition_exact(tmp_path, fmt, multiline):
    rng = np.random.default_rng(3)
    reads = _reads(rng, 400)
    if fmt == "fasta":
        path = _write_fasta(tmp_path / "r.fa", reads, multiline=multiline)
    else:
        path = _write_fastq(tmp_path / "r.fq", reads, rng)
    for n in (2, 3, 7):
        regions = parallel_reader.split_regions(path, fmt, n, min_region=256)
        # disjoint, exhaustive, ordered
        assert regions[0][0] == 0
        assert regions[-1][1] == __import__("os").path.getsize(path)
        for (a, b), (c, d) in zip(regions, regions[1:]):
            assert b == c and a < b
        # every record framed exactly once, in order
        got = []
        for r in regions:
            got += _region_reads(path, fmt, r)
        assert got == reads


def test_split_regions_fastq_boundary_in_quality(tmp_path):
    """Force boundaries to land inside quality lines that begin with '@':
    a naive '\\n@' splitter would mis-start; ours must validate the 4-line
    pattern and land on true headers only."""
    rng = np.random.default_rng(5)
    # uniform lengths make many boundaries fall at the same record phase
    reads = _reads(rng, 300, lo=40, hi=41)
    path = (tmp_path / "r.fq")
    path.write_text("".join(f"@q{i}\n{s}\n+\n@" + "I" * 39 + "\n" for i, s in enumerate(reads)))
    for n in (2, 5, 11):
        regions = parallel_reader.split_regions(str(path), "fastq", n, min_region=128)
        got = []
        for r in regions:
            got += _region_reads(str(path), "fastq", r)
        assert got == reads


def _oracle_counts(arrays, reads, k):
    codes = [oracle.encode_string(r) for r in reads]
    hashes = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    return oracle.map_kmers_to_index(arrays, hashes)


def _index(rng, reads, k):
    codes = [oracle.encode_string(r) for r in reads]
    read_kmers = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    entry = np.concatenate(
        [rng.choice(read_kmers, 120), rng.integers(0, 1 << 62, 40, dtype=np.uint64)]
    )
    nodes = rng.integers(0, 60, len(entry)).astype(np.int32)
    return oracle.build_kmer_index(entry, nodes, 997)


@pytest.mark.parametrize("no_native", [False, True])
def test_parallel_map_file_counts_equal(tmp_path, monkeypatch, no_native):
    """map_file with reader_workers > 1 returns counts identical to the
    sequential run and to the oracle (native C++ and numpy framers)."""
    if no_native:
        monkeypatch.setenv("KMT_NO_NATIVE", "1")
    # small probe so a test-sized file actually splits
    monkeypatch.setattr(parallel_reader, "_PROBE", 512)
    k = 9
    rng = np.random.default_rng(21)
    reads = _reads(rng, 500)
    arrays = _index(rng, reads, k)
    path = _write_fasta(tmp_path / "r.fa", reads)
    want = _oracle_counts(arrays, reads, k)
    seq = pipeline.map_file(
        ki.TpuKmerIndex.from_arrays(arrays), path, k=k, chunk_size=1 << 13,
        progress=False,
    )
    par = pipeline.map_file(
        ki.TpuKmerIndex.from_arrays(arrays), path, k=k, chunk_size=1 << 13,
        progress=False, reader_workers=4,
    )
    np.testing.assert_array_equal(seq, want)
    np.testing.assert_array_equal(par, want)


def test_parallel_map_file_fastq_adversarial(tmp_path, monkeypatch):
    monkeypatch.setattr(parallel_reader, "_PROBE", 256)
    k = 7
    rng = np.random.default_rng(33)
    reads = _reads(rng, 400, lo=30, hi=31)
    arrays = _index(rng, reads, k)
    path = _write_fastq(tmp_path / "r.fq", reads, rng)
    want = _oracle_counts(arrays, reads, k)
    par = pipeline.map_file(
        ki.TpuKmerIndex.from_arrays(arrays), path, k=k, chunk_size=1 << 12,
        progress=False, reader_workers=5,
    )
    np.testing.assert_array_equal(par, want)


def test_parallel_single_region_fallbacks(tmp_path):
    """Tiny files and gzipped inputs stay sequential (one region / no split)."""
    rng = np.random.default_rng(8)
    reads = _reads(rng, 5)
    path = _write_fasta(tmp_path / "tiny.fa", reads)
    regions = parallel_reader.split_regions(path, "fasta", 8)  # default min_region
    assert regions == [(0, __import__("os").path.getsize(path))]
    k = 7
    arrays = _index(rng, reads, k)
    got = pipeline.map_file(
        ki.TpuKmerIndex.from_arrays(arrays), path, k=k, progress=False,
        reader_workers=8,
    )
    np.testing.assert_array_equal(got, _oracle_counts(arrays, reads, k))


def test_worker_error_propagates(tmp_path, monkeypatch):
    """A malformed record inside one region surfaces as the framer's error
    (a wrong split can never silently corrupt counts). FASTQ: a broken '+'
    separator line deep in the file."""
    monkeypatch.setattr(parallel_reader, "_PROBE", 256)
    rng = np.random.default_rng(44)
    reads = _reads(rng, 200, lo=30, hi=31)
    path = tmp_path / "bad.fq"
    records = [f"@q{i}\n{s}\n+\n{'I' * len(s)}\n" for i, s in enumerate(reads)]
    records[150] = records[150].replace("\n+\n", "\nX\n")
    path.write_text("".join(records))
    k = 7
    arrays = _index(rng, reads, k)
    with pytest.raises(Exception):
        pipeline.map_file(
            ki.TpuKmerIndex.from_arrays(arrays), str(path), k=k, progress=False,
            reader_workers=4,
        )


def test_giant_record_merges_regions(tmp_path, monkeypatch):
    """A record far larger than the probe bound (a genome-scale FASTA
    chromosome) must not break the split: targets landing inside it merge
    into the previous region and every base still maps exactly once."""
    monkeypatch.setattr(parallel_reader, "_PROBE", 256)
    monkeypatch.setattr(parallel_reader, "_PROBE_BOUND", 1024)
    rng = np.random.default_rng(55)
    small = _reads(rng, 30, lo=40, hi=60)
    giant = "".join(rng.choice(list("ACGT"), 20_000))
    reads = small[:10] + [giant] + small[10:]
    path = tmp_path / "genome.fa"
    path.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    regions = parallel_reader.split_regions(str(path), "fasta", 8, min_region=512)
    assert regions[-1][1] == __import__("os").path.getsize(path)
    got = []
    for r in regions:
        got += _region_reads(str(path), "fasta", r)
    assert got == reads
    # end-to-end: counts equal oracle (long read split with k-1 overlap)
    k = 9
    arrays = _index(rng, reads, k)
    par = pipeline.map_file(
        ki.TpuKmerIndex.from_arrays(arrays), str(path), k=k, progress=False,
        reader_workers=8, chunk_size=1 << 12,
    )
    np.testing.assert_array_equal(par, _oracle_counts(arrays, reads, k))
