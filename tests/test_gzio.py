"""BGZF / fast-gzip input path (io/gzio.py)."""
from __future__ import annotations

import gzip
import struct
import zlib

import numpy as np
import pytest

from kmer_mapper_tpu.io import gzio, readers


def write_bgzf(path, payload: bytes, block_out: int = 60_000) -> None:
    """Minimal BGZF writer: independent gzip members with the BC/BSIZE extra
    field (bgzip's container format), plus the standard BGZF EOF block."""
    with open(path, "wb") as f:
        for off in range(0, len(payload), block_out):
            chunk = payload[off : off + block_out]
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(chunk) + co.flush()
            bsize = len(data) + 18 + 8 - 1  # header(12+6 extra) + data + crc/isize
            header = (
                b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
                + struct.pack("<H", 6)
                + b"BC"
                + struct.pack("<HH", 2, bsize)
            )
            f.write(header + data + struct.pack("<II", zlib.crc32(chunk), len(chunk) & 0xFFFFFFFF))
        # bgzip EOF marker: an empty BGZF block
        f.write(
            bytes.fromhex(
                "1f8b08040000000000ff0600424302001b0003000000000000000000"
            )
        )


@pytest.fixture
def needs_libdeflate():
    if gzio.libdeflate() is None:
        pytest.skip("libdeflate not available")


def test_bgzf_detection(tmp_path, needs_libdeflate):
    payload = b"x" * 100_000
    p = tmp_path / "a.gz"
    write_bgzf(p, payload)
    assert gzio.is_bgzf(str(p))
    plain = tmp_path / "b.gz"
    with gzip.open(plain, "wb") as f:
        f.write(payload)
    assert not gzio.is_bgzf(str(plain))


def test_bgzf_roundtrip_parallel(tmp_path, needs_libdeflate):
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 3_000_000, dtype=np.uint8).tobytes()
    p = tmp_path / "big.gz"
    write_bgzf(p, payload)
    r = gzio.open_gzip(str(p))
    assert isinstance(r, gzio.BgzfReader)
    got = bytearray()
    while True:
        b = r.read(123_457)  # awkward read size crosses block boundaries
        if not b:
            break
        got += b
    r.close()
    assert bytes(got) == payload


def test_bgzf_through_pipeline(tmp_path, needs_libdeflate):
    """A BGZF-compressed FASTQ maps identically to its plain version."""
    from kmer_mapper_tpu import oracle, pipeline
    from kmer_mapper_tpu.index import kmer_index as ki

    rng = np.random.default_rng(5)
    reads = ["".join(rng.choice(list("ACGT"), 80)) for _ in range(300)]
    fastq = "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n" for i, s in enumerate(reads))
    plain = tmp_path / "reads.fq"
    plain.write_text(fastq)
    bg = tmp_path / "reads.fq.gz"
    write_bgzf(bg, fastq.encode(), block_out=4000)

    codes = [oracle.encode_string(r) for r in reads]
    kmers = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), 7
    )
    entries = np.unique(rng.choice(kmers, 400))
    nodes = rng.integers(0, 40, len(entries)).astype(np.int32)
    arrays = oracle.build_kmer_index(entries, nodes, 499)
    index = ki.TpuKmerIndex.from_arrays(arrays)
    got_plain = pipeline.map_file(index, str(plain), k=7, progress=False)
    got_bgzf = pipeline.map_file(index, str(bg), k=7, progress=False)
    np.testing.assert_array_equal(got_plain, got_bgzf)


def test_plain_gzip_still_works(tmp_path):
    payload = b"@r0\nACGTACGTAC\n+\nIIIIIIIIII\n" * 500
    p = tmp_path / "p.fq.gz"
    with gzip.open(p, "wb") as f:
        f.write(payload)
    stream = readers.open_bytes(str(p))
    got = bytearray()
    while True:
        b = stream.read(1000)
        if not b:
            break
        got += b
    stream.close()
    assert bytes(got) == payload


def test_bgzf_with_trailing_plain_gzip_members(tmp_path, needs_libdeflate):
    """A BGZF file with plain-gzip members concatenated after it (cat a.bgzf
    b.fq.gz c.fq.gz): ordering must hold and every member must decode —
    one-shot zlib.decompress would silently drop all but the first."""
    rng = np.random.default_rng(1)
    head = rng.integers(0, 256, 400_000, dtype=np.uint8).tobytes()
    mid = b"MID" * 50_000
    tail = b"TAIL" * 25_000
    p = tmp_path / "mixed.gz"
    write_bgzf(p, head)
    with open(p, "ab") as f:
        f.write(gzip.compress(mid))
        f.write(gzip.compress(tail))
    r = gzio.open_gzip(str(p))
    assert isinstance(r, gzio.BgzfReader)
    got = bytearray()
    while True:
        b = r.read(77_777)
        if not b:
            break
        got += b
    r.close()
    assert bytes(got) == head + mid + tail


def test_bgzf_read_all_contract(tmp_path, needs_libdeflate):
    payload = b"xyz" * 100_000
    p = tmp_path / "r.gz"
    write_bgzf(p, payload)
    r = gzio.open_gzip(str(p))
    assert r.read(-1) == payload  # io contract: read-all
    r.close()


def test_bgzf_truncated_tail_raises(tmp_path, needs_libdeflate):
    p = tmp_path / "t.gz"
    write_bgzf(p, b"ok" * 50_000)
    with open(p, "ab") as f:
        f.write(gzip.compress(b"lost")[:-6])  # truncated trailing member
    r = gzio.open_gzip(str(p))
    with pytest.raises(OSError):
        r.read(-1)
    r.close()
