"""Randomized end-to-end sweeps: many (k, read-length, chunking, format,
revcomp, loader) combinations against the oracle. Catches interaction bugs the
targeted tests miss."""
import gzip

import numpy as np
import pytest

from kmer_mapper_tpu import oracle, pipeline
from kmer_mapper_tpu.index import kmer_index as ki


@pytest.mark.parametrize("trial", range(6))
def test_random_config_matches_oracle(tmp_path, trial):
    rng = np.random.default_rng(1000 + trial)
    k = int(rng.choice([2, 5, 12, 16, 17, 23, 31]))
    n_reads = int(rng.integers(20, 200))
    min_len = max(1, k - 3)
    reads = [
        "".join(rng.choice(list("ACGTN"), rng.integers(min_len, 170), p=[0.24] * 4 + [0.04]))
        for _ in range(n_reads)
    ]
    clean = [r.replace("N", "A") for r in reads]
    codes = [oracle.encode_string(r) for r in clean]
    read_kmers = oracle.kmer_hashes_ragged(
        np.concatenate(codes), np.array([len(c) for c in codes]), k
    )
    mask = np.uint64(4**k - 1) if k < 32 else np.uint64(-1)
    n_entries = int(rng.integers(10, 400))
    pool = (
        np.concatenate([read_kmers, rng.integers(0, 1 << 62, 200, dtype=np.uint64) & mask])
        if len(read_kmers)
        else rng.integers(0, 1 << 62, 200, dtype=np.uint64) & mask
    )
    entry_kmers = rng.choice(pool, n_entries)
    nodes = rng.integers(0, int(rng.integers(2, 300)), n_entries).astype(np.int32)
    freqs = rng.choice([1, 3, 1000, 1001], n_entries).astype(np.uint16)
    modulo = int(rng.choice([7, 101, 1999, 65537]))
    arrays = oracle.build_kmer_index(entry_kmers, nodes, modulo, frequencies=freqs)

    revcomp = bool(rng.integers(0, 2))
    fastq = bool(rng.integers(0, 2))
    gz = bool(rng.integers(0, 2))
    chunk_size = int(rng.choice([97, 1 << 10, 1 << 14]))
    suffix = (".fq" if fastq else ".fa") + (".gz" if gz else "")
    path = tmp_path / f"reads{suffix}"
    if fastq:
        text = "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n" for i, s in enumerate(reads))
    else:
        text = "".join(f">r{i}\n{s}\n" for i, s in enumerate(reads))
    if gz:
        from kmer_mapper_tpu.io import gzio
        if gzio.libdeflate() is not None and bool(rng.integers(0, 2)):
            from test_gzio import write_bgzf  # BGZF container variant

            write_bgzf(path, text.encode(), block_out=int(rng.choice([700, 5000])))
        else:
            with gzip.open(path, "wt") as f:
                f.write(text)
    else:
        path.write_text(text)

    # random parallel region framing (no-op for gz; tiny probe so the
    # test-sized files actually split)
    reader_workers = int(rng.choice([1, 3, 5]))
    if reader_workers > 1:
        from kmer_mapper_tpu.io import parallel_reader

        monkeypatched = parallel_reader._PROBE
        parallel_reader._PROBE = 128
    try:
        got = pipeline.map_file(
            ki.TpuKmerIndex.from_arrays(arrays),
            str(path),
            k=k,
            chunk_size=chunk_size,
            map_reverse_complements=revcomp,
            progress=False,
            reader_workers=reader_workers,
        )
    finally:
        if reader_workers > 1:
            parallel_reader._PROBE = monkeypatched
    queries = read_kmers
    if revcomp and len(queries):
        queries = np.concatenate([queries, oracle.revcomp_hash(queries, k)])
    expect = oracle.map_kmers_to_index(arrays, queries, max_node_id=arrays.max_node_id())
    np.testing.assert_array_equal(got, expect)
