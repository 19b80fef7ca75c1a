"""Drop-in module-path alias for ``kmer_mapper.util``.

Maps the reference's helper surface (``kmer_mapper/util.py``) onto this
package: index resolution, chunk hashing, the tuned file opener, and misc
helpers, so library callers survive the package rename.
"""
from __future__ import annotations

import sys

import numpy as np

from . import oracle
from .index.kmer_index import load_index
from .io.readers import open_bytes
from .tools import read_fasta, remap_array
from .utils.timing import log_memory_usage_now


def _get_kmer_index_from_args(args) -> object:
    """Reference ``util.py:38-68``: resolve -i/-b/in-memory index arguments.

    Accepts the same precedence: an in-memory index object on
    ``args.kmer_index``, else ``args.index_bundle``, else the ``-i`` path
    (.npz / minimal / bundle / pickled counter / .tpuidx all load)."""
    kmer_index = getattr(args, "kmer_index", None)
    bundle = getattr(args, "index_bundle", None)
    if kmer_index is None and bundle is None:
        import logging

        logging.error("Either a kmer index or an index bundle must be specified")
        sys.exit(1)
    return load_index(bundle if kmer_index is None else kmer_index)


def get_kmer_hashes_from_chunk_sequence(chunk_sequence, kmer_size: int) -> np.ndarray:
    """Reference ``util.py:71-75``: ragged sequences -> flat uint64 kmer
    hashes (windows never cross read boundaries).

    Accepts a list of strings/bytes, or a (bases uint8 array, lengths array)
    pair in place of the reference's bionumpy ragged array."""
    if isinstance(chunk_sequence, tuple):
        bases, lengths = chunk_sequence
        codes = oracle.encode_bytes(np.asarray(bases, dtype=np.uint8))
        lengths = np.asarray(lengths)
    else:
        seqs = [s.encode() if isinstance(s, str) else bytes(s) for s in chunk_sequence]
        codes = oracle.encode_bytes(np.frombuffer(b"".join(seqs), dtype=np.uint8))
        lengths = np.array([len(s) for s in seqs])
    return oracle.kmer_hashes_ragged(codes, lengths, kmer_size)


def open_file(path: str):
    """Reference ``util.py:78-101``: tuned reader for FASTA/FASTQ(.gz).
    Returns a binary stream of decompressed bytes (the framing itself lives in
    the pipeline; see ``io/readers.py`` / ``io/native.py``)."""
    return open_bytes(path)


__all__ = [
    "_get_kmer_index_from_args",
    "get_kmer_hashes_from_chunk_sequence",
    "open_file",
    "log_memory_usage_now",
    "read_fasta",
    "remap_array",
]
