"""Drop-in programmatic API matching the reference's library surface.

The reference is used as a library by KAGE: ``map_kmers_to_graph_index(index,
max_node_id, kmers, max_index_lookup_frequency)`` (``kmer_mapper/mapper.pyx:19``)
and ``in_graph_index(index, kmers)`` (``:81``). These wrappers accept either a
reference-layout :class:`~kmer_mapper_tpu.oracle.KmerIndexArrays`, a
:class:`~kmer_mapper_tpu.index.kmer_index.TpuKmerIndex`, or an index path, and
run on the accelerator when one is present (numpy oracle otherwise).
"""
from __future__ import annotations

import numpy as np

from . import oracle
from .index.kmer_index import TpuKmerIndex, load_index
from .models.mapper import KmerMapper, MapperConfig


def _as_tpu_index(index) -> TpuKmerIndex:
    return load_index(index)


def map_kmers_to_graph_index(
    index,
    max_node_id: int | None = None,
    kmers: np.ndarray | None = None,
    max_index_lookup_frequency: int = 1000,
) -> np.ndarray:
    """Per-node hit counts for a flat array of uint64 kmer hashes.

    Signature parity with ``kmer_mapper.mapper.map_kmers_to_graph_index``
    (``mapper.pyx:19-72``); unlike the reference CLI, the frequency cutoff
    argument is honored."""
    assert kmers is not None, "kmers required"
    tpu = _as_tpu_index(index)
    mapper = KmerMapper(tpu, MapperConfig(k=31, buf=256, max_reads=16))
    mapper.map_hashes(np.asarray(kmers, dtype=np.uint64))
    counts = mapper.node_counts(max_frequency=max_index_lookup_frequency)
    if max_node_id is not None and max_node_id + 1 != len(counts):
        out = np.zeros(max_node_id + 1, dtype=np.uint32)
        n = min(len(counts), max_node_id + 1)
        out[:n] = counts[:n]
        return out
    return counts


def in_graph_index(
    index, kmers: np.ndarray, max_index_lookup_frequency: int = 1000
) -> np.ndarray:
    """uint8[n] membership per kmer (``mapper.pyx:81-130``; the reference also
    ignores the frequency argument for membership)."""
    tpu = _as_tpu_index(index)
    mapper = KmerMapper(tpu, MapperConfig(k=31, buf=256, max_reads=16))
    return mapper.in_index(np.asarray(kmers, dtype=np.uint64))


# numpy-only equivalents (no accelerator required)
map_kmers_to_graph_index_numpy = oracle.map_kmers_to_index
in_graph_index_numpy = oracle.in_index
