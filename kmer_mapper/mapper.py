"""``kmer_mapper.mapper`` drop-in (reference ``mapper.pyx:19,81,137``).

Zero-edit import path for KAGE-style callers:
``from kmer_mapper.mapper import map_kmers_to_graph_index``.
"""
from kmer_mapper_tpu.mapper import (  # noqa: F401
    in_graph_index,
    in_graph_index_no_memory_maps,
    map_kmers_to_graph_index,
)

__all__ = [
    "map_kmers_to_graph_index",
    "in_graph_index",
    "in_graph_index_no_memory_maps",
]
