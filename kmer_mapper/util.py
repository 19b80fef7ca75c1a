"""``kmer_mapper.util`` drop-in (reference ``util.py``)."""
from kmer_mapper_tpu.util import (  # noqa: F401
    _get_kmer_index_from_args,
    get_kmer_hashes_from_chunk_sequence,
    log_memory_usage_now,
    open_file,
    read_fasta,
    remap_array,
)

__all__ = [
    "_get_kmer_index_from_args",
    "get_kmer_hashes_from_chunk_sequence",
    "open_file",
    "log_memory_usage_now",
    "read_fasta",
    "remap_array",
]
