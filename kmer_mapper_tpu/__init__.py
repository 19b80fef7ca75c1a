"""kmer_mapper_tpu: a TPU-native (JAX/XLA/Pallas) k-mer mapping framework.

From-scratch rebuild of the capabilities of ivargr/kmer_mapper: stream
FASTA/FASTQ (optionally gzipped) short reads, 2-bit-encode on device, extract
rolling-window k-mer hashes, probe them against a graph k-mer index resident in
HBM, and accumulate per-graph-node hit counts — bit-exact against the
reference's numpy/Cython semantics, scaling over TPU meshes via shard_map.
"""

from . import oracle
from .index.kmer_index import (
    TpuKmerIndex,
    load_index,
    load_reference_npz,
    save_reference_npz,
)
from .oracle import KmerIndexArrays, build_kmer_index

__version__ = "0.1.0"

__all__ = [
    "oracle",
    "TpuKmerIndex",
    "load_index",
    "load_reference_npz",
    "save_reference_npz",
    "KmerIndexArrays",
    "build_kmer_index",
    "__version__",
]
