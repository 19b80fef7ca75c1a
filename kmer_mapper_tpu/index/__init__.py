from .kmer_index import TpuKmerIndex, load_index, load_reference_npz, save_reference_npz
from .layout import BUCKET_KEYS, TableArrays, build_table, query_table

__all__ = [
    "TpuKmerIndex",
    "load_index",
    "load_reference_npz",
    "save_reference_npz",
    "TableArrays",
    "build_table",
    "query_table",
    "BUCKET_KEYS",
]
