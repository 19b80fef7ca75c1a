from . import multihost
from .mesh import DATA_AXIS, INDEX_AXIS, make_mesh
from .sharded import ShardedKmerMapper, batch_packed_chunks, make_finalize, make_sharded_step

__all__ = [
    "multihost",
    "DATA_AXIS",
    "INDEX_AXIS",
    "make_mesh",
    "ShardedKmerMapper",
    "batch_packed_chunks",
    "make_finalize",
    "make_sharded_step",
]
