from .mapper import KmerMapper, MapperConfig, chunk_step, make_step

__all__ = ["KmerMapper", "MapperConfig", "chunk_step", "make_step"]
