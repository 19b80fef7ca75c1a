"""``kmer_mapper.gpu_counter`` drop-in (reference ``gpu_counter.py``)."""
from kmer_mapper_tpu.gpu_counter import GpuCounter, TpuCounter  # noqa: F401

__all__ = ["GpuCounter", "TpuCounter"]
