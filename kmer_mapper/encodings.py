"""``kmer_mapper.encodings`` drop-in (reference ``encodings.py``)."""
from kmer_mapper_tpu.encodings import (  # noqa: F401
    ACTGTwoBitEncoding,
    BaseEncoding,
    SimpleEncoding,
    twobit_swap,
)

__all__ = [
    "ACTGTwoBitEncoding",
    "BaseEncoding",
    "SimpleEncoding",
    "twobit_swap",
]
