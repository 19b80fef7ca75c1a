"""Device-side DNA encoding: ASCII bytes -> 2-bit codes, on TPU.

Replaces bionumpy's ``as_encoded_array(..., DNAEncoding)`` (reference
``kmer_mapper/util.py:72``) with a single fused 256-entry table gather.
N/n encode to A (code 0), matching the reference's N->A substitution
(``command_line_interface.py:40-41``); other invalid bytes are flagged (the
reference would raise) and their windows can be reported by the pipeline.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import oracle

# 256-entry tables as module constants; jnp closes over them at trace time.
_CODE_TABLE = np.where(oracle.CODE_TABLE == oracle.INVALID_CODE, 0, oracle.CODE_TABLE).astype(
    np.uint8
)
_INVALID_TABLE = (oracle.CODE_TABLE == oracle.INVALID_CODE).astype(np.uint8)


def encode_bases(ascii_u8: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(codes uint32 in 0..3, invalid uint8 flags). Shape-preserving."""
    codes = jnp.asarray(_CODE_TABLE)[ascii_u8].astype(jnp.uint32)
    invalid = jnp.asarray(_INVALID_TABLE)[ascii_u8]
    return codes, invalid
