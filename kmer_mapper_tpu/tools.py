"""Small data utilities (reference dev-script parity: ``shuffle_fasta.py``)."""
from __future__ import annotations

import random

import numpy as np

from .io import readers


def shuffle_fasta(in_path: str, out_path: str, seed: int | None = None) -> int:
    """Write a record-shuffled copy of a FASTA file; returns record count."""
    records: list[tuple[int, str]] = []
    i = 0
    for chunk in readers.read_chunks(in_path, fmt="fasta"):
        ends = np.append(chunk.read_starts[1:], chunk.n_bases)
        for s, e in zip(chunk.read_starts, ends):
            records.append((i, bytes(chunk.bases[s:e]).decode()))
            i += 1
    rng = random.Random(seed)
    rng.shuffle(records)
    with open(out_path, "w") as f:
        for idx, seq in records:
            f.write(f">{idx}\n{seq}\n")
    return len(records)
