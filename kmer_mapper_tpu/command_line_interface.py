"""Drop-in module-path alias for ``kmer_mapper.command_line_interface``.

The reference exposes ``main`` / ``run_argument_parser`` and the driver
``map_bnp(args)`` (``kmer_mapper/command_line_interface.py:28,82,155``); this
module maps them onto the TPU CLI so programmatic callers survive the package
rename. ``map_bnp`` accepts the reference's parsed-args object (including an
in-memory ``kmer_index``) and returns the node counts when ``output_file`` is
None, exactly like the reference.
"""
from __future__ import annotations

from .cli import main, run_argument_parser


def map_bnp(args):
    """Reference driver-signature parity (``command_line_interface.py:82-152``):
    run the mapping described by a parsed-args namespace."""
    from . import pipeline
    from .util import _get_kmer_index_from_args

    import numpy as np

    # -i / -b / in-memory precedence as in the reference (util.py:38-68)
    index = _get_kmer_index_from_args(args)
    node_counts = pipeline.map_file(
        index,
        args.reads,
        k=getattr(args, "kmer_size", 31),
        chunk_size=getattr(args, "chunk_size", 2_500_000),
        max_frequency=getattr(args, "max_hits_per_kmer", 1000),
        map_reverse_complements=bool(getattr(args, "map_reverse_complements", False)),
    )
    output_file = getattr(args, "output_file", None)
    if output_file is None:
        return node_counts
    np.save(output_file, node_counts)
    return None


__all__ = ["main", "run_argument_parser", "map_bnp"]
