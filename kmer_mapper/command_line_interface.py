"""``kmer_mapper.command_line_interface`` drop-in
(reference ``command_line_interface.py:28,82,155``). The ``kmer_mapper``
console script points at :func:`main` here, exactly like the reference's
entry point (``setup.py:31-33``).
"""
from kmer_mapper_tpu.command_line_interface import (  # noqa: F401
    main,
    map_bnp,
    map_cpu,
    map_gpu,
    run_argument_parser,
)

__all__ = ["main", "run_argument_parser", "map_bnp", "map_cpu", "map_gpu"]
