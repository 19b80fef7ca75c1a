"""Lightweight observability: wall-clock spans and RSS logging.

Mirrors the reference's ad-hoc ``time.perf_counter()`` DEBUG spans
(``command_line_interface.py`` passim) and ``log_memory_usage_now``
(``util.py:33-35``); for on-device profiles use ``jax.profiler`` (see
``utils/profiling.py``).
"""
from __future__ import annotations

import contextlib
import logging
import resource
import time

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def span(name: str, level: int = logging.DEBUG):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.log(level, "%s took %.4f sec", name, time.perf_counter() - t0)


def log_memory_usage_now(logplace: str = "") -> float:
    gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    logger.info("Memory usage (%s): %.4f GB", logplace, gb)
    return gb
