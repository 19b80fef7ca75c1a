"""On-device profiling helpers.

Structured replacement for the reference's ad-hoc perf_counter spans
(SURVEY §5.1): ``jax.profiler`` traces viewable in TensorBoard/Perfetto, plus
named step annotations around the chunk loop.
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for everything inside the context."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Annotate a region (e.g. one chunk step) in the profiler timeline."""
    return jax.profiler.StepTraceAnnotation(name)
