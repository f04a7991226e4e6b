"""Profiling and tracing utilities.

The reference's observability is cProfile scripts + pytest-benchmark
(SURVEY.md §5); the TPU-native equivalents are:

- :func:`trace_to` — capture an xprof/jax-profiler trace of a code block
  (viewable with xprof / tensorboard-plugin-profile).
- :func:`device_timer` — wall-time a chained device computation reliably
  (forces a host transfer; plain ``block_until_ready`` can return early
  through remote-tunnel TPU transports).
"""

from __future__ import annotations

import contextlib
import time
from collections.abc import Callable, Iterator


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """Capture a JAX profiler trace of the enclosed block into log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timer(step: Callable, iters: int = 10, warmup: int = 1) -> float:
    """Mean seconds per call of ``step(i) -> jax array``.

    ``step`` must return a (small) device value whose materialization
    transitively depends on all of the iteration's work; iterations should
    be chained by the caller if overlap must be excluded.
    """
    import numpy as np

    result = None
    for i in range(warmup):
        result = step(i)
    if result is not None:
        np.asarray(result)
    t0 = time.time()
    for i in range(iters):
        result = step(i)
    np.asarray(result)
    return (time.time() - t0) / iters
