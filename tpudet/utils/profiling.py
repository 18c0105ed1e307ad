"""Profiling/timing helpers (SURVEY.md §5 tracing row).

``device_timeit`` is the canonical timing harness for BASELINE numbers: it
syncs through a tiny device->host fetch because ``jax.block_until_ready`` is
a no-op on this environment's experimental 'axon' TPU tunnel (verified
empirically — it reported 160x physical peak on a known matmul), and medians
out the per-dispatch RPC overhead when ``amortize_reps`` is used.

``trace`` wraps ``jax.profiler`` for Perfetto/TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


def sync(out) -> None:
    """Force completion of a computation's first leaf."""
    jax.device_get(jax.tree_util.tree_leaves(out)[0])


def device_timeit(fn: Callable[[], object], iters: int = 10,
                  warmup: int = 2) -> float:
    """Median seconds per call, post-compile, device-synced."""
    for _ in range(warmup):
        sync(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
