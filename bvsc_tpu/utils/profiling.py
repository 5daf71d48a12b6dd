"""Profiling helpers: readback-synced timing + jax.profiler traces.

The reference's only instrumentation is wall-clock s/batch prints
(``third_party/BigVGAN/train.py:255,322-323``); here we add a proper timing
harness and Perfetto trace capture.

IMPORTANT platform note: on tunneled TPU platforms ``jax.block_until_ready``
may return before execution finishes — :func:`sync` forces completion by
reading back one scalar.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


def sync(tree) -> float:
    """Force completion of every array in the pytree (scalar readback)."""
    leaf = jax.tree.leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])


def time_jitted(fn, *args, iters: int = 5, warmup: int = 1) -> float:
    """Median-free mean seconds/iter with proper completion syncing."""
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a Perfetto/XPlane trace viewable in TensorBoard or
    ui.perfetto.dev."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
