"""Profiling helpers (SURVEY 5: tracing/profiling).

The estimators keep the reference's manual accounting (``time_``,
``io_time_``/``cpu_time_``, scorer callbacks that subtract their own
test time). This module adds the device-level layer: a context manager
around ``jax.profiler`` traces, and a simple step timer with the
scalar-sync discipline tunneled TPU backends require.
"""
import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["device_trace", "StepTimer", "sync"]


def sync(x):
    """True device sync: fetch a scalar derived from ``x``.

    ``block_until_ready`` can return early on tunneled backends;
    transferring 4 bytes cannot.
    """
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]))


@contextlib.contextmanager
def device_trace(logdir):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates wall time over step calls with correct syncing."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def measure(self, result_fn=None):
        t0 = time.perf_counter()
        yield
        if result_fn is not None:
            sync(result_fn())
        self.total += time.perf_counter() - t0
        self.count += 1

    @property
    def mean(self):
        return self.total / max(self.count, 1)
