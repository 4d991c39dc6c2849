"""Profiling helper tests."""
import time

import numpy as np

import jax.numpy as jnp

from modl_tpu.utils.profiling import StepTimer, sync


def test_sync_returns_scalar():
    x = jnp.arange(8.0)
    assert isinstance(sync(x), float)
    assert isinstance(sync({'a': x, 'b': x * 2}), float)


def test_step_timer():
    t = StepTimer()
    x = jnp.arange(128.0)
    for _ in range(3):
        with t.measure(result_fn=lambda: x):
            y = x * 2
    assert t.count == 3
    assert t.total > 0
    assert t.mean == t.total / 3
