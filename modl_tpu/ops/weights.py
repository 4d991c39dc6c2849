"""Step-weight schedules for the SOMF/OMF surrogate updates.

Replaces ``_batch_weight`` (dict_fact_fast.pyx:115-122) with a closed-form
product over a static-size ``arange`` (batch_size is static under jit,
``count`` may be traced).
"""
import jax.numpy as jnp

__all__ = ["batch_weight", "sample_weight"]


def batch_weight(count, batch_size, learning_rate, offset=0.0, dtype=jnp.float32):
    """``w = 1 - prod_{i=count+1-b}^{count} (1 - ((1+offset)/(offset+i))^lr)``.

    Mirrors dict_fact_fast.pyx:115-122. ``count`` is the post-increment
    iteration counter (n_iter_ after adding the batch), ``batch_size``
    must be static.
    """
    i = jnp.arange(1 - batch_size, 1, dtype=dtype) + jnp.asarray(count, dtype)
    terms = 1.0 - ((1.0 + offset) / (offset + i)) ** learning_rate
    return 1.0 - jnp.prod(terms)


def sample_weight(sample_n_iter, sample_learning_rate, dtype=jnp.float32):
    """Per-sample EMA weight ``t^-sample_learning_rate`` (dict_fact.py:513)."""
    return jnp.asarray(sample_n_iter, dtype) ** (-sample_learning_rate)
