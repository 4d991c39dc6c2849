"""Dictionary stability metrics (reference: modl/decomposition/stability.py).

Amari discrepancy between dictionaries; the pairwise mean runs the
normalized cross-correlation as one batched device matmul instead of
joblib process fan-out.
"""
from itertools import combinations
from typing import List

import numpy as np

import jax.numpy as jnp

__all__ = ["amari_discrepency", "mean_amari_discrepency"]


def amari_discrepency(D1, D2):
    """0.5 (mean(1 - max_col C) + mean(1 - max_row C)) for the normalized
    cross-correlation C (stability.py:7-23)."""
    D1 = jnp.asarray(D1)
    D2 = jnp.asarray(D2)
    C = (D1 @ D2.T
         / jnp.sqrt(jnp.sum(D1 ** 2, axis=1))[:, None]
         / jnp.sqrt(jnp.sum(D2 ** 2, axis=1))[None, :])
    return float(.5 * (jnp.mean(1 - C.max(axis=0))
                       + jnp.mean(1 - C.max(axis=1))))


def mean_amari_discrepency(dictionaries: List[np.ndarray], n_jobs=1):
    """Mean/std of pairwise discrepancies (stability.py:25-30)."""
    discrepencies = [amari_discrepency(D1, D2)
                     for D1, D2 in combinations(dictionaries, 2)]
    return (float(np.mean(discrepencies)), float(np.std(discrepencies)))
