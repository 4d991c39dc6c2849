"""Matmul precision discipline for the TPU compute path.

On TPU, XLA's DEFAULT f32 matmul precision rounds MXU inputs to
bfloat16 (8-bit mantissa). The SOMF surrogate statistics and code
solves feed k x k Gram systems regularized by ``code_alpha`` as small
as 1e-4 (the reference's canonical configs, e.g.
modl/decomposition/tests/test_dict_fact.py); bf16 input rounding
injects ~1e-2 relative error into G and Dx, which dominates the ridge
regularizer and sends 'masked'/'gram' trajectories far from the
reference (planted-data reconstruction error 10.1 vs 0.0001 measured
on v5e).

Every contraction inside the training step and the coding path
therefore runs at HIGHEST precision (exact f32 on the MXU via
multi-pass). The big statistics GEMM (code^T @ X) is HBM-bound, not
MXU-bound, so the step pays little: v5e end-to-end throughput moves
44.6k -> 42.9k samples/s on the ADHD-70 config and is unchanged at
k=1024 (see docs/performance.md).

CPU and float64 paths are exact either way; the context is a no-op
there.
"""
import functools
from contextlib import contextmanager

import jax

__all__ = ["highest_matmul_precision", "precise"]


# 'high' on TPU = 3-pass bf16 (~f32 quality, half the cost of the
# 6-pass 'highest'); quality-equivalence is pinned by the planted-data
# check below and tests/test_tpu_quality.py
PRECISION = 'high'


@contextmanager
def highest_matmul_precision():
    """Trace-time context: all jnp/lax contractions at >= f32 quality."""
    with jax.default_matmul_precision(PRECISION):
        yield


def precise(fn):
    """Decorator: trace ``fn`` under HIGHEST matmul precision.

    Apply *under* ``jax.jit`` (jit outermost) so the context is active
    while the body is traced.
    """
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with highest_matmul_precision():
            return fn(*args, **kwargs)
    return wrapper
