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
therefore runs at ``PRECISION = 'high'``: 3-pass bf16 on the MXU,
which carries ~f32 input quality at roughly half the cost of the
6-pass 'highest' (exact f32). The step-down from HIGHEST was measured
quality-neutral on the planted-data reconstruction check and the
on-device pins in tests/test_tpu_quality.py, while the big statistics
GEMM (code^T @ X) is HBM-bound either way, so the end-to-end cost is
small: v5e throughput 44.6k -> 42.9k samples/s on the ADHD-70 config,
unchanged at k=1024 (docs/performance.md).

A handful of k x k products that are accumulated *incrementally across
the whole fit* (the maintained Gram, C) request
``jax.lax.Precision.HIGHEST`` explicitly at their call sites in
``_step.py`` — incremental bf16 noise would random-walk there.

CPU and float64 paths are exact either way; the context is a no-op
there.
"""
import functools
from contextlib import contextmanager

import jax

__all__ = ["highest_matmul_precision", "matmul_precision", "precise"]


# 'high' on TPU = 3-pass bf16 (~f32 input quality, half the cost of the
# 6-pass 'highest'); quality-equivalence vs HIGHEST is pinned by the
# planted-data check above and tests/test_tpu_quality.py
PRECISION = 'high'


@contextmanager
def matmul_precision():
    """Trace-time context: all jnp/lax contractions at >= f32 quality
    (``PRECISION``, see module docstring)."""
    with jax.default_matmul_precision(PRECISION):
        yield


# Historical name (the context originally forced HIGHEST; it now applies
# PRECISION='high', measured quality-equivalent). Kept as an alias so
# call sites and pickles stay valid.
highest_matmul_precision = matmul_precision


def precise(fn):
    """Decorator: trace ``fn`` under the ``PRECISION`` matmul context.

    Apply *under* ``jax.jit`` (jit outermost) so the context is active
    while the body is traced.
    """
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with matmul_precision():
            return fn(*args, **kwargs)
    return wrapper
