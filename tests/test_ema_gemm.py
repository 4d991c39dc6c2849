"""In-place EMA-GEMM Pallas kernel vs the plain dot (interpret mode).

The kernel replaces ``B = pi * B + SC.T @ X`` at the deferred-B
segment end (reference modl/dict_fact.py:567-575's B EMA reordered
over a segment; _step.py::somf_scan). The in-kernel dot pins
``Precision.DEFAULT`` (see ops/ema_gemm.py docstring), and interpret
mode's emulation of that varies with the CPU backend configuration —
so the oracle inputs are pre-rounded to bf16-exact values, making the
single-pass-bf16 and exact-f32 dots identical and the comparison
precision-class-independent. The tiling / aliasing / EMA logic is what
these tests pin; the on-device precision class is pinned by
tests/test_tpu_quality.py.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import modl_tpu.ops.ema_gemm as eg


@pytest.fixture(autouse=True)
def interpret_mode():
    old = eg.INTERPRET, eg.ENABLED
    eg.INTERPRET = True
    eg.ENABLED = True      # gated off by default (measured net loss)
    yield
    eg.INTERPRET, eg.ENABLED = old


def _bf16_exact(a):
    """Round to the nearest bf16-representable value (stays float32)."""
    return np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return _bf16_exact(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("k,n,m", [
    (8, 256, 8),            # single exact tile
    (64, 700, 48),          # partial last column tile (700 % 256 != 0)
    (16, 300, 24),          # n < 2 tiles, partial
])
def test_matches_dot(k, n, m):
    B = _rand((k, n), 0)
    SC = _rand((m, k), 1)
    X = _rand((m, n), 2)
    pi = np.float32(0.75)   # bf16-exact scalar
    out = np.asarray(eg.ema_accumulate(B, SC, X, pi))
    ref = pi * B + SC.T @ X
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_pi_zero_and_one():
    k, n, m = 8, 256, 16
    B = _rand((k, n), 3)
    SC = _rand((m, k), 4)
    X = _rand((m, n), 5)
    prod = SC.T @ X
    np.testing.assert_allclose(
        np.asarray(eg.ema_accumulate(B, SC, X, np.float32(0.0))),
        prod, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(eg.ema_accumulate(B, SC, X, np.float32(1.0))),
        B + prod, rtol=1e-5, atol=1e-5)


def test_disabled_by_default():
    # measured net loss at HCP-1024 (module docstring): the estimator
    # path must never route here unless a user flips ENABLED for an A/B
    eg.ENABLED = False
    assert not eg.supported(1024, 210_000, 1200, jnp.float32)


def test_supported_gate():
    # flagship HCP shape fits; f64/bf16 and VMEM-busting shapes refused
    assert eg.supported(1024, 210_000, 1200, jnp.float32)
    assert not eg.supported(1024, 210_000, 1200, jnp.float64)
    assert not eg.supported(1024, 210_000, 1200, jnp.bfloat16)
    assert not eg.supported(1030, 210_000, 1200, jnp.float32)  # k % 8
    assert not eg.supported(1024, 210_000, 100_000, jnp.float32)  # VMEM
