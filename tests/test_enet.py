"""Oracle tests for the elastic-net ball geometry kernels.

Follows the reference's oracle-vs-fast pattern
(modl/utils/math/tests/test_enet.py): a slow, independent numpy
implementation (bisection on the KKT threshold) checks the vectorised
sort-based kernel.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from modl_tpu.ops import (enet_norm, enet_projection, enet_projection_batch,
                          enet_scale)
from modl_tpu.ops.enet import enet_projection_bisect


def enet_norm_np(v, l1_ratio):
    a = np.abs(v)
    return np.sum(a * (l1_ratio + (1 - l1_ratio) * a))


def enet_projection_slow(v, radius, l1_ratio):
    """Independent oracle: bisection on the shrinkage threshold lambda."""
    v = np.asarray(v, dtype=np.float64)
    if radius == 0:
        return np.zeros_like(v)
    if l1_ratio == 0:
        norm2 = np.sum(v ** 2)
        if norm2 <= radius:
            return v.copy()
        return v / np.sqrt(norm2 / radius)
    gamma = 2.0 / l1_ratio - 2.0
    r = radius / l1_ratio
    b = np.abs(v)
    if np.sum(b * (1 + gamma / 2 * b)) <= r:
        return v.copy()

    def scaled_norm(lam):
        w = np.maximum(b - lam, 0) / (1 + lam * gamma)
        return np.sum(w * (1 + gamma / 2 * w))

    lo, hi = 0.0, np.max(b)
    for _ in range(200):
        mid = (lo + hi) / 2
        if scaled_norm(mid) > r:
            lo = mid
        else:
            hi = mid
    lam = (lo + hi) / 2
    return np.sign(v) * np.maximum(b - lam, 0) / (1 + lam * gamma)


@pytest.mark.parametrize("l1_ratio", [0.0, 0.1, 0.5, 0.9, 1.0])
@pytest.mark.parametrize("radius", [0.5, 1.0, 3.0])
def test_enet_projection_matches_oracle(l1_ratio, radius):
    rng = np.random.RandomState(0)
    for _ in range(5):
        v = rng.randn(60) * 2
        expected = enet_projection_slow(v, radius, l1_ratio)
        got = np.asarray(enet_projection(jnp.asarray(v), radius, l1_ratio))
        np.testing.assert_allclose(got, expected, atol=1e-6)


@pytest.mark.parametrize("l1_ratio", [0.0, 0.2, 0.5, 1.0])
def test_enet_projection_lands_on_ball(l1_ratio):
    rng = np.random.RandomState(1)
    radius = 1.0
    for _ in range(5):
        v = rng.randn(80) * 3
        proj = np.asarray(enet_projection(jnp.asarray(v), radius, l1_ratio))
        norm = enet_norm_np(proj, l1_ratio)
        assert norm <= radius + 1e-6
        if enet_norm_np(v, l1_ratio) > radius:
            # projection of an outside point lands on the boundary
            np.testing.assert_allclose(norm, radius, rtol=1e-5)


def test_enet_projection_inside_is_identity():
    rng = np.random.RandomState(2)
    v = rng.randn(30) * 0.01
    for l1_ratio in [0.0, 0.5, 1.0]:
        proj = np.asarray(enet_projection(jnp.asarray(v), 1.0, l1_ratio))
        np.testing.assert_allclose(proj, v, atol=1e-12)


def test_enet_projection_zero_radius():
    v = np.ones(10)
    for l1_ratio in [0.0, 0.5, 1.0]:
        proj = np.asarray(enet_projection(jnp.asarray(v), 0.0, l1_ratio))
        np.testing.assert_array_equal(proj, np.zeros(10))


def test_enet_projection_batch():
    rng = np.random.RandomState(3)
    V = rng.randn(8, 40)
    radii = rng.rand(8) + 0.5
    got = np.asarray(enet_projection_batch(jnp.asarray(V), jnp.asarray(radii), 0.5))
    for i in range(8):
        expected = enet_projection_slow(V[i], radii[i], 0.5)
        np.testing.assert_allclose(got[i], expected, atol=1e-6)


@pytest.mark.parametrize("l1_ratio", [0.0, 0.3, 1.0])
def test_enet_scale_roundtrip(l1_ratio):
    rng = np.random.RandomState(4)
    v = rng.randn(50)
    scaled = np.asarray(enet_scale(jnp.asarray(v), l1_ratio, radius=1.0))
    np.testing.assert_allclose(enet_norm_np(scaled, l1_ratio), 1.0, rtol=1e-10)
    # scaling is a pure rescale
    ratio = scaled / v
    np.testing.assert_allclose(ratio, ratio[0] * np.ones_like(ratio), rtol=1e-8)


def test_enet_scale_zero_vector():
    v = np.zeros(10)
    scaled = np.asarray(enet_scale(jnp.asarray(v), 0.5, radius=1.0))
    np.testing.assert_array_equal(scaled, v)


@pytest.mark.parametrize("l1_ratio", [0.1, 0.5, 1.0])
@pytest.mark.parametrize("radius", [0.5, 1.0, 3.0])
def test_enet_projection_bisect_matches_exact(l1_ratio, radius):
    """The hot-path bisection projection agrees with the exact sort-based
    one to float tolerance."""
    rng = np.random.RandomState(7)
    for _ in range(5):
        v = rng.randn(80) * 2
        exact = np.asarray(enet_projection(jnp.asarray(v), radius, l1_ratio))
        fast = np.asarray(enet_projection_bisect(jnp.asarray(v), radius,
                                                 l1_ratio, n_iter=60))
        np.testing.assert_allclose(fast, exact, atol=1e-7)


def test_enet_norm_matches_numpy():
    rng = np.random.RandomState(5)
    v = rng.randn(64)
    for l1_ratio in [0.0, 0.25, 1.0]:
        np.testing.assert_allclose(
            float(enet_norm(jnp.asarray(v), l1_ratio)),
            enet_norm_np(v, l1_ratio), rtol=1e-12)
