"""Oracle tests for the batched code solvers (ridge + elastic-net CD)."""
import numpy as np
import pytest

import jax.numpy as jnp

from modl_tpu.ops import (enet_cd_gram, enet_regression_multi_gram,
                          enet_regression_single_gram, ridge_multi_gram,
                          ridge_single_gram)
from modl_tpu.ops.solvers import fista_gram


def _objective(w, Q, q, l1_reg, l2_reg):
    return (0.5 * w @ Q @ w - q @ w
            + l1_reg * np.sum(np.abs(w)) + 0.5 * l2_reg * np.sum(w ** 2))


def _make_problem(rng, b=12, k=6, n=30):
    X = rng.randn(b, n)
    D = rng.randn(k, n)
    G = D @ D.T
    Dx = X @ D.T
    return X, D, G, Dx


def test_ridge_single_gram_matches_numpy():
    rng = np.random.RandomState(0)
    X, D, G, Dx = _make_problem(rng)
    alpha = 0.1
    got = np.asarray(ridge_single_gram(jnp.asarray(G), jnp.asarray(Dx), alpha))
    expected = np.linalg.solve(G + alpha * np.eye(G.shape[0]), Dx.T).T
    np.testing.assert_allclose(got, expected, rtol=1e-8)


def test_ridge_multi_gram_matches_numpy():
    rng = np.random.RandomState(1)
    b, k = 8, 5
    Gs = np.stack([(lambda A: A @ A.T + np.eye(k))(rng.randn(k, k))
                   for _ in range(b)])
    Dx = rng.randn(b, k)
    alpha = 0.05
    got = np.asarray(ridge_multi_gram(jnp.asarray(Gs), jnp.asarray(Dx), alpha))
    for i in range(b):
        expected = np.linalg.solve(Gs[i] + alpha * np.eye(k), Dx[i])
        np.testing.assert_allclose(got[i], expected, rtol=1e-7)


@pytest.mark.parametrize("positive", [False, True])
@pytest.mark.parametrize("l1_ratio", [0.5, 1.0])
def test_enet_cd_vs_sklearn(l1_ratio, positive):
    from sklearn.linear_model import ElasticNet

    rng = np.random.RandomState(2)
    b, k, n = 6, 8, 40
    X, D, G, Dx = _make_problem(rng, b=b, k=k, n=n)
    alpha = 0.3
    l1_reg = alpha * l1_ratio
    l2_reg = alpha * (1 - l1_ratio)
    y_norm2 = np.sum(X ** 2, axis=1)

    w0 = jnp.ones((b, k))
    got = np.asarray(enet_cd_gram(w0, jnp.asarray(G), jnp.asarray(Dx),
                                  jnp.asarray(y_norm2), l1_reg, l2_reg,
                                  positive, max_iter=2000, tol=1e-12))

    # sklearn oracle: min 1/(2n) ||y - D^T w||^2 + a*l1r ||w||_1
    #                + a*(1-l1r)/2 ||w||_2^2, so a*l1r*n = l1_reg etc.
    sk_alpha = alpha / n
    en = ElasticNet(alpha=sk_alpha, l1_ratio=l1_ratio, fit_intercept=False,
                    positive=positive, max_iter=100000, tol=1e-14)
    for i in range(b):
        en.fit(D.T, X[i])
        obj_got = _objective(got[i], G, Dx[i], l1_reg, l2_reg)
        obj_ref = _objective(en.coef_, G, Dx[i], l1_reg, l2_reg)
        assert obj_got <= obj_ref + 1e-6 * max(1.0, abs(obj_ref))
        np.testing.assert_allclose(got[i], en.coef_, atol=5e-4)


def test_enet_cd_multi_gram_per_sample():
    rng = np.random.RandomState(3)
    b, k, n = 5, 6, 25
    X = rng.randn(b, n)
    Ds = [rng.randn(k, n) for _ in range(b)]
    Gs = np.stack([D @ D.T for D in Ds])
    Dx = np.stack([X[i] @ Ds[i].T for i in range(b)])
    got = np.asarray(enet_regression_multi_gram(
        jnp.ones((b, k)), jnp.asarray(Gs), jnp.asarray(Dx), jnp.asarray(X),
        l1_ratio=1.0, alpha=0.2, positive=False, tol=1e-12, max_iter=2000))
    # each row must solve its own problem at least as well as a joint solve
    # of any other row's Gram would
    for i in range(b):
        obj_own = _objective(got[i], Gs[i], Dx[i], 0.2, 0.0)
        # perturbation check: solution is a fixed point (no descent direction)
        for eps in [1e-3, -1e-3]:
            for j in range(k):
                w = got[i].copy()
                w[j] += eps
                assert _objective(w, Gs[i], Dx[i], 0.2, 0.0) >= obj_own - 1e-9


@pytest.mark.parametrize("positive", [False, True])
@pytest.mark.parametrize("l1_ratio", [0.5, 1.0])
def test_fista_matches_cd(l1_ratio, positive):
    """FISTA and CD solve the same convex problem to the same optimum."""
    rng = np.random.RandomState(5)
    b, k, n = 8, 12, 40
    X, D, G, Dx = _make_problem(rng, b=b, k=k, n=n)
    alpha = 0.3
    l1_reg = alpha * l1_ratio
    l2_reg = alpha * (1 - l1_ratio)
    y_norm2 = np.sum(X ** 2, axis=1)
    args = (jnp.asarray(G), jnp.asarray(Dx), jnp.asarray(y_norm2),
            l1_reg, l2_reg, positive)
    w_cd = np.asarray(enet_cd_gram(jnp.ones((b, k)), *args,
                                   max_iter=5000, tol=1e-12))
    w_f = np.asarray(fista_gram(jnp.ones((b, k)), *args,
                                max_iter=20000, tol=1e-12))
    for i in range(b):
        o_cd = _objective(w_cd[i], G, Dx[i], l1_reg, l2_reg)
        o_f = _objective(w_f[i], G, Dx[i], l1_reg, l2_reg)
        assert abs(o_cd - o_f) <= 1e-7 * max(1.0, abs(o_cd))
    np.testing.assert_allclose(w_f, w_cd, atol=2e-4)


def test_fista_rank_deficient_gram():
    """k > subset size -> singular Gram; FISTA must still converge."""
    rng = np.random.RandomState(6)
    b, k, s = 6, 16, 5
    Ds = rng.randn(k, s)
    G = Ds @ Ds.T  # rank 5 << k
    X = rng.randn(b, s)
    Dx = X @ Ds.T
    y_norm2 = np.sum(X ** 2, axis=1)
    w = np.asarray(fista_gram(jnp.ones((b, k)), jnp.asarray(G),
                              jnp.asarray(Dx), jnp.asarray(y_norm2),
                              0.2, 0.0, False, 20000, 1e-10))
    w_cd = np.asarray(enet_cd_gram(jnp.ones((b, k)), jnp.asarray(G),
                                   jnp.asarray(Dx), jnp.asarray(y_norm2),
                                   0.2, 0.0, False, 5000, 1e-10))
    for i in range(b):
        o_f = _objective(w[i], G, Dx[i], 0.2, 0.0)
        o_cd = _objective(w_cd[i], G, Dx[i], 0.2, 0.0)
        assert o_f <= o_cd + 1e-6 * max(1.0, abs(o_cd))


def test_dispatchers_ridge_path():
    rng = np.random.RandomState(4)
    X, D, G, Dx = _make_problem(rng)
    got = np.asarray(enet_regression_single_gram(
        jnp.ones(Dx.shape), jnp.asarray(G), jnp.asarray(Dx), jnp.asarray(X),
        l1_ratio=0.0, alpha=0.1, positive=False, tol=1e-3, max_iter=100))
    expected = np.linalg.solve(G + 0.1 * np.eye(G.shape[0]), Dx.T).T
    np.testing.assert_allclose(got, expected, rtol=1e-8)
