"""Full-step oracle parity: the jitted SOMF step vs an independent
numpy implementation of the reference's serial semantics
(dict_fact.py:495-715), driven with identical feature subsets and BCD
atom orders. This is the strongest correctness artifact: every piece of
the step (weights, aggregation estimators, ridge solve, C/B EMAs, BCD
with enet-ball projection and comp_norm bookkeeping, incremental Gram)
must agree to float64 precision.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modl_tpu import DictFact
from modl_tpu.decomposition._step import somf_step_inner


def enet_norm_np(v, l1r):
    a = np.abs(v)
    return np.sum(a * (l1r + (1 - l1r) * a))


def enet_projection_np(v, radius, l1r):
    """Bisection oracle (independently validated in test_enet.py)."""
    if radius <= 0:
        return np.zeros_like(v)
    if l1r == 0:
        n2 = np.sum(v ** 2)
        if n2 <= radius:
            return v.copy()
        return v / np.sqrt(n2 / radius)
    gamma = 2.0 / l1r - 2.0
    r = radius / l1r
    b = np.abs(v)
    if np.sum(b * (1 + gamma / 2 * b)) <= r:
        return v.copy()

    def scaled_norm(lam):
        w = np.maximum(b - lam, 0) / (1 + lam * gamma)
        return np.sum(w * (1 + gamma / 2 * w))

    lo, hi = 0.0, float(np.max(b))
    for _ in range(200):
        mid = (lo + hi) / 2
        if scaled_norm(mid) > r:
            lo = mid
        else:
            hi = mid
    lam = (lo + hi) / 2
    return np.sign(v) * np.maximum(b - lam, 0) / (1 + lam * gamma)


class NumpySomf:
    """Serial-semantics SOMF (the reference algorithm, pure numpy)."""

    def __init__(self, D0, n_samples, cfg):
        self.cfg = cfg
        k, n = D0.shape
        self.D = D0.copy()
        self.C = np.zeros((k, k))
        self.B = np.zeros((k, n))
        self.G = self.D @ self.D.T if cfg.G_agg == 'full' else None
        self.comp_norm = np.zeros(k)
        self.code = np.ones((n_samples, k))
        self.Dx_avg = (np.zeros((n_samples, k))
                       if cfg.Dx_agg == 'average' else None)
        self.G_avg = (np.zeros((n_samples, k, k))
                      if cfg.G_agg == 'average' else None)
        self.n_iter = 0
        self.sample_n_iter = np.zeros(n_samples, int)

    def step(self, X, idx, subset, order):
        cfg = self.cfg
        k, n = self.D.shape
        b = X.shape[0]
        self.n_iter += b
        self.sample_n_iter[idx] += 1
        w_sample = self.sample_n_iter[idx].astype(float) \
            ** (-cfg.sample_learning_rate)
        i = np.arange(self.n_iter + 1 - b, self.n_iter + 1, dtype=float)
        w = 1 - np.prod(1 - (1.0 / i) ** cfg.learning_rate)

        # code inputs
        Ds = self.D[:, subset]
        if cfg.Dx_agg == 'full':
            Dx = X @ self.D.T
        else:
            Dx = X[:, subset] @ Ds.T * cfg.reduction
            if cfg.Dx_agg == 'average':
                self.Dx_avg[idx] = (self.Dx_avg[idx]
                                    * (1 - w_sample[:, None])
                                    + Dx * w_sample[:, None])
                Dx = self.Dx_avg[idx].copy()
        if cfg.G_agg == 'full':
            G = self.G.copy()
        else:
            G = Ds @ Ds.T * cfg.reduction
            if cfg.G_agg == 'average':
                self.G_avg[idx] = (self.G_avg[idx]
                                   * (1 - w_sample[:, None, None])
                                   + G[None] * w_sample[:, None, None])
                G = self.G_avg[idx].copy()

        # ridge solve (code_l1_ratio == 0 path)
        if cfg.G_agg == 'average':
            code_b = np.stack([
                np.linalg.solve(G[j] + cfg.code_alpha * np.eye(k), Dx[j])
                for j in range(b)])
        else:
            code_b = np.linalg.solve(G + cfg.code_alpha * np.eye(k),
                                     Dx.T).T
        self.code[idx] = code_b

        # stats
        self.C = self.C * (1 - w) + w * code_b.T @ code_b / b
        self.B = self.B * (1 - w) + w * code_b.T @ X / b

        # dict update
        Ds = self.D[:, subset].copy()
        if cfg.G_agg == 'full' and len(subset) < n / 2:
            self.G -= Ds @ Ds.T
        R = self.B[:, subset] - self.C @ Ds
        for kk in order:
            budget = self.comp_norm[kk] + enet_norm_np(
                Ds[kk], cfg.comp_l1_ratio)
            R += np.outer(self.C[kk], Ds[kk])
            if self.C[kk, kk] > 1e-20:
                Ds[kk] = R[kk] / self.C[kk, kk]
            if cfg.comp_pos:
                Ds[kk] = np.maximum(Ds[kk], 0)
            Ds[kk] = enet_projection_np(Ds[kk], budget, cfg.comp_l1_ratio)
            self.comp_norm[kk] = budget - enet_norm_np(
                Ds[kk], cfg.comp_l1_ratio)
            R -= np.outer(self.C[kk], Ds[kk])
        self.D[:, subset] = Ds
        if cfg.G_agg == 'full':
            if len(subset) < n / 2:
                self.G += Ds @ Ds.T
            else:
                self.G = self.D @ self.D.T


@pytest.mark.parametrize("agg", ['masked', 'full', 'average',
                                 'gram', 'mixed'])
@pytest.mark.parametrize("comp_l1", [0.0, 1.0])
def test_step_matches_numpy_reference(agg, comp_l1):
    # 'gram' = the reference's Dx-masked + G-full combo; 'mixed' =
    # Dx-average + G-masked (exercises the EMA with a masked Gram)
    combos = {'gram': ('masked', 'full'), 'mixed': ('average', 'masked')}
    dx_agg, g_agg = combos.get(agg, (agg, agg))
    rng = np.random.RandomState(0)
    n_samples, n, k, b = 60, 24, 5, 12
    X = rng.randn(n_samples, n)
    df = DictFact(n_components=k, reduction=2, code_alpha=1e-3,
                  code_l1_ratio=0, comp_l1_ratio=comp_l1,
                  Dx_agg=dx_agg, G_agg=g_agg, batch_size=b, random_state=0)
    df.prepare(n_samples=n_samples, X=X)
    cfg = df._cfg
    state = df._state
    ref = NumpySomf(np.asarray(state.D), n_samples, cfg)

    step = jax.jit(somf_step_inner, static_argnames='cfg')
    for t in range(6):
        idx = rng.permutation(n_samples)[:b]
        subset = rng.permutation(n)[:cfg.len_subset]
        order = rng.permutation(k)
        state = step(state, jnp.asarray(X[idx]),
                     jnp.asarray(idx, jnp.int32),
                     jnp.asarray(subset, jnp.int32),
                     jnp.asarray(order, jnp.int32), cfg)
        ref.step(X[idx], idx, subset, order)

    np.testing.assert_allclose(np.asarray(state.D), ref.D, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.C), ref.C, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.B), ref.B, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.code), ref.code, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.comp_norm), ref.comp_norm,
                               atol=1e-9)
    if g_agg == 'full':
        np.testing.assert_allclose(np.asarray(state.G), ref.G, atol=1e-9)
    if g_agg == 'average':
        np.testing.assert_allclose(np.asarray(state.G_avg), ref.G_avg,
                                   atol=1e-9)
    if dx_agg == 'average':
        np.testing.assert_allclose(np.asarray(state.Dx_avg), ref.Dx_avg,
                                   atol=1e-9)
