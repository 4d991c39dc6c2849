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


def enet_cd_np(w0, Q, q, y_norm2, l1_reg, l2_reg, positive, max_iter, tol):
    """Per-sample sequential elastic-net CD, mirroring the sweep order,
    incremental H bookkeeping and duality-gap stop of
    ops/solvers.py::enet_cd_gram (itself dict_fact_fast.pyx:270-426)."""
    w = np.array(w0, dtype=float, copy=True)
    b, k = q.shape
    shared = Q.ndim == 2
    for i in range(b):
        Qi = Q if shared else Q[i]
        wi = w[i]
        H = Qi @ wi
        gap_tol = tol * y_norm2[i]
        for it in range(max_iter):
            d_w_max = 0.0
            w_max = 0.0
            for ii in range(k):
                Qii = Qi[ii, ii]
                w_ii = wi[ii]
                H = H - w_ii * Qi[ii]
                tmp = q[i, ii] - H[ii]
                w_new = np.sign(tmp) * max(abs(tmp) - l1_reg, 0) \
                    / (Qii + l2_reg)
                if positive and tmp < 0:
                    w_new = 0.0
                if Qii == 0.0:
                    w_new = w_ii
                H = H + w_new * Qi[ii]
                wi[ii] = w_new
                d_w_max = max(d_w_max, abs(w_new - w_ii))
                w_max = max(w_max, abs(w_new))
            check = (w_max == 0.0 or d_w_max < tol * w_max
                     or it == max_iter - 1)
            q_dot_w = wi @ q[i]
            XtA = q[i] - H - l2_reg * wi
            dual_norm = XtA.max() if positive else np.abs(XtA).max()
            R_norm2 = y_norm2[i] + wi @ H - 2.0 * q_dot_w
            if dual_norm > l1_reg:
                scaling = l1_reg / dual_norm
                gap = 0.5 * (R_norm2 + R_norm2 * scaling ** 2)
            else:
                scaling = 1.0
                gap = R_norm2
            gap += (l1_reg * np.abs(wi).sum() - scaling * y_norm2[i]
                    + scaling * q_dot_w
                    + 0.5 * l2_reg * (1.0 + scaling ** 2) * (wi @ wi))
            if check and gap < gap_tol:
                break
    return w


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

        # code solve: ridge (code_l1_ratio == 0) or elastic-net CD
        if cfg.code_l1_ratio == 0.0:
            if cfg.G_agg == 'average':
                code_b = np.stack([
                    np.linalg.solve(G[j] + cfg.code_alpha * np.eye(k),
                                    Dx[j])
                    for j in range(b)])
            else:
                code_b = np.linalg.solve(G + cfg.code_alpha * np.eye(k),
                                         Dx.T).T
        else:
            code_b = enet_cd_np(
                self.code[idx], G, Dx, np.sum(X * X, axis=-1),
                cfg.code_alpha * cfg.code_l1_ratio,
                cfg.code_alpha * (1.0 - cfg.code_l1_ratio),
                cfg.code_pos, cfg.max_iter, cfg.tol)
        self.code[idx] = code_b

        # stats
        if cfg.optimizer == 'variational':
            self.C = self.C * (1 - w) + w * code_b.T @ code_b / b
            self.B = self.B * (1 - w) + w * code_b.T @ X / b
        else:
            self.C = code_b.T @ code_b / b
            self.B = code_b.T @ X / b

        # dict update
        Ds = self.D[:, subset].copy()
        if cfg.G_agg == 'full' and len(subset) < n / 2:
            self.G -= Ds @ Ds.T
        R = self.B[:, subset] - self.C @ Ds
        if cfg.optimizer == 'variational':
            for kk in order:
                budget = self.comp_norm[kk] + enet_norm_np(
                    Ds[kk], cfg.comp_l1_ratio)
                R += np.outer(self.C[kk], Ds[kk])
                if self.C[kk, kk] > 1e-20:
                    Ds[kk] = R[kk] / self.C[kk, kk]
                if cfg.comp_pos:
                    Ds[kk] = np.maximum(Ds[kk], 0)
                Ds[kk] = enet_projection_np(Ds[kk], budget,
                                            cfg.comp_l1_ratio)
                self.comp_norm[kk] = budget - enet_norm_np(
                    Ds[kk], cfg.comp_l1_ratio)
                R -= np.outer(self.C[kk], Ds[kk])
        else:  # 'sgd': projected gradient step on the surrogate
            budgets = np.array([
                self.comp_norm[kk] + enet_norm_np(Ds[kk],
                                                  cfg.comp_l1_ratio)
                for kk in range(k)])
            Ds = Ds + w * cfg.step_size * R
            if cfg.comp_pos:
                Ds = np.maximum(Ds, 0)
            for kk in range(k):
                Ds[kk] = enet_projection_np(Ds[kk], budgets[kk],
                                            cfg.comp_l1_ratio)
                self.comp_norm[kk] = budgets[kk] - enet_norm_np(
                    Ds[kk], cfg.comp_l1_ratio)
        self.D[:, subset] = Ds
        if cfg.G_agg == 'full':
            if len(subset) < n / 2:
                self.G += Ds @ Ds.T
            else:
                self.G = self.D @ self.D.T


@pytest.mark.parametrize("agg", ['masked', 'full', 'average',
                                 'gram', 'mixed'])
@pytest.mark.parametrize("comp_l1", [0.0, 1.0])
@pytest.mark.parametrize("comp_pos", [False, True])
def test_step_matches_numpy_reference(agg, comp_l1, comp_pos):
    # 'gram' = the reference's Dx-masked + G-full combo; 'mixed' =
    # Dx-average + G-masked (exercises the EMA with a masked Gram)
    combos = {'gram': ('masked', 'full'), 'mixed': ('average', 'masked')}
    dx_agg, g_agg = combos.get(agg, (agg, agg))
    rng = np.random.RandomState(0)
    n_samples, n, k, b = 60, 24, 5, 12
    X = rng.randn(n_samples, n)
    df = DictFact(n_components=k, reduction=2, code_alpha=1e-3,
                  code_l1_ratio=0, comp_l1_ratio=comp_l1,
                  comp_pos=comp_pos,
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


def _run_parity(df, X, n_steps=6, seed=0):
    """Drive the jitted step and the numpy oracle with identical draws."""
    rng = np.random.RandomState(seed)
    n_samples, n = X.shape
    cfg = df._cfg
    state = df._state
    k, b = cfg.n_components, df.batch_size
    ref = NumpySomf(np.asarray(state.D), n_samples, cfg)
    step = jax.jit(somf_step_inner, static_argnames='cfg')
    for _ in range(n_steps):
        idx = rng.permutation(n_samples)[:b]
        subset = rng.permutation(n)[:cfg.len_subset]
        order = rng.permutation(k)
        state = step(state, jnp.asarray(X[idx]),
                     jnp.asarray(idx, jnp.int32),
                     jnp.asarray(subset, jnp.int32),
                     jnp.asarray(order, jnp.int32), cfg)
        ref.step(X[idx], idx, subset, order)
    return state, ref


@pytest.mark.parametrize("agg", ['masked', 'full', 'average'])
@pytest.mark.parametrize("code_pos", [False, True])
def test_step_l1_code_matches_numpy_reference(agg, code_pos):
    """Full-step parity on the l1-code (elastic-net CD) path — the
    reference's image/sparse-coding headline configuration
    (dict_fact_fast.pyx:270-426 inside the step)."""
    rng = np.random.RandomState(3)
    n_samples, n, k, b = 60, 24, 5, 12
    X = rng.randn(n_samples, n)
    df = DictFact(n_components=k, reduction=2, code_alpha=0.1,
                  code_l1_ratio=1.0, comp_l1_ratio=1.0, code_pos=code_pos,
                  code_solver='cd', tol=1e-3, max_iter=100,
                  Dx_agg=agg, G_agg=agg, batch_size=b, random_state=0)
    df.prepare(n_samples=n_samples, X=X)
    state, ref = _run_parity(df, X)
    np.testing.assert_allclose(np.asarray(state.code), ref.code, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.D), ref.D, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.B), ref.B, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.comp_norm), ref.comp_norm,
                               atol=1e-9)


@pytest.mark.parametrize("code_l1", [0.0, 1.0])
def test_step_sgd_matches_numpy_reference(code_l1):
    """Full-step parity for the 'sgd' optimizer (projected gradient on
    the surrogate, dict_fact.py:696-709)."""
    rng = np.random.RandomState(4)
    n_samples, n, k, b = 60, 24, 5, 12
    X = rng.randn(n_samples, n)
    df = DictFact(n_components=k, reduction=2, code_alpha=0.1,
                  code_l1_ratio=code_l1, comp_l1_ratio=0.0,
                  optimizer='sgd', step_size=1e-2, code_solver='cd',
                  tol=1e-3, max_iter=100,
                  Dx_agg='full', G_agg='full', batch_size=b,
                  random_state=0)
    df.prepare(n_samples=n_samples, X=X)
    state, ref = _run_parity(df, X)
    np.testing.assert_allclose(np.asarray(state.D), ref.D, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.code), ref.code, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.comp_norm), ref.comp_norm,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.G), ref.G, atol=1e-9)


def test_fista_matches_cd_end_to_end():
    """FISTA (the MXU-native l1 code solver, auto-selected on
    accelerators) must land on the same objective trajectory as
    reference-exact CD on the image headline config (l1 codes)."""
    rng = np.random.RandomState(5)
    n_samples, n, k = 300, 64, 16
    U = rng.rand(n_samples, k) * (rng.rand(n_samples, k) < 0.3)
    V = rng.randn(k, n)
    X = U @ V + 0.05 * rng.randn(n_samples, n)
    X_test = X[:80].copy()

    scores = {}
    for solver in ('cd', 'fista'):
        df = DictFact(n_components=k, reduction=2, code_alpha=0.1,
                      code_l1_ratio=1.0, comp_l1_ratio=0.0,
                      code_solver=solver, tol=1e-4, n_epochs=3,
                      batch_size=50, random_state=0)
        df.fit(X)
        scores[solver] = df.score(X_test)
    assert scores['fista'] == pytest.approx(scores['cd'], rel=2e-2)
