"""Recsys batch-step oracle parity: the jitted masked-MF update vs an
independent numpy implementation of the reference's serial semantics
(recsys.py:147-213), including the order-dependent per-feature B EMA
and the l2-ball BCD on the union of supports.
"""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from modl_tpu.decomposition.recsys import (_masked_ridge_codes, _pad_rows,
                                           _recsys_batch_step)


def _numpy_batch_step(X, rows, D, C, B, comp_norm, feature_n_iter, n_iter,
                      alpha, lr):
    """Reference serial semantics in numpy (recsys.py:147-213)."""
    n_samples, n = X.shape
    k = D.shape[0]
    b = len(rows)
    n_iter += b
    i = np.arange(n_iter + 1 - b, n_iter + 1, dtype=float)
    w = 1 - np.prod(1 - (1.0 / i) ** lr)

    codes = np.zeros((b, k))
    # per-row sequential: code solve + B EMA + feature counters
    for j, r in enumerate(rows):
        sl = slice(X.indptr[r], X.indptr[r + 1])
        support = X.indices[sl]
        vals = X.data[sl]
        if len(support) == 0:
            continue
        reduction = n / len(support)
        feature_n_iter[support] += 1
        Ds = D[:, support]
        G = Ds @ Ds.T + alpha / reduction * np.eye(k)
        codes[j] = np.linalg.solve(G, Ds @ vals)
        w_B = np.minimum(1.0, w * n_iter / feature_n_iter[support])
        B[:, support] = (B[:, support] * (1 - w_B)
                         + np.outer(codes[j], vals * w_B))

    C = C * (1 - w) + w / b * codes.T @ codes

    union = np.unique(X.indices[np.concatenate(
        [np.arange(X.indptr[r], X.indptr[r + 1]) for r in rows])])
    Ds = D[:, union].copy()
    R = B[:, union] - C @ Ds
    norms = np.sum(Ds ** 2, axis=1)
    comp_norm = comp_norm + norms
    order = np.arange(k)
    for kk in order:
        R += np.outer(C[kk], Ds[kk])
        if C[kk, kk] > 1e-20:
            Ds[kk] = R[kk] / C[kk, kk]
        nr = np.sqrt(np.sum(Ds[kk] ** 2))
        lim = np.sqrt(max(comp_norm[kk], 0))
        if nr > lim:
            Ds[kk] *= lim / nr
        R -= np.outer(C[kk], Ds[kk])
    comp_norm = comp_norm - np.sum(Ds ** 2, axis=1)
    D = D.copy()
    D[:, union] = Ds
    return D, C, B, comp_norm, feature_n_iter, n_iter, codes


def test_recsys_batch_step_matches_numpy():
    rng = np.random.RandomState(0)
    n_samples, n, k, b = 40, 30, 4, 8
    X = sp.random(n_samples, n, density=0.3, random_state=0,
                  format='csr')
    X.data += 0.5
    D = rng.randn(k, n)
    D /= np.sqrt(np.sum(D ** 2, axis=1))[:, None]
    C = np.zeros((k, k))
    B = np.zeros((k, n))
    comp_norm = np.zeros(k)
    fni = np.zeros(n, int)
    n_iter = 0
    alpha, lr = 0.1, 0.9

    Dd = jnp.asarray(D)
    Cd, Bd = jnp.asarray(C), jnp.asarray(B)
    cnd = jnp.asarray(comp_norm)
    fnid = jnp.asarray(fni, jnp.int32)
    nitd = jnp.zeros((), jnp.int32)

    for t in range(4):
        rows = rng.permutation(n_samples)[:b]
        idx, val, lens, P = _pad_rows(X, rows, n, np.float64)
        code_b = _masked_ridge_codes(Dd, jnp.asarray(idx),
                                     jnp.asarray(val), jnp.asarray(lens),
                                     alpha)
        order = jnp.arange(k)
        Dd, Cd, Bd, cnd, fnid, nitd = _recsys_batch_step(
            Dd, Cd, Bd, cnd, fnid, nitd, code_b, jnp.asarray(idx),
            jnp.asarray(val), jnp.asarray(lens), order, lr)
        D, C, B, comp_norm, fni, n_iter, codes_ref = _numpy_batch_step(
            X, rows, D, C, B, comp_norm, fni, n_iter, alpha, lr)
        np.testing.assert_allclose(np.asarray(code_b), codes_ref,
                                   atol=1e-9)

    np.testing.assert_allclose(np.asarray(Dd), D, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Cd), C, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Bd), B, atol=1e-9)
    np.testing.assert_allclose(np.asarray(cnd), comp_norm, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(fnid), fni)


def test_b_ema_dense_matches_sort():
    """The two B-EMA formulations (recsys.py::BEMA_MODE) must agree:
    dense cumulative ops vs (col, row) sort + segmented scan, both
    evaluating the same serial per-column semantics. The dense path is
    oracle-pinned via test_recsys_batch_step_matches_numpy (it is the
    default inside _recsys_batch_step); this pins the sort path to it
    so the A/B flag never drifts."""
    from modl_tpu.decomposition.recsys import _b_ema_dense, _b_ema_sort

    rng = np.random.RandomState(3)
    n_samples, n, k, b = 50, 37, 5, 11
    X = sp.random(n_samples, n, density=0.25, random_state=3,
                  format='csr')
    X.data += 0.5
    B0 = rng.randn(k, n)
    code_b = rng.randn(b, k)
    fni0 = rng.randint(0, 5, size=n).astype(np.int32)
    rows = rng.permutation(n_samples)[:b]
    idx, val, lens, P = _pad_rows(X, rows, n, np.float64)
    args = (jnp.asarray(B0), jnp.asarray(fni0), jnp.asarray(code_b),
            jnp.asarray(idx), jnp.asarray(val), jnp.asarray(lens),
            jnp.asarray(0.3), jnp.asarray(b + 7, jnp.int32))
    B_d, fni_d = _b_ema_dense(*args)
    B_s, fni_s = _b_ema_sort(*args)
    np.testing.assert_allclose(np.asarray(B_d), np.asarray(B_s),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(fni_d), np.asarray(fni_s))


def test_recsys_batch_step_pallas_matches_lax():
    """use_pallas=True routes the union-BCD through the VMEM kernel
    (interpret mode on CPU); trajectory must match the lax path."""
    import modl_tpu.ops.bcd_pallas as bp

    rng = np.random.RandomState(1)
    n_samples, n, k, b = 40, 64, 4, 8
    X = sp.random(n_samples, n, density=0.3, random_state=1, format='csr')
    X.data += 0.5
    X = X.astype(np.float32)
    D = rng.randn(k, n).astype(np.float32)
    D /= np.sqrt(np.sum(D ** 2, axis=1))[:, None]

    def run(use_pallas):
        Dd = jnp.asarray(D)
        Cd = jnp.zeros((k, k), jnp.float32)
        Bd = jnp.zeros((k, n), jnp.float32)
        cnd = jnp.zeros((k,), jnp.float32)
        fnid = jnp.zeros((n,), jnp.int32)
        nitd = jnp.zeros((), jnp.int32)
        rng2 = np.random.RandomState(7)
        for t in range(3):
            rows = rng2.permutation(n_samples)[:b]
            idx, val, lens, P = _pad_rows(X, rows, n, np.float32)
            code_b = _masked_ridge_codes(Dd, jnp.asarray(idx),
                                         jnp.asarray(val),
                                         jnp.asarray(lens), 0.1)
            order = jnp.asarray(rng2.permutation(k))
            Dd, Cd, Bd, cnd, fnid, nitd = _recsys_batch_step(
                Dd, Cd, Bd, cnd, fnid, nitd, code_b, jnp.asarray(idx),
                jnp.asarray(val), jnp.asarray(lens), order, 0.9,
                use_pallas=use_pallas)
        return np.asarray(Dd), np.asarray(cnd), np.asarray(Bd)

    old = bp.INTERPRET
    bp.INTERPRET = True
    try:
        D_lax, cn_lax, B_lax = run(False)
        D_pal, cn_pal, B_pal = run(True)
    finally:
        bp.INTERPRET = old
    # the kernel's f32 rounding feeds back through codes into B across
    # steps; everything must agree to f32 trajectory tolerance
    np.testing.assert_allclose(D_pal, D_lax, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(cn_pal, cn_lax, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(B_pal, B_lax, rtol=1e-4, atol=1e-5)
