"""Pallas BCD kernel vs the lax/numpy reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import modl_tpu.ops.bcd_pallas as bp


@pytest.fixture(autouse=True)
def interpret_mode():
    old = bp.INTERPRET
    bp.INTERPRET = True
    yield
    bp.INTERPRET = old


def _reference(D, R, C, cn, order, comp_pos=False):
    D, R, cn = D.copy(), R.copy(), cn.copy()
    for kk in order:
        n_old = np.sum(D[kk] ** 2)
        budget = cn[kk] + n_old
        R += np.outer(C[kk], D[kk])
        if C[kk, kk] > 1e-20:
            D[kk] = R[kk] / C[kk, kk]
        if comp_pos:
            D[kk] = np.maximum(D[kk], 0)
        n2 = np.sum(D[kk] ** 2)
        if n2 > budget:
            D[kk] /= np.sqrt(n2 / max(budget, 1e-30))
        if budget <= 0:
            D[kk] = 0
        cn[kk] = budget - np.sum(D[kk] ** 2)
        R -= np.outer(C[kk], D[kk])
    return D, cn


@pytest.mark.parametrize("comp_pos", [False, True])
def test_bcd_kernel_matches_reference(comp_pos):
    k, s = 8, 96
    rng = np.random.RandomState(0)
    D = rng.randn(k, s).astype(np.float32)
    D /= np.linalg.norm(D, axis=1, keepdims=True)
    C = (lambda A: (A @ A.T + 0.1 * np.eye(k)).astype(np.float32))(
        rng.randn(k, k))
    grad = rng.randn(k, s).astype(np.float32)
    R = (grad - C @ D).astype(np.float32)
    cn = np.zeros(k, np.float32)
    order = rng.permutation(k).astype(np.int32)

    Dn, cnn = bp.bcd_update_l2(jnp.asarray(D), jnp.asarray(R),
                               jnp.asarray(C), jnp.asarray(cn),
                               jnp.asarray(order), comp_pos=comp_pos)
    Dref, cnr = _reference(D, R, C, cn, order, comp_pos=comp_pos)
    np.testing.assert_allclose(np.asarray(Dn), Dref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cnn), cnr, atol=1e-5)


def test_supported_gating():
    assert bp.supported(70, 16000, np.float32, 0.0)
    assert not bp.supported(70, 16000, np.float32, 1.0)   # l1 ball
    assert not bp.supported(70, 16000, np.float64, 0.0)   # f64
    assert not bp.supported(1024, 16000, np.float32, 0.0)  # VMEM budget
