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


def _enet_norm(v, l1r):
    a = np.abs(v)
    return np.sum(a * (l1r + (1 - l1r) * a))


def _project(v, radius, l1r):
    from modl_tpu.ops.enet import enet_projection
    return np.asarray(enet_projection(jnp.asarray(v), radius, l1r))


def _reference(D, R, C, cn, order, comp_pos=False, l1r=0.0):
    D, R, cn = D.copy(), R.copy(), cn.copy()
    for kk in order:
        budget = cn[kk] + _enet_norm(D[kk], l1r)
        R += np.outer(C[kk], D[kk])
        if C[kk, kk] > 1e-20:
            D[kk] = R[kk] / C[kk, kk]
        if comp_pos:
            D[kk] = np.maximum(D[kk], 0)
        D[kk] = _project(D[kk], budget, l1r)
        cn[kk] = budget - _enet_norm(D[kk], l1r)
        R -= np.outer(C[kk], D[kk])
    return D, cn


@pytest.mark.parametrize("comp_pos", [False, True])
@pytest.mark.parametrize("l1r", [0.0, 1.0, 0.5])
def test_bcd_kernel_matches_reference(comp_pos, l1r):
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

    Dn, cnn = bp.bcd_update(jnp.asarray(D), jnp.asarray(R),
                            jnp.asarray(C), jnp.asarray(cn),
                            jnp.asarray(order), comp_pos=comp_pos,
                            l1_ratio=l1r)
    Dref, cnr = _reference(D, R, C, cn, order, comp_pos=comp_pos, l1r=l1r)
    np.testing.assert_allclose(np.asarray(Dn), Dref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cnn), cnr, atol=2e-5)


def test_supported_gating():
    assert bp.supported(70, 16000, np.float32, 0.0)
    assert bp.supported(70, 16000, np.float32, 1.0)
    assert not bp.supported(70, 16000, np.float64, 0.0)   # f64
    assert not bp.supported(1024, 16000, np.float32, 0.0)  # VMEM budget
