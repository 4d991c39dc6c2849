"""Matmul precision discipline (modl_tpu/ops/precision.py).

On TPU, XLA's DEFAULT f32 matmul precision rounds MXU inputs to bf16;
that injects ~1e-2 relative error into the k x k Gram systems whose
ridge term is code_alpha/reduction ~ 1e-5 and was measured to send
'masked'/'gram' fits to 10x-worse-than-trivial reconstructions on v5e.
The CPU suite cannot observe the failure (CPU matmuls are exact f32),
so these tests pin the *lowering*: every dot inside the training step
and the coding path must carry a non-DEFAULT precision config, which is
backend-independent in the StableHLO text.
"""
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modl_tpu import DictFact
from modl_tpu.decomposition import _step


def _dot_precisions(stablehlo_text):
    """All precision configs attached to dot_general ops."""
    out = []
    for line in stablehlo_text.splitlines():
        if 'dot_general' not in line:
            continue
        m = re.findall(r'precision\s*=\s*\[(\w+),\s*(\w+)\]', line)
        out.append(m[0] if m else ('DEFAULT', 'DEFAULT'))
    return out


def _assert_no_default_dots(text, what):
    precs = _dot_precisions(text)
    assert precs, "no dot_general found in %s lowering" % what
    bad = [p for p in precs if 'DEFAULT' in p]
    assert not bad, "%s lowers %d dots at DEFAULT precision" % (what, len(bad))


@pytest.mark.parametrize("agg", ["masked", "full", "average"])
def test_solve_code_dots_not_default(agg):
    """The code-solve chain (Dx, G, solver) is where bf16 noise is
    amplified by the tiny ridge - every dot there must be protected.
    (The step's big stats/residual GEMMs intentionally stay at DEFAULT:
    their contributions are EMA-averaged/recomputed, see
    modl_tpu/ops/precision.py.)"""
    rng = np.random.RandomState(0)
    X = rng.randn(64, 16).astype(np.float32)
    df = DictFact(n_components=4, reduction=2, batch_size=8,
                  Dx_agg=agg, G_agg=agg, random_state=0)
    df.prepare(n_samples=64, X=X)
    Xb = jnp.asarray(X[:8])
    idx = jnp.arange(8, dtype=jnp.int32)
    subset = jnp.arange(8, dtype=jnp.int32)
    w_sample = jnp.ones(8, jnp.float32)

    def solve(state, Xb, idx, w_sample, subset):
        return _step._solve_code(state, Xb, idx, w_sample, subset,
                                 df._cfg)

    text = jax.jit(solve).lower(df._state, Xb, idx, w_sample,
                                subset).as_text()
    _assert_no_default_dots(text, "_solve_code[%s]" % agg)


def test_step_gram_bookkeeping_not_default():
    """Incremental G (G_agg='full') accumulates across the whole fit;
    its products must be exact or the Gram random-walks away."""
    rng = np.random.RandomState(0)
    X = rng.randn(64, 16).astype(np.float32)
    df = DictFact(n_components=4, reduction=2, batch_size=8,
                  Dx_agg='masked', G_agg='full', random_state=0)
    df.prepare(n_samples=64, X=X)
    Xb = jnp.asarray(X[:8])
    idx = jnp.arange(8, dtype=jnp.int32)
    text = jax.jit(_step.somf_step, static_argnames=("cfg",)).lower(
        df._state, Xb, idx, df._cfg).as_text()
    # the two (4, s) x (s, 4) Gram products must carry HIGHEST
    highs = [p for p in _dot_precisions(text) if 'HIGHEST' in p]
    assert len(highs) >= 2


def test_compute_code_dots_not_default():
    D = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)
    X = jnp.asarray(np.random.RandomState(1).randn(8, 16), jnp.float32)
    text = _step.compute_code.lower(
        D, None, X, 0.0, 1e-4, False, 1e-3, 100, solver='cd').as_text()
    _assert_no_default_dots(text, "compute_code")


def test_recsys_window_dots_not_default():
    from modl_tpu.decomposition.recsys import _recsys_window
    k, n, b, P, W = 3, 12, 4, 5, 2
    rng = np.random.RandomState(0)
    D = jnp.asarray(rng.randn(k, n), jnp.float32)
    C = jnp.eye(k, dtype=jnp.float32)
    B = jnp.zeros((k, n), jnp.float32)
    cn = jnp.ones(k, jnp.float32)
    fni = jnp.zeros(n, jnp.int32)
    code = jnp.zeros((8, k), jnp.float32)
    rows = jnp.arange(W * b, dtype=jnp.int32).reshape(W, b)
    idx = jnp.tile(jnp.arange(P, dtype=jnp.int32), (W, b, 1))
    val = jnp.asarray(rng.randn(W, b, P), jnp.float32)
    lens = jnp.full((W, b), P, jnp.int32)
    orders = jnp.tile(jnp.arange(k, dtype=jnp.int32), (W, 1))
    text = _recsys_window.lower(
        D, C, B, cn, fni, jnp.int32(0), code, rows, idx, val, lens,
        orders, 1.0, 1.0).as_text()
    _assert_no_default_dots(text, "_recsys_window")


def test_planted_reconstruction_masked_small_alpha():
    """End-to-end quality at the alpha where bf16 noise was fatal."""
    from sklearn.utils import check_random_state
    rng = check_random_state(0)
    Q = rng.randn(4, 4).dot(rng.randn(4, 20))
    code = rng.randn(400, 4)
    X = code.dot(Q)
    df = DictFact(n_components=4, code_alpha=1e-4, n_epochs=2,
                  comp_l1_ratio=0, G_agg='masked', Dx_agg='masked',
                  random_state=0, reduction=2)
    df.fit(X)
    P = df.transform(X)
    rel = np.sum((X - P @ df.components_) ** 2) / np.sum(X ** 2)
    assert rel < 0.02
