"""Binomial subset sizes under jit (sampler.pyx:44-47 emulation).

The traced ``rand_size=True`` path stores subsets at a static width and
masks columns past the drawn size; these tests pin (a) the Binomial
size distribution of the traced draws, (b) that a masked step is
*exactly* the step on the truncated subset, and (c) end-to-end
convergence with the reference-default sampler settings.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modl_tpu import DictFact
from modl_tpu.decomposition import _step
from modl_tpu.ops.sampler import (binomial_len_max, draw_subset_sized,
                                  init_sampler_state)


def test_traced_binomial_size_distribution():
    n, reduction = 2000, 4
    len_subset = n // reduction
    len_max = binomial_len_max(n, len_subset)
    key = jax.random.PRNGKey(0)
    box, cursor = init_sampler_state(n, key)
    draw = jax.jit(draw_subset_sized, static_argnums=(3, 4, 5))
    sizes = []
    for _ in range(400):
        subset, m, box, cursor, key = draw(box, cursor, key, len_subset,
                                           len_max, True)
        sizes.append(int(m))
        assert 1 <= int(m) <= len_max
        # drawn prefix is made of unique, in-range features
        pref = np.asarray(subset)[:int(m)]
        assert len(np.unique(pref)) == int(m)
        assert pref.min() >= 0 and pref.max() < n
    sizes = np.asarray(sizes)
    p = 1.0 / reduction
    mean, std = n * p, np.sqrt(n * p * (1 - p))
    assert abs(sizes.mean() - mean) < 4 * std / np.sqrt(len(sizes))
    assert 0.7 * std < sizes.std() < 1.3 * std


def test_cycling_cursor_advances_by_drawn_size():
    n, len_subset = 64, 16
    len_max = binomial_len_max(n, len_subset)
    key = jax.random.PRNGKey(1)
    box, cursor = init_sampler_state(n, key)
    draw = jax.jit(draw_subset_sized, static_argnums=(3, 4, 5))
    seen = []
    prev_cursor = int(cursor)
    for _ in range(6):
        subset, m, box, new_cursor, key = draw(box, cursor, key,
                                               len_subset, len_max, False)
        if int(new_cursor) > prev_cursor:  # no reshuffle happened
            assert int(new_cursor) - int(cursor) == int(m)
        seen.extend(np.asarray(subset)[:int(m)].tolist())
        cursor, prev_cursor = new_cursor, int(new_cursor)
    # within a cycle, drawn prefixes never repeat a feature
    first_cycle = seen[:n]
    assert len(first_cycle) == len(set(first_cycle))


@pytest.mark.parametrize("agg", ["masked", "full"])
def test_masked_step_equals_truncated_subset_step(agg):
    """somf_step_inner(subset[:s_pad], n_valid=m) == the exact step on
    subset[:m] - the zero-masked columns cancel identically."""
    rng = np.random.RandomState(0)
    k, n, b = 4, 24, 6
    X = rng.randn(64, n).astype(np.float64)
    df = DictFact(n_components=k, reduction=2, batch_size=b,
                  Dx_agg=agg, G_agg=agg, random_state=0,
                  dtype=np.float64)
    df.prepare(n_samples=64, X=X)
    state = df._state
    cfg = df._cfg
    Xb = jnp.asarray(X[:b])
    idx = jnp.arange(b, dtype=jnp.int32)
    order = jnp.asarray(rng.permutation(k).astype(np.int32))
    s_pad, m = 12, 9
    subset = jnp.asarray(rng.permutation(n)[:s_pad].astype(np.int32))

    out_masked = _step.somf_step_inner(state, Xb, idx, subset, order, cfg,
                                       n_valid=jnp.int32(m))
    out_trunc = _step.somf_step_inner(state, Xb, idx, subset[:m], order,
                                      cfg)
    for name in ('D', 'C', 'B', 'comp_norm', 'code'):
        a, c = getattr(out_masked, name), getattr(out_trunc, name)
        if a is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-12, atol=1e-12, err_msg=name)


def test_rand_size_fit_converges():
    from sklearn.utils import check_random_state
    rng = check_random_state(0)
    Q = rng.randn(4, 4).dot(rng.randn(4, 20))
    code = rng.randn(400, 4)
    X = code.dot(Q)
    df = DictFact(n_components=4, code_alpha=1e-4, n_epochs=3,
                  comp_l1_ratio=0, G_agg='masked', Dx_agg='masked',
                  random_state=0, reduction=2, rand_size=True)
    df.fit(X)
    assert df._cfg.rand_size
    P = df.transform(X)
    rel = np.sum((X - P @ df.components_) ** 2) / np.sum(X ** 2)
    assert rel < 0.02
