"""Integration tests for DictFact on planted factorizations.

Port of modl/decomposition/tests/test_dict_fact.py: same synthetic
generators, solver configurations, and accuracy floors (reconstruction
rel-error, bitwise refit reproducibility, sparse dictionary recovery).
"""
import numpy as np
import pytest
from numpy.testing import assert_array_equal
from sklearn.utils import check_random_state

from modl_tpu import DictFact

rng_global = 0

solvers = ['masked', 'gram', 'average', 'full']

solver_dict = {
    'masked': {'Dx_agg': 'masked', 'G_agg': 'masked'},
    'gram': {'Dx_agg': 'masked', 'G_agg': 'full'},
    'average': {'Dx_agg': 'average', 'G_agg': 'average'},
    'full': {'Dx_agg': 'full', 'G_agg': 'full'},
}


def generate_sparse_synthetic(n_samples=200, square_size=4):
    rng = check_random_state(0)
    n_features = square_size ** 2
    half = square_size // 2
    Q = np.zeros((4, n_features))
    for i in range(2):
        for j in range(2):
            atom = np.zeros((square_size, square_size))
            atom[half * i:half * (i + 1), half * j:half * (j + 1)] = 1
            Q[2 * i + j] = np.ravel(atom)
    code = rng.randn(n_samples, 4)
    return code.dot(Q), Q


def generate_synthetic(n_samples=200, n_components=4, n_features=16,
                       dictionary_rank=None):
    rng = check_random_state(0)
    if dictionary_rank is None:
        Q = rng.randn(n_components, n_features)
    else:
        Q = rng.randn(n_components, dictionary_rank).dot(
            rng.randn(dictionary_rank, n_features))
    code = rng.randn(n_samples, n_components)
    return code.dot(Q), Q


@pytest.mark.parametrize("solver", solvers)
def test_dict_mf_reconstruction(solver):
    X, Q = generate_synthetic()
    dict_mf = DictFact(n_components=4, code_alpha=1e-4, n_epochs=5,
                       comp_l1_ratio=0,
                       G_agg=solver_dict[solver]['G_agg'],
                       Dx_agg=solver_dict[solver]['Dx_agg'],
                       random_state=rng_global, reduction=1)
    dict_mf.fit(X)
    P = dict_mf.transform(X)
    Y = P.dot(dict_mf.components_)
    rel_error = np.sum((X - Y) ** 2) / np.sum(X ** 2)
    assert rel_error < 0.02


@pytest.mark.parametrize("solver", solvers)
def test_dict_mf_reconstruction_reduction(solver):
    X, Q = generate_synthetic(n_features=20, n_samples=400,
                              dictionary_rank=4)
    dict_mf = DictFact(n_components=4, code_alpha=1e-4, n_epochs=2,
                       comp_l1_ratio=0,
                       G_agg=solver_dict[solver]['G_agg'],
                       Dx_agg=solver_dict[solver]['Dx_agg'],
                       random_state=rng_global, reduction=2)
    dict_mf.fit(X)
    P = dict_mf.transform(X)
    Y = P.dot(dict_mf.components_)
    rel_error = np.sum((X - Y) ** 2) / np.sum(X ** 2)
    assert rel_error < 0.02


@pytest.mark.parametrize("solver", solvers)
def test_dict_mf_reconstruction_reproducible(solver):
    X, Q = generate_synthetic(n_features=20, n_samples=400,
                              dictionary_rank=4)
    dict_mf = DictFact(n_components=4, code_alpha=1e-4, n_epochs=2,
                       comp_l1_ratio=0,
                       G_agg=solver_dict[solver]['G_agg'],
                       Dx_agg=solver_dict[solver]['Dx_agg'],
                       random_state=0, reduction=2)
    dict_mf.fit(X)
    D1 = dict_mf.components_.copy()
    P1 = dict_mf.transform(X)

    dict_mf.random_state = 0
    dict_mf.fit(X)
    D2 = dict_mf.components_.copy()
    P2 = dict_mf.transform(X)
    assert_array_equal(D1, D2)
    assert_array_equal(P1, P2)


@pytest.mark.parametrize("solver", solvers)
def test_dict_mf_reconstruction_reduction_batch(solver):
    X, Q = generate_synthetic(n_features=20, n_samples=400,
                              dictionary_rank=4)
    dict_mf = DictFact(n_components=4, code_alpha=1e-4, n_epochs=2,
                       comp_l1_ratio=0,
                       G_agg=solver_dict[solver]['G_agg'],
                       Dx_agg=solver_dict[solver]['Dx_agg'],
                       random_state=rng_global, reduction=2,
                       batch_size=10)
    dict_mf.fit(X)
    P = dict_mf.transform(X)
    Y = P.dot(dict_mf.components_)
    rel_error = np.sum((X - Y) ** 2) / np.sum(X ** 2)
    assert rel_error < 0.06


@pytest.mark.parametrize("solver", solvers)
def test_dict_mf_reconstruction_sparse_dict(solver):
    X, Q = generate_sparse_synthetic(500, 4)
    rng = check_random_state(0)
    dict_init = Q + rng.randn(*Q.shape) * 0.2
    dict_mf = DictFact(n_components=4, code_alpha=1e-2, n_epochs=2,
                       code_l1_ratio=0, comp_l1_ratio=1,
                       dict_init=dict_init,
                       G_agg=solver_dict[solver]['G_agg'],
                       Dx_agg=solver_dict[solver]['Dx_agg'],
                       random_state=rng_global)
    dict_mf.fit(X)
    Q_rec = dict_mf.components_.copy()
    Q_rec /= np.sqrt(np.sum(Q_rec ** 2, axis=1))[:, np.newaxis]
    Qn = Q / np.sqrt(np.sum(Q ** 2, axis=1))[:, np.newaxis]
    G = np.abs(Q_rec.dot(Qn.T))
    recovered = min(np.sum(np.any(G > 0.95, axis=1)),
                    np.sum(np.any(G > 0.95, axis=0)))
    assert recovered >= 4


def test_partial_fit_warm_start():
    X, _ = generate_synthetic()
    dict_mf = DictFact(n_components=4, code_alpha=1e-4, comp_l1_ratio=0,
                       random_state=0, reduction=1)
    dict_mf.prepare(n_samples=X.shape[0], X=X)
    before = dict_mf.n_iter_
    dict_mf.partial_fit(X)
    assert dict_mf.n_iter_ == before + X.shape[0]
    dict_mf.partial_fit(X)
    assert dict_mf.n_iter_ == before + 2 * X.shape[0]


def test_sgd_optimizer():
    X, _ = generate_synthetic()
    dict_mf = DictFact(n_components=4, code_alpha=1e-4, comp_l1_ratio=0,
                       optimizer='sgd', step_size=1.0, n_epochs=5,
                       random_state=0)
    dict_mf.fit(X)
    P = dict_mf.transform(X)
    Y = P.dot(dict_mf.components_)
    rel_error = np.sum((X - Y) ** 2) / np.sum(X ** 2)
    assert rel_error < 0.1


def test_callback_and_verbose(capsys):
    X, _ = generate_synthetic()
    calls = []
    dict_mf = DictFact(n_components=4, random_state=0, n_epochs=2,
                       verbose=3, callback=lambda df: calls.append(df.n_iter_))
    dict_mf.fit(X)
    assert len(calls) >= 1


def test_set_params_g_agg_upgrade():
    """Mid-run G_agg -> 'full' recomputes the Gram (dict_fact.py:339-357,
    the 'gram' method's epoch switch)."""
    X, _ = generate_synthetic()
    dict_mf = DictFact(n_components=4, code_alpha=1e-4, comp_l1_ratio=0,
                       G_agg='masked', Dx_agg='masked', reduction=2,
                       random_state=0)
    dict_mf.prepare(n_samples=X.shape[0], X=X)
    dict_mf.partial_fit(X)
    assert dict_mf.G_ is None
    dict_mf.set_params(G_agg='full', Dx_agg='full')
    G = dict_mf.G_
    np.testing.assert_allclose(
        G, dict_mf.components_ @ dict_mf.components_.T, rtol=1e-10)
    dict_mf.partial_fit(X)  # continues with the exact Gram
    np.testing.assert_allclose(
        dict_mf.G_, dict_mf.components_ @ dict_mf.components_.T,
        rtol=1e-6, atol=1e-8)


def test_transform_score_consistency():
    X, _ = generate_synthetic()
    dict_mf = DictFact(n_components=4, code_alpha=1e-4, comp_l1_ratio=0,
                       random_state=0, n_epochs=2)
    dict_mf.fit(X)
    code = dict_mf.transform(X)
    loss = np.sum((X - code @ dict_mf.components_) ** 2) / 2
    regul = dict_mf.code_alpha * (
        np.sum(np.abs(code)) * dict_mf.code_l1_ratio
        + (1 - dict_mf.code_l1_ratio) * np.sum(code ** 2) / 2)
    expected = (loss + regul) / X.shape[0]
    np.testing.assert_allclose(dict_mf.score(X), expected, rtol=1e-4)
