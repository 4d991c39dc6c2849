"""RecsysDictFact tests — port of modl/decomposition/tests/test_recsys.py:
completion consistency, detrended variant, held-out RMSE vs bias-only
baseline, plus cross-validation utility invariants."""
from math import sqrt

import numpy as np
import pytest
import scipy.sparse as sp
from numpy.testing import assert_almost_equal, assert_array_almost_equal
from sklearn.utils import check_array

from modl_tpu.decomposition.recsys import (RecsysDictFact, compute_biases,
                                           rmse)
from modl_tpu.utils.recsys.cross_validation import (ShuffleSplit,
                                                    train_test_split)


def test_dict_completion():
    rng = np.random.RandomState(0)
    U = rng.rand(50, 3)
    V = rng.rand(3, 20)
    X = np.dot(U, V)

    mf = RecsysDictFact(n_components=3, n_epochs=1, alpha=1e-3,
                        random_state=0, detrend=False, verbose=0)
    mf.fit(X)

    Y = np.dot(mf.code_, mf.components_)
    Y2 = mf.predict(X).toarray()
    assert_array_almost_equal(Y, Y2, decimal=5)

    r = np.sqrt(np.mean((X - Y) ** 2))
    r2 = mf.score(X)
    assert_almost_equal(r, r2, decimal=5)


def test_dict_completion_normalise():
    rng = np.random.RandomState(0)
    U = rng.rand(50, 3)
    V = rng.rand(3, 20)
    X = np.dot(U, V)

    mf = RecsysDictFact(n_components=3, n_epochs=1, alpha=1e-3,
                        random_state=0, verbose=0, detrend=True)
    mf.fit(X)

    Y = np.dot(mf.code_, mf.components_)
    Y += mf.col_mean_[np.newaxis, :]
    Y += mf.row_mean_[:, np.newaxis]
    Y2 = mf.predict(X).toarray()
    assert_array_almost_equal(Y, Y2, decimal=5)

    r = np.sqrt(np.mean((X - Y) ** 2))
    r2 = mf.score(X)
    assert_almost_equal(r, r2, decimal=5)


def test_dict_completion_missing():
    rng = np.random.RandomState(0)
    U = rng.rand(100, 4)
    V = rng.rand(4, 20)
    X = sp.csr_matrix(np.dot(U, V))
    X_tr, X_te = train_test_split(X, train_size=0.95)
    X_tr = sp.csr_matrix(X_tr)
    X_te = sp.csr_matrix(X_te)

    mf = RecsysDictFact(n_components=4, n_epochs=1, alpha=1,
                        random_state=0, detrend=True, verbose=0)
    mf.fit(X_tr)
    X_pred = mf.predict(X_te)
    r = sqrt(np.sum((X_te.data - X_pred.data) ** 2) / X_te.data.shape[0])
    X_te_c = check_array(X_te, accept_sparse='csr', copy=True)
    compute_biases(X_te_c, inplace=True)
    rmse_c = sqrt(np.sum((X_te.data - X_te_c.data) ** 2)
                  / X_te.data.shape[0])
    assert r < rmse_c


def test_multiple_epochs_and_batches():
    rng = np.random.RandomState(1)
    U = rng.rand(60, 3)
    V = rng.rand(3, 25)
    X = sp.csr_matrix(np.dot(U, V))
    # knock out 30% of entries
    X_tr, X_te = train_test_split(X, train_size=0.7, random_state=0)
    mf = RecsysDictFact(n_components=3, n_epochs=3, alpha=0.1,
                        batch_size=7, learning_rate=0.9, random_state=0)
    mf.fit(sp.csr_matrix(X_tr))
    score_tr = mf.score(sp.csr_matrix(X_tr))
    assert score_tr < 0.2


def test_crop():
    rng = np.random.RandomState(2)
    X = rng.rand(30, 10)
    mf = RecsysDictFact(n_components=2, n_epochs=1, alpha=0.1,
                        random_state=0, crop=(0.2, 0.8))
    mf.fit(X)
    pred = mf.predict(sp.csr_matrix(X))
    assert pred.data.max() <= 0.8 + 1e-12
    assert pred.data.min() >= 0.2 - 1e-12


def test_adaptive_batch_size():
    rng = np.random.RandomState(3)
    X = sp.random(40, 30, density=0.2, random_state=0, format='csr')
    X.data += 1.0
    mf = RecsysDictFact(n_components=3, n_epochs=1, alpha=0.5,
                        batch_size=None, random_state=0)
    mf.fit(X)
    assert mf.components_.shape == (3, 30)


def test_shuffle_split_partitions():
    X = sp.random(20, 15, density=0.3, random_state=0, format='coo')
    cv = ShuffleSplit(n_iter=3, train_size=0.75, random_state=0)
    for X_tr, X_te in cv.split(X):
        assert X_tr.nnz + X_te.nnz == X.nnz
        assert X_tr.shape == X.shape


def test_compute_biases_centers():
    rng = np.random.RandomState(4)
    X = sp.csr_matrix(rng.rand(25, 12))
    Xc = X.copy()
    row_m, col_m = compute_biases(Xc, inplace=True)
    # after two passes, row and column means are near zero
    assert abs(Xc.data.mean()) < 0.05


def test_resident_path_matches_host_packed():
    """fit() with device-resident padded rows (the default for
    moderate-size data) must produce the same trajectory as the
    streamed host-packed fallback (recsys.py::_pad_all_rows budget)."""
    from modl_tpu.decomposition import recsys as R

    rng = np.random.RandomState(3)
    U = rng.rand(140, 4)
    V = rng.rand(4, 30)
    mask = rng.rand(140, 30) < 0.3
    X = sp.csr_matrix(np.where(mask, U @ V, 0.0))

    def run():
        mf = RecsysDictFact(n_components=4, n_epochs=2, alpha=1e-2,
                            batch_size=7, random_state=0)
        mf.fit(X)
        return mf.components_, mf.code_

    D_res, code_res = run()
    old = R.RESIDENT_BUDGET
    R.RESIDENT_BUDGET = 0           # force the host-packed fallback
    try:
        D_host, code_host = run()
    finally:
        R.RESIDENT_BUDGET = old
    assert_array_almost_equal(D_res, D_host, decimal=5)
    assert_array_almost_equal(code_res, code_host, decimal=5)
