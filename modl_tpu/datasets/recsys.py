"""Recsys dataset loading (reference: modl/datasets/recsys.py).

``load_movielens`` reads MovieLens ratings from the data-dir chain
(either the reference's pickled sparse matrices or raw ``ratings.dat`` /
``ratings.csv`` GroupLens files). ``make_synthetic_ratings`` generates an
offline low-rank planted matrix for benchmarks and examples.
"""
import os

import numpy as np
import scipy.sparse as sp

from . import get_data_dirs

__all__ = ["load_movielens", "load_netflix", "make_synthetic_ratings"]


def load_movielens(version):
    data_dir = get_data_dirs()[0]
    # reference path: pickled sparse matrix
    for candidate in (os.path.join(data_dir, 'movielens%s' % version,
                                   'X_csr.pkl'),
                      os.path.join(data_dir, 'movielens%s' % version)):
        if os.path.exists(candidate):
            if candidate.endswith('.pkl'):
                from joblib import load
                return load(candidate)
            return _load_grouplens_dir(candidate)
    raise IOError('MovieLens %s not found under %s; set MODL_DATA or '
                  'MODL_SHARED_DATA' % (version, data_dir))


def _load_grouplens_dir(path):
    for name, sep in (('ratings.dat', '::'), ('ratings.csv', ',')):
        f = os.path.join(path, name)
        if os.path.exists(f):
            raw = np.genfromtxt(f, delimiter=sep, skip_header=name.endswith(
                'csv'), usecols=(0, 1, 2))
            rows = raw[:, 0].astype(int)
            cols = raw[:, 1].astype(int)
            vals = raw[:, 2]
            return sp.csr_matrix(
                (vals, (rows - rows.min(), cols - cols.min())))
    raise IOError('No ratings file in %s' % path)


def load_netflix():
    data_dir = get_data_dirs()[0]
    path = os.path.join(data_dir, 'netflix', 'X_csr.pkl')
    if not os.path.exists(path):
        raise IOError('Netflix data not found under %s' % path)
    from joblib import load
    return load(path)


def make_synthetic_ratings(n_users=1000, n_items=500, rank=10,
                           density=0.05, noise=0.1, crop=(1., 5.),
                           seed=0):
    """Planted low-rank rating matrix with a random observation mask."""
    rng = np.random.RandomState(seed)
    U = rng.randn(n_users, rank) / np.sqrt(rank)
    V = rng.randn(rank, n_items)
    nnz = int(density * n_users * n_items)
    rows = rng.randint(n_users, size=nnz)
    cols = rng.randint(n_items, size=nnz)
    vals = np.sum(U[rows] * V[:, cols].T, axis=1)
    vals += noise * rng.randn(nnz)
    # map to a rating-like scale
    vals = np.clip((vals - vals.mean()) / (vals.std() + 1e-12) + 3.0,
                   crop[0], crop[1])
    X = sp.csr_matrix((vals, (rows, cols)), shape=(n_users, n_items))
    X.sum_duplicates()
    # duplicate (u, i) draws summed above may exceed the rating scale
    X.data = np.clip(X.data, crop[0], crop[1])
    return X
