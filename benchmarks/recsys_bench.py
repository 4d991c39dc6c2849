"""MovieLens-scale recsys benchmark (BASELINE.md north star:
ML RMSE time-to-target).

Builds a synthetic planted-rank rating matrix at MovieLens-1M or -10M
scale (or loads the real data when present under the data dirs), fits
RecsysDictFact, and prints JSON: epoch time, held-out RMSE, and RMSE of
the bias-only baseline.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

from modl_tpu.decomposition.recsys import RecsysDictFact, compute_biases
from modl_tpu.utils.recsys.cross_validation import train_test_split

SCALES = {
    '1m': dict(n_users=6040, n_items=3700, nnz=1_000_000),
    '10m': dict(n_users=69878, n_items=10677, nnz=10_000_000),
}


def get_matrix(scale):
    try:
        from modl_tpu.datasets.recsys import load_movielens
        return load_movielens(scale)
    except Exception:
        cfg = SCALES[scale]
        from modl_tpu.datasets.recsys import make_synthetic_ratings
        density = cfg['nnz'] / cfg['n_users'] / cfg['n_items']
        return make_synthetic_ratings(cfg['n_users'], cfg['n_items'],
                                      rank=12, density=density, seed=0)


def main(scale='1m', n_components=50, n_epochs=3):
    X = get_matrix(scale)
    X_tr, X_te = train_test_split(X, train_size=0.75, random_state=0)
    X_tr = sp.csr_matrix(X_tr)
    X_te = sp.csr_matrix(X_te)

    mf = RecsysDictFact(n_components=n_components, alpha=1.0, beta=0.1,
                        learning_rate=0.95, batch_size=None,
                        detrend=True, crop=(1., 5.), n_epochs=1,
                        random_state=0)
    t0 = time.perf_counter()
    mf.fit(X_tr)
    first_epoch = time.perf_counter() - t0  # includes compiles
    rmses = [mf.score(X_te)]
    epoch_times = []
    for _ in range(n_epochs - 1):
        t0 = time.perf_counter()
        mf.n_epochs = 1
        mf.random_state = None
        mf.fit(X_tr)  # fresh fit per epoch keeps the API honest
        epoch_times.append(time.perf_counter() - t0)
        rmses.append(mf.score(X_te))

    Xc = X_te.copy()
    compute_biases(Xc, inplace=True)
    bias_rmse = float(np.sqrt(np.mean(Xc.data ** 2)))

    print(json.dumps({
        "bench": "recsys_ml%s" % scale,
        "nnz": int(X_tr.nnz),
        "first_epoch_s": round(first_epoch, 2),
        "warm_epoch_s": round(min(epoch_times), 2) if epoch_times else None,
        "test_rmse": round(float(min(rmses)), 4),
        "bias_only_rmse": round(bias_rmse, 4),
    }))


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--scale', default='1m', choices=['1m', '10m'])
    p.add_argument('--n-epochs', type=int, default=2)
    a = p.parse_args()
    main(scale=a.scale, n_epochs=a.n_epochs)
