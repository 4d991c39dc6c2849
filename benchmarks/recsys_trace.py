"""Attribution harness for the recsys epoch (BASELINE.md north star).

Times the steady-state ML-10M epoch under ablations of the window step
so optimization work targets measured costs (the HCP analog is
benchmarks/hcp_step_timing.py + docs/roofline_hcp.md):

  full        the real window step
  nocode      ridge solve -> zeros (isolates the solve)
  nobcd       dictionary BCD skipped (isolates the union BCD)
  nobema      order-dependent B EMA skipped (sort + seg-scan + scatter)
  window=N    fusion depth A/B (one dispatch covers N batches)

The epoch loop is host-driven (the real fit path), so this measures
the same thing bench.py does — wall clock of a full epoch with a final
device sync — repeated ``--reps`` times, min reported.

Usage: python benchmarks/recsys_trace.py [--window 32] [--ablate X]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--window', type=int, default=32)
    ap.add_argument('--ablate', type=str, default='',
                    help='comma list: nocode,nobcd,nobema')
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--no-pallas', action='store_true')
    ap.add_argument('--bema', type=str, default='',
                    choices=['', 'dense', 'sort'],
                    help='B-EMA formulation A/B (recsys.BEMA_MODE)')
    args = ap.parse_args()
    ablate = frozenset(a for a in args.ablate.split(',') if a)

    import jax
    import jax.numpy as jnp
    from sklearn.utils import gen_batches

    import modl_tpu.decomposition.recsys as rc

    if args.bema:
        rc.BEMA_MODE = args.bema
    if ablate:
        # monkeypatch BEFORE any jit traces
        if 'nocode' in ablate:
            real_codes = rc._masked_ridge_codes

            def fake_codes(D, idx, val, lens, alpha):
                return jnp.zeros((idx.shape[0], D.shape[0]), D.dtype)
            rc._masked_ridge_codes = fake_codes
        if 'nobcd' in ablate:
            rc._union_bcd_kernel_call = (
                lambda use_pallas, Dm, grad, C, cn, order: (Dm, cn))
        if 'nobema' in ablate:
            rc._b_ema_update = (
                lambda B, fni, code_b, idx, val, lens, w, n_iter_new:
                (B, fni))

    # ML-10M-scale synthetic (bench.py's exact config)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import (_recsys_data, RECSYS_K, RECSYS_ALPHA, RECSYS_LR)
    import scipy.sparse as sp
    X_tr, X_te = _recsys_data()
    X = X_tr.copy()
    rc.compute_biases(X, beta=0.1, inplace=True)
    n_samples, n_features = X.shape
    k = RECSYS_K
    rng = np.random.RandomState(0)
    D0 = rng.randn(k, n_features)
    D0 /= np.sqrt(np.sum(D0 ** 2, axis=1))[:, None]
    D = jnp.asarray(D0, jnp.float32)
    C = jnp.zeros((k, k), jnp.float32)
    B = jnp.zeros((k, n_features), jnp.float32)
    comp_norm = jnp.zeros((k,), jnp.float32)
    feature_n_iter = jnp.zeros((n_features,), jnp.int32)
    n_iter = jnp.zeros((), jnp.int32)
    code = jnp.zeros((n_samples, k), jnp.float32)
    sparsity = X.nnz / n_samples / n_features
    batch_size = int(np.ceil(1.0 / sparsity))
    alpha, lr, window = RECSYS_ALPHA, RECSYS_LR, args.window

    from modl_tpu.ops import bcd_pallas
    use_pallas = (not args.no_pallas
                  and jax.default_backend() not in ('cpu',)
                  and bcd_pallas.supported(k, n_features, np.float32, 0.0))

    resident = rc._pad_all_rows(X, n_features, np.float32)
    assert resident is not None
    idx_all, val_all, lens_all, P = resident
    print('rows=%d P=%d batch=%d window=%d batches/epoch=%d '
          'dispatches/epoch~%d pallas=%s ablate=%s bema=%s'
          % (n_samples, P, batch_size, window,
             int(np.ceil(n_samples / batch_size)),
             int(np.ceil(n_samples / batch_size / window)), use_pallas,
             sorted(ablate), rc.BEMA_MODE), flush=True)

    def epoch(seed):
        nonlocal D, C, B, comp_norm, feature_n_iter, n_iter, code
        rng = np.random.RandomState(seed)
        permutation = rng.permutation(n_samples)
        batches = list(gen_batches(n_samples, batch_size))
        pos = 0
        while pos < len(batches):
            group = [bt for bt in batches[pos:pos + window]
                     if bt.stop - bt.start == batch_size]
            group = group if len(group) == window else []
            if group:
                rows_w = np.stack([permutation[bt] for bt in group])
                orders_w = np.stack([rng.permutation(k) for _ in group])
                (D, C, B, comp_norm, feature_n_iter, n_iter, code) = \
                    rc._recsys_window_resident(
                        D, C, B, comp_norm, feature_n_iter, n_iter, code,
                        idx_all, val_all, lens_all, jnp.asarray(rows_w),
                        jnp.asarray(orders_w), alpha, lr,
                        use_pallas=use_pallas)
                pos += window
                continue
            rows = permutation[batches[pos]]
            pos += 1
            (D, C, B, comp_norm, feature_n_iter, n_iter, code) = \
                rc._recsys_batch_resident(
                    D, C, B, comp_norm, feature_n_iter, n_iter, code,
                    idx_all, val_all, lens_all, jnp.asarray(rows),
                    jnp.asarray(rng.permutation(k)), alpha, lr,
                    use_pallas=use_pallas)
        float(jnp.sum(D[0, :8]) + n_iter)   # device sync

    t0 = time.perf_counter()
    epoch(100)                               # compile + warm
    print('warm_epoch_s=%.1f (incl. compile)'
          % (time.perf_counter() - t0), flush=True)
    best = float('inf')
    for rep in range(args.reps):
        t0 = time.perf_counter()
        epoch(rep)
        dt = time.perf_counter() - t0
        print('  rep%d=%.3f' % (rep, dt), flush=True)
        best = min(best, dt)
    print('epoch_s=%.3f  (%.0f rows/s)' % (best, n_samples / best))


if __name__ == '__main__':
    main()
