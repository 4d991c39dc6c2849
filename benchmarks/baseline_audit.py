"""Per-op timing audit of bench.py's numpy/BLAS baselines.

The reference (arthurmensch/modl) cannot be built in this environment —
no Cython is installed (and installs are disallowed), and its
numpy.distutils-based setup.py is incompatible with Python 3.12 — so
bench.py compares against numpy/BLAS re-implementations of the same
per-batch math. This script times every constituent op of those
baselines so the stand-in can be audited against what the reference's
Cython+BLAS kernels would cost on the same host (both dispatch the
same GEMM/POSV work to the platform BLAS; the Cython layer adds only
loop bookkeeping). Results are recorded in docs/baseline_audit.md.

Run: python benchmarks/baseline_audit.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.linalg import cho_factor, cho_solve


def clock(fn, reps=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps * 1000  # ms


def audit_somf():
    """Ops of bench.py::bench_numpy_baseline (ADHD-70 config)."""
    k, n, b, red = 70, 200_000, 100, 12
    s = n // red
    rng = np.random.RandomState(0)
    D = rng.randn(k, n).astype(np.float32)
    Xb = rng.randn(b, n).astype(np.float32)
    subset = rng.permutation(n)[:s]
    Ds = D[:, subset]
    Xs = Xb[:, subset]
    C = np.eye(k, dtype=np.float32) + 0.01
    code = rng.randn(b, k).astype(np.float32)
    B = rng.randn(k, n).astype(np.float32)

    out = {}
    out['gather_D_subset_ms'] = clock(lambda: D[:, subset])
    out['Dx_gemm_bxs_sxk_ms'] = clock(lambda: Xs @ Ds.T)
    out['G_gemm_kxs_sxk_ms'] = clock(lambda: Ds @ Ds.T)
    G = Ds @ Ds.T + 3e-4 * np.eye(k, dtype=np.float32)
    Dx = Xs @ Ds.T
    out['cho_solve_kxk_b_rhs_ms'] = clock(
        lambda: cho_solve(cho_factor(G), Dx.T))
    out['C_update_kxk_ms'] = clock(lambda: code.T @ code)
    out['B_update_gemm_kxn_ms'] = clock(lambda: code.T @ Xb)

    P = (code.T @ Xb)

    def b_ema():
        B[...] *= 0.99
        B[...] += 0.01 * P

    out['B_ema_scale_add_ms'] = clock(b_ema, reps=3)
    out['R_init_gather_gemm_ms'] = clock(lambda: B[:, subset] - C @ Ds)

    R = B[:, subset] - C @ Ds

    def bcd_pass():
        Rl, Dl = R.copy(), Ds.copy()
        for kk in range(k):
            Rl += np.outer(C[kk], Dl[kk])
            Dl[kk] = Rl[kk] / C[kk, kk]
            nr = np.sqrt(np.sum(Dl[kk] ** 2))
            if nr > 1:
                Dl[kk] /= nr
            Rl -= np.outer(C[kk], Dl[kk])

    out['bcd_k_atoms_rank1_ms'] = clock(bcd_pass, reps=3)
    out['scatter_D_subset_ms'] = clock(
        lambda: D.__setitem__((slice(None), subset), Ds))
    total = sum(v for v in out.values())
    out['sum_per_batch_ms'] = total
    out['implied_samples_per_s'] = b / total * 1000
    return out


def audit_recsys():
    """Ops of bench.py::bench_recsys_numpy_slice (ML-10M scale)."""
    k, n = 50, 10_677
    nnz_row = 140
    rng = np.random.RandomState(0)
    D = rng.randn(k, n).astype(np.float32)
    s = rng.permutation(n)[:nnz_row]
    x = rng.randn(nnz_row).astype(np.float32)
    eye = np.eye(k, dtype=np.float32)
    B = np.zeros((k, n), np.float32)
    codes = rng.randn(75, k).astype(np.float32)
    C = eye + 0.01
    union = rng.permutation(n)[:75 * nnz_row // 2]
    Ds_u = D[:, union]
    R = rng.randn(k, len(union)).astype(np.float32)

    out = {}

    def row_solve():
        Ds = D[:, s]
        G = Ds @ Ds.T + (1.0 * nnz_row / n) * eye
        return np.linalg.solve(G, Ds @ x)

    out['row_masked_ridge_ms'] = clock(row_solve, reps=50)

    cj = codes[0]

    def row_scatter():
        B[:, s] = B[:, s] * 0.99 + np.outer(cj, x * 0.01)

    out['row_B_scatter_ms'] = clock(row_scatter, reps=50)

    def bcd_union():
        Rl, Dl = R.copy(), Ds_u.copy()
        for kk in range(k):
            Rl += np.outer(C[kk], Dl[kk])
            Dl[kk] = Rl[kk] / C[kk, kk]
            nr = np.sqrt(np.sum(Dl[kk] ** 2))
            if nr > 1:
                Dl[kk] /= nr
            Rl -= np.outer(C[kk], Dl[kk])

    out['bcd_union_batch_ms'] = clock(bcd_union, reps=5)
    per_batch = (75 * (out['row_masked_ridge_ms'] + out['row_B_scatter_ms'])
                 + out['bcd_union_batch_ms'])
    out['sum_per_batch_ms'] = per_batch
    out['implied_epoch_s'] = per_batch * (69_878 / 75) / 1000
    return out


if __name__ == '__main__':
    import platform
    print(json.dumps({
        'host': {'cpus': os.cpu_count(),
                 'numpy': np.__version__,
                 'python': platform.python_version()},
        'somf_adhd70': {k: round(v, 3) for k, v in audit_somf().items()},
        'recsys_ml10m': {k: round(v, 3) for k, v in audit_recsys().items()},
    }, indent=1))
