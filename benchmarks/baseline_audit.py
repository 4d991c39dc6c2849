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


def somf_multicore_model(ops, threads=16):
    """Model the reference SOMF engine's per-batch time at T threads
    from the measured single-core per-op costs.

    The model follows the reference's actual concurrency structure
    (/root/reference/modl/decomposition/dict_fact.py):

    - the code solve is chunked over the thread pool (:614,634) and its
      GEMMs are BLAS-threaded -> scaled 1/T;
    - the B statistics task and the dictionary task run as TWO
      concurrent futures (:535-543) -> max() of the two;
    - the B GEMM is BLAS-threaded (1/T); the B EMA is a numpy
      elementwise pass (single-threaded in the reference, but the
      'generous' scenario grants it a 4x memory-bandwidth scale);
    - the BCD rank-1 sweep (:674-694) is SEQUENTIAL over atoms by
      construction (each atom's update feeds the next atom's residual);
      `ger` is single-threaded BLAS level-2. 'amdahl' keeps it serial;
      'generous' grants a 3x cache-blocking speedup a tuned
      implementation might reach.

    Returns per-batch ms and implied samples/s for both scenarios.
    """
    T = float(threads)
    code = (ops['gather_D_subset_ms'] + ops['Dx_gemm_bxs_sxk_ms']
            + ops['G_gemm_kxs_sxk_ms'] + ops['cho_solve_kxk_b_rhs_ms']
            + ops['C_update_kxk_ms']) / T
    bcd = ops['bcd_k_atoms_rank1_ms']
    dict_task = (ops['R_init_gather_gemm_ms'] / T
                 + ops['scatter_D_subset_ms'])

    def per_batch(bcd_scale, ema_scale):
        b_task = (ops['B_update_gemm_kxn_ms'] / T
                  + ops['B_ema_scale_add_ms'] / ema_scale)
        return code + max(b_task, dict_task + bcd / bcd_scale)

    amdahl = per_batch(bcd_scale=1.0, ema_scale=1.0)
    generous = per_batch(bcd_scale=3.0, ema_scale=4.0)
    batch = 100
    return {
        'threads': threads,
        'amdahl_ms_per_batch': amdahl,
        'amdahl_sps': batch / amdahl * 1000,
        'generous_ms_per_batch': generous,
        'generous_sps': batch / generous * 1000,
    }


def recsys_multicore_model(ops, threads=16):
    """Model a multi-core reference recsys engine.

    The shipped reference engine is SINGLE-THREADED by construction:
    `RecsysDictFact.fit` -> `_single_batch_fit` ->
    `_single_sample_update` is a plain Python loop with small numpy
    calls and no pool of any kind
    (/root/reference/modl/decomposition/recsys.py:135-185 — the
    in-source comment "# Could be made into Cython" marks it as not
    even compiled). Moreover its per-row B EMA is ORDER-DEPENDENT
    (feature_n_iter_ increments row by row and feeds w_B, :177-185), so
    a row-parallel variant would change the trained model — the honest
    multi-core comparator is the single-core measurement itself.

    The hypothetical below is the most charitable semantics-preserving
    speedup: per-row solve Grams pipelined across T cores (the solves
    read a D that only changes between batches, so G/Dx could be
    precomputed in parallel and the EMA applied serially), the
    union-BCD granted a 3x cache-blocking scale even though its atom
    loop is sequential.
    """
    T = float(threads)
    rows_per_batch = 75
    row_par = rows_per_batch * ops['row_masked_ridge_ms'] / T
    row_ser = rows_per_batch * ops['row_B_scatter_ms']
    bcd = ops['bcd_union_batch_ms'] / 3.0
    per_batch = row_par + row_ser + bcd
    n_batches_epoch = 69_878 / rows_per_batch
    return {
        'threads': threads,
        'hypothetical_ms_per_batch': per_batch,
        'hypothetical_epoch_s': per_batch * n_batches_epoch / 1000,
        'note': 'reference engine is single-threaded; this is a '
                'charitable semantics-preserving hypothetical',
    }


if __name__ == '__main__':
    import platform
    somf = audit_somf()
    recsys = audit_recsys()
    print(json.dumps({
        'host': {'cpus': os.cpu_count(),
                 'numpy': np.__version__,
                 'python': platform.python_version()},
        'somf_adhd70': {k: round(v, 3) for k, v in somf.items()},
        'recsys_ml10m': {k: round(v, 3) for k, v in recsys.items()},
        'somf_16thread_model': {k: (round(v, 3) if isinstance(v, float)
                                    else v)
                                for k, v in
                                somf_multicore_model(somf).items()},
        'recsys_16thread_model': {k: (round(v, 3) if isinstance(v, float)
                                      else v)
                                  for k, v in
                                  recsys_multicore_model(recsys).items()},
    }, indent=1))
