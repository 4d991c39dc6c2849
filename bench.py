"""Benchmark: SOMF training throughput, TPU vs multi-core BLAS reference.

Workload: the reference's ADHD headline configuration (BASELINE.md — 70
components, ~2e5 voxels, batch 100, reduction 12, ridge code path,
exps/multi_decompose_fmri.py:35-45) streamed through the jitted SOMF
step. The baseline is a faithful numpy/BLAS re-implementation of the
same per-batch math (masked Dx/G products, shared-Gram Cholesky code
solve, C/B EMAs, block coordinate descent with rank-1 residual updates)
running with the host's multi-threaded BLAS — a stand-in for the
reference's Cython+BLAS engine, which no longer builds on modern
toolchains.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

N_COMPONENTS = 70
N_FEATURES = 200_000
BATCH = 100
REDUCTION = 12
N_SAMPLES = 2000
ALPHA = 3e-4
LR = 0.92
STEPS_MEASURE = 40
STEPS_BASELINE = 6


def _data(dtype=np.float32):
    rng = np.random.RandomState(0)
    U = rng.randn(N_SAMPLES, N_COMPONENTS).astype(dtype)
    V = rng.randn(N_COMPONENTS, N_FEATURES).astype(dtype) / 30
    return U @ V + 0.1 * rng.randn(N_SAMPLES, N_FEATURES).astype(dtype)


def bench_tpu(X):
    import jax
    import jax.numpy as jnp

    from modl_tpu import DictFact
    from modl_tpu.decomposition._step import somf_scan

    df = DictFact(n_components=N_COMPONENTS, reduction=REDUCTION,
                  code_alpha=ALPHA, code_l1_ratio=0, comp_l1_ratio=1,
                  learning_rate=LR, batch_size=BATCH, random_state=0,
                  dtype=np.float32)
    df.prepare(n_samples=N_SAMPLES, X=X)
    cfg = df._cfg
    state = df._state
    n_batches = N_SAMPLES // BATCH
    Xb = jnp.asarray(X, state.D.dtype).reshape(n_batches, BATCH, -1)
    ib = jnp.arange(N_SAMPLES, dtype=jnp.int32).reshape(n_batches, BATCH)

    def sync(s):
        # a scalar read is the only true sync on tunneled backends
        # (block_until_ready returns early there); 4-byte transfer.
        return float(jnp.sum(s.D[0, :8]) + s.n_iter)

    state = somf_scan(state, Xb, ib, cfg)  # warmup / compile
    sync(state)

    epochs = max(1, STEPS_MEASURE // n_batches)
    t0 = time.perf_counter()
    for _ in range(epochs):
        state = somf_scan(state, Xb, ib, cfg)
    sync(state)
    dt = time.perf_counter() - t0
    return epochs * N_SAMPLES / dt


def bench_numpy_baseline(X):
    """Same per-batch math in numpy + multi-threaded BLAS (float32)."""
    from scipy.linalg import cho_factor, cho_solve

    rng = np.random.RandomState(0)
    dtype = X.dtype
    k, n = N_COMPONENTS, N_FEATURES
    D = np.array(X[:k], dtype=dtype)
    nrm = np.sqrt(np.sum(D ** 2, axis=1))
    nrm[nrm == 0] = 1
    D /= nrm[:, None]
    C = np.zeros((k, k), dtype)
    B = np.zeros((k, n), dtype)
    n_iter = 0
    len_subset = n // REDUCTION
    perm = rng.permutation(n)
    cursor = 0

    def batch_weight(count, b):
        i = np.arange(count + 1 - b, count + 1, dtype=np.float64)
        return 1.0 - np.prod(1.0 - (1.0 / i) ** LR)

    t0 = time.perf_counter()
    for it in range(STEPS_BASELINE):
        lo = (it * BATCH) % (N_SAMPLES - BATCH)
        Xb = X[lo:lo + BATCH]
        if cursor + len_subset > n:
            perm = rng.permutation(n)
            cursor = 0
        subset = perm[cursor:cursor + len_subset]
        cursor += len_subset
        n_iter += BATCH
        w = batch_weight(n_iter, BATCH)
        # masked Dx / G estimators
        Ds = D[:, subset]
        Dx = Xb[:, subset] @ Ds.T * REDUCTION
        G = Ds @ Ds.T * REDUCTION
        Greg = G + ALPHA * np.eye(k, dtype=dtype)
        code = cho_solve(cho_factor(Greg), Dx.T).T
        # statistics
        C *= 1 - w
        C += w * code.T @ code / BATCH
        B *= 1 - w
        B += w * code.T @ Xb / BATCH
        # BCD dictionary update on the subset
        R = B[:, subset] - C @ Ds
        for kk in rng.permutation(k):
            R += np.outer(C[kk], Ds[kk])
            if C[kk, kk] > 1e-20:
                Ds[kk] = R[kk] / C[kk, kk]
            nr = np.sqrt(np.sum(Ds[kk] ** 2))
            if nr > 1:
                Ds[kk] /= nr
            R -= np.outer(C[kk], Ds[kk])
        D[:, subset] = Ds
    dt = time.perf_counter() - t0
    return STEPS_BASELINE * BATCH / dt


def main():
    X = _data()
    tpu_sps = bench_tpu(X)
    base_sps = bench_numpy_baseline(X)
    print(json.dumps({
        "metric": "somf_adhd70_samples_per_s",
        "value": round(tpu_sps, 2),
        "unit": "samples/s",
        "vs_baseline": round(tpu_sps / base_sps, 2),
    }))


if __name__ == '__main__':
    main()
