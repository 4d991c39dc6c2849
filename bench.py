"""Benchmark: SOMF training throughput, TPU vs multi-core BLAS reference.

Primary workload: the reference's ADHD headline configuration
(BASELINE.md — 70 components, ~2e5 voxels, batch 100, reduction 12,
ridge code path, exps/multi_decompose_fmri.py:35-45) streamed through
the jitted SOMF step. The baseline is a faithful numpy/BLAS
re-implementation of the same per-batch math (masked Dx/G products,
shared-Gram Cholesky code solve, C/B EMAs, block coordinate descent
with rank-1 residual updates) running on the host BLAS — a stand-in for
the reference's Cython+BLAS engine, which cannot build in this
environment (no Cython; numpy.distutils removed on Python 3.12). The
stand-in's per-op timings are audited in docs/baseline_audit.md so the
comparison is inspectable op by op.

The JSON line also carries the second BASELINE.md north star under
"extra": MovieLens-10M-scale time-to-RMSE-target for the recsys engine
(target = 95% of the bias-only RMSE), ours vs the numpy stand-in of the
reference's per-row masked ridge + BCD epoch (timed on a slice of the
batch stream and extrapolated — docs/baseline_audit.md), plus the
HCP-scale k=1024 SOMF throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
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


def _scan_epoch_seconds(df, Xb, ib, lo=1, hi=6):
    """Seconds per fused epoch, dispatch-overhead-free.

    On the tunneled backend a dispatch + scalar-sync round trip costs
    ~28 ms regardless of device work, so raw `time(scan)/steps` bakes
    a phantom per-step constant into short measurements. Timing the
    SAME single-dispatch program at ``lo`` and ``hi`` repeats and
    taking the slope cancels every per-call constant (RTT, dispatch,
    sync); arrays enter as jit arguments (closure-captured device
    arrays would be shipped as compile-time constants through the
    tunnel)."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax import lax

    from modl_tpu.decomposition._step import somf_scan

    cfg = df._cfg

    @functools.partial(jax.jit, static_argnames=('reps',))
    def many(state, Xb, ib, reps):
        def body(i, st):
            return somf_scan(st, Xb, ib, cfg)
        return lax.fori_loop(0, reps, body, state)

    def timed(reps):
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            st = many(df._state, Xb, ib, reps)
            float(jnp.sum(st.D[0, :8]) + st.n_iter)
            best = min(best, time.perf_counter() - t0)
        return best

    for reps in (lo, hi):   # compile both programs + absorb slow-start
        st = many(df._state, Xb, ib, reps)
        float(jnp.sum(st.D[0, :8]) + st.n_iter)
    return (timed(hi) - timed(lo)) / (hi - lo)


def bench_tpu(X):
    import jax.numpy as jnp

    from modl_tpu import DictFact

    df = DictFact(n_components=N_COMPONENTS, reduction=REDUCTION,
                  code_alpha=ALPHA, code_l1_ratio=0, comp_l1_ratio=1,
                  learning_rate=LR, batch_size=BATCH, random_state=0,
                  dtype=np.float32, subset_sampling='window')
    df.prepare(n_samples=N_SAMPLES, X=X)
    n_batches = N_SAMPLES // BATCH
    Xi = df._ingest_features(jnp.asarray(X, df._state.D.dtype))
    Xb = Xi.reshape(n_batches, BATCH, -1)
    ib = jnp.arange(N_SAMPLES, dtype=jnp.int32).reshape(n_batches, BATCH)
    return N_SAMPLES / _scan_epoch_seconds(df, Xb, ib)


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


def bench_hcp1024():
    """HCP-scale SOMF throughput (exps/hcp/decompose_hcp.py:51-63:
    k=1024, reduction 20, l1 dictionary ball, ~2e5 voxels)."""
    import jax.numpy as jnp

    from modl_tpu import DictFact

    n_samples, n_features, batch = 1200, 200_000, 200
    rng = np.random.RandomState(0)
    X = rng.randn(n_samples, n_features).astype(np.float32)
    df = DictFact(n_components=1024, reduction=20, code_alpha=3e-4,
                  code_l1_ratio=0, comp_l1_ratio=1, learning_rate=0.92,
                  batch_size=batch, random_state=0, dtype=np.float32,
                  subset_sampling='window')
    df.prepare(n_samples=n_samples, X=X)
    nb = n_samples // batch
    Xi = df._ingest_features(jnp.asarray(X))
    Xb = Xi.reshape(nb, batch, -1)
    ib = jnp.arange(nb * batch, dtype=jnp.int32).reshape(nb, batch)
    return n_samples / _scan_epoch_seconds(df, Xb, ib, lo=1, hi=6)


def bench_somf_vs_omf(extra):
    """The reference's headline claim — SOMF (r=12) reaches OMF-level
    objectives "an order of magnitude faster" on large data
    (/root/reference/README.md:10) — measured with identical data,
    estimator, and init (random dictionary: data-row init converges
    before the first epoch ends and leaves nothing to compare).

    Headline = the MEDIAN wall-clock speedup over the target sweep (the
    objectives OMF attains after each of its 8 epochs) pooled over 3
    planted-data seeds. A single deepest-target number is a lottery on
    where OMF's final objective happens to land relative to SOMF's
    subsampling plateau — measured 7.3x-24.9x across seeds at identical
    settings (docs/performance.md); the sweep median matches the
    reference's own presentation (compare.jpg plots the gap across the
    whole descending range) and is stable. The planted sets are
    generated on-device (4000 x 200k ~ 3.2 GB each; host generation +
    tunneled H2D would dominate wall clock); seeds reuse one jit cache
    (identical shapes). Per-reduction trajectories and both scales:
    benchmarks/somf_vs_omf.py and docs/performance.md."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from benchmarks.somf_vs_omf import (N_TEST, N_FEATURES, _planted_device,
                                        K, run_one, time_to)

    n_train = 4000
    dict_init = np.random.RandomState(42).randn(
        K, N_FEATURES).astype(np.float32)
    pooled, per_seed, unreached = [], {}, 0
    for seed in (0, 1, 2):
        X, Xt = _planted_device(n_train, N_TEST, N_FEATURES, seed=seed)
        traj_omf = run_one(1, X, Xt, dict_init, epochs=8)
        traj_somf = run_one(12, X, Xt, dict_init, epochs=24)
        del X, Xt
        vals = []
        for t_o, obj in traj_omf:
            tt = time_to(traj_somf, obj)
            if tt:
                vals.append(t_o / tt)
            else:
                unreached += 1      # SOMF budget missed this target:
                #                     counted, so a truncated sweep can
                #                     never silently inflate the median
        pooled.extend(vals)
        per_seed[str(seed)] = (round(float(np.median(vals)), 2)
                               if vals else None)
    extra["somf_vs_omf_n_train"] = n_train
    extra["somf_vs_omf_median_per_seed"] = per_seed
    extra["somf_vs_omf_targets_unreached"] = unreached
    if pooled:
        extra["somf_vs_omf_speedup"] = round(float(np.median(pooled)), 2)
        extra["somf_vs_omf_speedup_min"] = round(float(np.min(pooled)), 2)
        extra["somf_vs_omf_speedup_max"] = round(float(np.max(pooled)), 2)
    else:
        extra["somf_vs_omf_speedup"] = None


# ---------------------------------------------------------------------
# MovieLens-10M-scale recsys: time to RMSE target (BASELINE.md:25)
# ---------------------------------------------------------------------

RECSYS_SCALE = dict(n_users=69_878, n_items=10_677, nnz=10_000_000)
RECSYS_K = 50
RECSYS_ALPHA = 1.0
RECSYS_LR = 0.95
RECSYS_TARGET_FACTOR = 0.95          # target = 95% of bias-only RMSE
RECSYS_MAX_EPOCHS = 3
RECSYS_BASELINE_SLICE = 30           # baseline batches timed, then
                                     # extrapolated to the full epoch


def _recsys_data():
    import scipy.sparse as sp

    from modl_tpu.datasets.recsys import make_synthetic_ratings
    from modl_tpu.utils.recsys.cross_validation import train_test_split

    c = RECSYS_SCALE
    density = c['nnz'] / c['n_users'] / c['n_items']
    X = make_synthetic_ratings(c['n_users'], c['n_items'], rank=12,
                               density=density, seed=0)
    X_tr, X_te = train_test_split(X, train_size=0.75, random_state=0)
    return sp.csr_matrix(X_tr), sp.csr_matrix(X_te)


def bench_recsys_tpu(X_tr, X_te, target):
    """Drive the engine's windowed epoch loop (the exact fit() path,
    RecsysDictFact.fit) and clock RMSE after each epoch. The training
    matrix is packed once into device-resident padded rows
    (recsys.py::_pad_all_rows) so epochs move only row ids to the
    device; packing + all jit compiles are timed separately as
    recsys_compile_s (one-time, cacheable)."""
    import jax
    import jax.numpy as jnp
    from sklearn.utils import gen_batches

    from modl_tpu.decomposition.recsys import (
        _pad_all_rows, _predict_entries, _recsys_batch_resident,
        _recsys_window_resident, compute_biases)

    X = X_tr.copy()
    row_mean, col_mean = compute_biases(X, beta=0.1, inplace=True)
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
    alpha, lr, window = RECSYS_ALPHA, RECSYS_LR, 32

    from modl_tpu.ops import bcd_pallas
    use_pallas = (jax.default_backend() not in ('cpu',)
                  and bcd_pallas.supported(k, n_features, np.float32, 0.0))

    te_rows = np.repeat(np.arange(n_samples),
                        np.diff(X_te.indptr)).astype(np.int32)
    te_cols = X_te.indices.astype(np.int32)
    te_base = (row_mean[te_rows] + col_mean[te_cols])

    def test_rmse():
        pred = np.asarray(_predict_entries(code, D, jnp.asarray(te_rows),
                                           jnp.asarray(te_cols)))
        pred = np.clip(pred + te_base, 1.0, 5.0)
        return float(np.sqrt(np.mean((X_te.data - pred) ** 2)))

    # one-time setup: pack the matrix device-resident and compile every
    # batch shape an epoch will use (window, full single, tail single)
    # on throwaway state. Reported separately in the JSON. A second
    # pass after jax.clear_caches() measures the warm-start cost via
    # the persistent compilation cache (utils/system.py).
    t0 = time.perf_counter()
    resident = _pad_all_rows(X, n_features, np.float32)
    assert resident is not None, "bench data exceeds RESIDENT_BUDGET"
    idx_all, val_all, lens_all, _ = resident
    n_full = n_samples // batch_size
    tail = n_samples - n_full * batch_size

    def compile_all():
        warm_rows = np.stack([np.arange(batch_size) + i * batch_size
                              for i in range(window)])
        ow = np.stack([rng.permutation(k) for _ in range(window)])
        _recsys_window_resident(D, C, B, comp_norm, feature_n_iter, n_iter,
                                code, idx_all, val_all, lens_all,
                                jnp.asarray(warm_rows), jnp.asarray(ow),
                                alpha, lr, use_pallas=use_pallas)
        for b_warm in {batch_size, tail} - {0}:
            _recsys_batch_resident(D, C, B, comp_norm, feature_n_iter,
                                   n_iter, code, idx_all, val_all, lens_all,
                                   jnp.asarray(np.arange(b_warm)),
                                   jnp.asarray(rng.permutation(k)), alpha,
                                   lr, use_pallas=use_pallas)
        float(jnp.sum(D[0, :8]))

    compile_all()
    compile_s = time.perf_counter() - t0
    jax.clear_caches()
    t0 = time.perf_counter()
    compile_all()
    compile_warm_s = time.perf_counter() - t0

    elapsed = 0.0
    t_hit = None
    epochs_at_hit = None
    rmse_best = None
    for epoch in range(RECSYS_MAX_EPOCHS):
        t0 = time.perf_counter()
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
                    _recsys_window_resident(
                        D, C, B, comp_norm, feature_n_iter, n_iter, code,
                        idx_all, val_all, lens_all, jnp.asarray(rows_w),
                        jnp.asarray(orders_w), alpha, lr,
                        use_pallas=use_pallas)
                pos += window
                continue
            rows = permutation[batches[pos]]
            pos += 1
            (D, C, B, comp_norm, feature_n_iter, n_iter, code) = \
                _recsys_batch_resident(
                    D, C, B, comp_norm, feature_n_iter, n_iter, code,
                    idx_all, val_all, lens_all, jnp.asarray(rows),
                    jnp.asarray(rng.permutation(k)), alpha, lr,
                    use_pallas=use_pallas)
        float(jnp.sum(D[0, :8]) + n_iter)  # device sync
        elapsed += time.perf_counter() - t0
        r = test_rmse()
        rmse_best = r if rmse_best is None else min(rmse_best, r)
        if t_hit is None and r < target:
            t_hit = elapsed
            epochs_at_hit = epoch + 1
            break
    return t_hit, rmse_best, epochs_at_hit, compile_s, compile_warm_s


def bench_recsys_numpy_slice(X_tr):
    """Numpy/BLAS stand-in for the reference's recsys epoch (per-row
    masked ridge solve recsys.py:168-185, B scatter-EMA, union-support
    BCD recsys.py:187-213), timed over RECSYS_BASELINE_SLICE batches and
    extrapolated to the full epoch. docs/baseline_audit.md explains why
    this stands in for the Cython engine and audits each op."""
    X = X_tr
    n_samples, n_features = X.shape
    k = RECSYS_K
    rng = np.random.RandomState(0)
    D = rng.randn(k, n_features).astype(np.float32)
    D /= np.sqrt(np.sum(D ** 2, axis=1))[:, None]
    C = np.zeros((k, k), np.float32)
    B = np.zeros((k, n_features), np.float32)
    comp_norm = np.zeros((k,), np.float32)
    feature_n_iter = np.zeros((n_features,), np.int64)
    sparsity = X.nnz / n_samples / n_features
    batch_size = int(np.ceil(1.0 / sparsity))
    alpha, lr = RECSYS_ALPHA, RECSYS_LR
    eye = np.eye(k, dtype=np.float32)
    n_iter = 0
    permutation = rng.permutation(n_samples)

    t0 = time.perf_counter()
    for it in range(RECSYS_BASELINE_SLICE):
        rows = permutation[it * batch_size:(it + 1) * batch_size]
        b = len(rows)
        n_iter += b
        i = np.arange(n_iter + 1 - b, n_iter + 1, dtype=np.float64)
        w = 1.0 - np.prod(1.0 - (1.0 / i) ** lr)
        codes = np.zeros((b, k), np.float32)
        touched = []
        for j, r in enumerate(rows):
            sl = slice(X.indptr[r], X.indptr[r + 1])
            s, x = X.indices[sl], X.data[sl]
            if len(s) == 0:
                continue
            Ds = D[:, s]
            G = Ds @ Ds.T + (alpha * len(s) / n_features) * eye
            codes[j] = np.linalg.solve(G, Ds @ x)
            feature_n_iter[s] += 1
            w_B = np.minimum(1.0, w * n_iter / feature_n_iter[s]
                             ).astype(np.float32)
            B[:, s] = B[:, s] * (1 - w_B) + np.outer(codes[j], x * w_B)
            touched.append(s)
        C *= 1 - w
        C += (w / b) * codes.T @ codes
        union = np.unique(np.concatenate(touched))
        Ds = D[:, union]
        R = B[:, union] - C @ Ds
        norms0 = np.sum(Ds ** 2, axis=1)
        cn = comp_norm + norms0
        for kk in rng.permutation(k):
            R += np.outer(C[kk], Ds[kk])
            if C[kk, kk] > 1e-20:
                Ds[kk] = R[kk] / C[kk, kk]
            nr = np.sqrt(np.sum(Ds[kk] ** 2))
            lim = np.sqrt(max(cn[kk], 0.0))
            if nr > lim:
                Ds[kk] *= lim / max(nr, 1e-30)
            R -= np.outer(C[kk], Ds[kk])
        comp_norm = cn - np.sum(Ds ** 2, axis=1)
        D[:, union] = Ds
    dt = time.perf_counter() - t0
    n_batches_epoch = int(np.ceil(n_samples / batch_size))
    return dt / RECSYS_BASELINE_SLICE * n_batches_epoch


def bench_recsys():
    from modl_tpu.decomposition.recsys import compute_biases

    X_tr, X_te = _recsys_data()
    Xc = X_te.copy()
    compute_biases(Xc, beta=0.1, inplace=True)
    bias_rmse = float(np.sqrt(np.mean(Xc.data ** 2)))
    target = RECSYS_TARGET_FACTOR * bias_rmse
    t_hit, rmse_best, epochs_at_hit, compile_s, compile_warm_s = \
        bench_recsys_tpu(X_tr, X_te, target)
    base_epoch_s = bench_recsys_numpy_slice(X_tr)
    extra = {
        "recsys_ml10m_nnz": int(X_tr.nnz),
        "recsys_bias_rmse": round(bias_rmse, 4),
        "recsys_rmse_target": round(target, 4),
        "recsys_best_rmse": round(rmse_best, 4),
        "recsys_time_to_target_s": (round(t_hit, 2)
                                    if t_hit is not None else None),
        "recsys_epochs_to_target": epochs_at_hit,
        "recsys_compile_s": round(compile_s, 2),
        "recsys_compile_warm_s": round(compile_warm_s, 2),
        "recsys_baseline_epoch_s": round(base_epoch_s, 2),
    }
    if t_hit is not None:
        # the baseline runs the same math per epoch, so it reaches the
        # target in the same number of epochs
        extra["recsys_vs_baseline"] = round(
            base_epoch_s * epochs_at_hit / t_hit, 2)
    return extra


def bench_fmri_epoch(extra):
    """End-to-end fMRI epoch: .npy records -> masker -> partial_fit
    (the flagship streaming use case, reference fmri.py:500-544).

    Records are stored pre-permuted (window-ordered subsets) by the
    rest.py pipeline; the driver's raw fast path loads them as mmaps in
    a 2-deep prefetch ring and runs detrend/standardize fused on the
    device. Reports the io/cpu split (the reference's io_time/cpu_time
    contract) and the measured host->device link bandwidth: on this
    tunneled rig the link (~45 MB/s) IS the epoch — a co-located host
    (PCIe >= 16 GB/s) moves the bound back to the device step
    (docs/performance.md).
    """
    import shutil
    import tempfile

    import jax.numpy as jnp

    from modl_tpu.decomposition.fmri import fMRIDictFact
    from modl_tpu.input_data.fmri import (create_raw_rest_data,
                                          get_raw_rest_data)

    n_rec, frames = 2, 200
    rng = np.random.RandomState(0)
    V = rng.randn(N_COMPONENTS, N_FEATURES).astype(np.float32) / 30
    recs = [(rng.randn(frames, N_COMPONENTS).astype(np.float32) @ V
             + 0.1 * rng.randn(frames, N_FEATURES).astype(np.float32))
            for _ in range(n_rec)]
    mask = np.ones((N_FEATURES, 1, 1), bool)

    # measured link bandwidth at record shape (one transfer)
    t0 = time.perf_counter()
    x = jnp.asarray(recs[0])
    float(jnp.sum(x[0, :8]))
    link = recs[0].nbytes / 1e6 / (time.perf_counter() - t0)
    extra["fmri_h2d_MBps"] = round(link, 1)
    del x

    for tag, dtype in (("", np.float32), ("_f16", np.float16)):
        d = tempfile.mkdtemp(prefix='modl_fmri_bench')
        try:
            create_raw_rest_data(recs, mask, d, standardize=False,
                                 detrend=False, feature_order=0,
                                 dtype=dtype)
            masker, records = get_raw_rest_data(d)
            # clean at fit time (on device) rather than at store time,
            # so the bench exercises the full preprocessing path
            masker.standardize = True
            masker.detrend = True

            def run(n_epochs=1):
                fd = fMRIDictFact(
                    method='masked', n_components=N_COMPONENTS,
                    reduction=REDUCTION, batch_size=BATCH,
                    n_epochs=n_epochs, alpha=ALPHA, mask=masker,
                    standardize=True, detrend=True, random_state=0)
                fd.fit(records)
                return fd

            run()                      # compile + warm the jit cache
            t0 = time.perf_counter()
            fd = run()                 # measured epoch
            dt = time.perf_counter() - t0
            extra["fmri_epoch_samples_per_s" + tag] = round(
                n_rec * frames / dt, 1)
            if not tag:
                extra["fmri_io_s"] = round(fd.io_time_, 3)
                extra["fmri_cpu_s"] = round(fd.cpu_time_, 3)
                # multi-epoch: epochs >= 2 replay records from the
                # device-resident cache (fmri.py::_RecordCache), so the
                # steady-state epoch never touches the host link
                t0 = time.perf_counter()
                fd3 = run(n_epochs=3)
                dt3 = time.perf_counter() - t0
                extra["fmri_steady_epoch_samples_per_s"] = round(
                    2 * n_rec * frames / max(dt3 - dt, 1e-9), 1)
                extra["fmri_record_cache"] = fd3.record_cache_info_
        finally:
            shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------
# Absolute-terms accounting: MFU and HBM-roofline fractions
# ---------------------------------------------------------------------

V5E_PEAK_BF16_FLOPS = 197e12     # one v5e chip, bf16 MXU peak
V5E_HBM_BPS = 819e9              # one v5e chip, HBM bandwidth


def _somf_model_flops_per_batch(k, b, s, n):
    """Mathematical (2*m*n*k) MXU FLOPs of one windowed SOMF batch.

    Mirrors the stage table in docs/roofline_hcp.md; counts each GEMM
    at its mathematical cost (the implementation's 3-pass f32 Gram is
    an execution detail, not model work). The BCD dictionary update
    contributes its driver out-of-block GEMM and the kernel's panel
    reconstructions, each ~2*k^2*s across the k rows."""
    flops = 0.0
    flops += 2 * b * s * k            # masked Dx = Xs @ Ds.T
    flops += 2 * k * k * s            # masked Gram G = Ds @ Ds.T
    flops += (2 / 3) * k ** 3 + 4 * b * k * k   # Cholesky + 2 tri solves
    flops += 2 * b * k * k            # C EMA (code.T @ code)
    flops += 2 * k * b * s            # deferred-B window contribution
    flops += 2 * k * b * n            # B segment materialisation,
    #                                   amortised: 2*k*(T*b)*n / T
    flops += 2 * k * k * s            # BCD driver out-of-block GEMM
    flops += 2 * k * k * s            # BCD kernel panel contractions
    return flops


def _somf_model_bytes_per_batch(k, b, s, n):
    """f32 HBM bytes one windowed SOMF batch must touch (lower bound):
    the batch's feature window, read+write of the D and B windows
    (statistics EMA + dictionary write-back), one extra read of the D
    window for the Gram, and the amortised full-width B segment pass
    (read+write of (k, n) once per T = segment batches, T*b*s = b*n)."""
    f32 = 4
    return f32 * (b * s            # X window
                  + 4 * k * s      # D window r/w, B window r/w
                  + k * s          # D window re-read for the Gram
                  + 2 * k * n / max(n / s, 1.0))   # amortised B pass


def bench_roofline(extra, adhd_sps):
    """hcp1024_mfu / adhd70_hbm_frac: measured throughput divided by
    the chip's bf16-peak FLOP model resp. HBM byte model (VERDICT r3
    item 3). The FLOP/byte models are printed alongside so the derived
    fractions are auditable."""
    hcp_sps = extra.get("hcp1024_samples_per_s")
    if hcp_sps:
        b, k, n = 200, 1024, 200_000
        s = n // 20
        fl = _somf_model_flops_per_batch(k, b, s, n)
        t_batch = b / hcp_sps
        extra["hcp1024_model_gflop_per_batch"] = round(fl / 1e9, 1)
        extra["hcp1024_mfu"] = round(
            fl / t_batch / V5E_PEAK_BF16_FLOPS, 4)
    if adhd_sps:
        b, k, n = BATCH, N_COMPONENTS, N_FEATURES
        s = n // REDUCTION
        by = _somf_model_bytes_per_batch(k, b, s, n)
        fl = _somf_model_flops_per_batch(k, b, s, n)
        t_batch = b / adhd_sps
        extra["adhd70_model_mb_per_batch"] = round(by / 1e6, 1)
        extra["adhd70_hbm_frac"] = round(by / t_batch / V5E_HBM_BPS, 4)
        extra["adhd70_mfu"] = round(
            fl / t_batch / V5E_PEAK_BF16_FLOPS, 4)


def bench_multicore_model(tpu_sps, extra):
    """Modeled multi-core baseline margins (BASELINE.md's north star is
    'vs MULTI-CORE Cython modl'; this host has 1 core, so the scaling
    is modeled from measured per-op costs + the reference's actual
    concurrency structure — benchmarks/baseline_audit.py docstrings and
    docs/baseline_audit.md carry the derivation and the evidence that
    the reference recsys engine is single-threaded by construction)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.baseline_audit import (audit_recsys, audit_somf,
                                           recsys_multicore_model,
                                           somf_multicore_model)
    # Every Amdahl-derived number carries a modeled_ prefix — these are
    # models of a 16-thread host, NOT measurements (docs/baseline_audit.md
    # "Labelling convention").
    somf_ops = audit_somf()
    m = somf_multicore_model(somf_ops, threads=16)
    extra["modeled_somf_base16_sps"] = round(m['generous_sps'], 1)
    extra["modeled_somf_vs_16thread"] = round(
        tpu_sps / m['generous_sps'], 1)
    extra["modeled_somf_vs_16thread_amdahl"] = round(
        tpu_sps / m['amdahl_sps'], 1)
    if extra.get("recsys_time_to_target_s") and \
            extra.get("recsys_epochs_to_target"):
        r = recsys_multicore_model(audit_recsys(), threads=16)
        # same math per epoch -> same epochs to target
        extra["modeled_recsys_vs_16thread"] = round(
            r['hypothetical_epoch_s'] * extra["recsys_epochs_to_target"]
            / extra["recsys_time_to_target_s"], 2)
        extra["recsys_reference_threading"] = "single-threaded fit loop"


def main():
    # persistent compilation cache: repo-local dir so the driver's
    # round-over-round bench runs warm-start (VERDICT r3 item 2)
    import os
    os.environ.setdefault(
        'MODL_JAX_CACHE',
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     '.jax_cache'))
    from modl_tpu.utils.system import enable_compilation_cache
    enable_compilation_cache()
    X = _data()
    # median-of-3 headline: the config was measured drifting -1.4%
    # between rounds with a single run (VERDICT r4); three full slope
    # measurements make run-to-run spread visible in the artifact
    runs = [bench_tpu(X) for _ in range(3)]
    tpu_sps = float(np.median(runs))
    base_sps = bench_numpy_baseline(X)
    extra = {}
    extra["adhd70_runs"] = [round(r, 1) for r in sorted(runs)]
    extra["adhd70_spread_pct"] = round(
        100.0 * (max(runs) - min(runs)) / tpu_sps, 2)
    try:
        extra.update(bench_recsys())
    except Exception as e:                        # never break the line
        extra["recsys_error"] = repr(e)[:200]
    try:
        extra["hcp1024_samples_per_s"] = round(bench_hcp1024(), 1)
    except Exception as e:
        extra["hcp1024_error"] = repr(e)[:200]
    try:
        bench_fmri_epoch(extra)
    except Exception as e:
        extra["fmri_error"] = repr(e)[:200]
    try:
        bench_somf_vs_omf(extra)
    except Exception as e:
        extra["somf_vs_omf_error"] = repr(e)[:200]
    try:
        bench_multicore_model(tpu_sps, extra)
    except Exception as e:
        extra["multicore_model_error"] = repr(e)[:200]
    try:
        bench_roofline(extra, tpu_sps)
    except Exception as e:
        extra["roofline_error"] = repr(e)[:200]
    print(json.dumps({
        "metric": "somf_adhd70_samples_per_s",
        "value": round(tpu_sps, 2),
        "unit": "samples/s",
        "vs_baseline": round(tpu_sps / base_sps, 2),
        "extra": extra,
    }))


if __name__ == '__main__':
    main()
