"""Windowed subset mode (ops/sampler.py::draw_window).

In windowed mode features live in one fixed random order for the whole
fit and subsets are circular windows of that order, so every subset
read/write is a ``dynamic_slice`` (TPU gathers run at ~1% of HBM
bandwidth at SOMF shapes). These tests pin:

- step identity: a windowed step equals the gather-mode step on the
  explicitly materialised window indices, for masked and full
  aggregators, with and without wraparound, and under rand_size masks;
- the mirror invariant D[:, n:] == D[:, :w] after arbitrary steps;
- end-to-end: fit() engages the mode (auto, resident), reconstructs
  planted data, reproduces bitwise across refits, and matches gather
  mode statistically.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modl_tpu import DictFact
from modl_tpu.decomposition._step import (SomfState, somf_step_inner,
                                          somf_step_jit)


def _planted(n_samples=300, n_features=400, k=6, seed=0):
    rng = np.random.RandomState(seed)
    code = rng.randn(n_samples, k)
    Q = rng.randn(k, n_features)
    return (code @ Q).astype(np.float32)


def _prepared(X, windowed, **kw):
    df = DictFact(n_components=6, reduction=4, code_alpha=1e-3,
                  code_l1_ratio=0, random_state=0, batch_size=50,
                  n_epochs=4,
                  subset_sampling='window' if windowed else 'gather', **kw)
    df.prepare(n_samples=X.shape[0], X=X)
    return df


@pytest.mark.parametrize('agg', ['masked', 'full'])
@pytest.mark.parametrize('start', [0, 117, 380])  # 380 + 100 wraps at 400
def test_windowed_step_equals_gather_step(agg, start):
    X = _planted()
    n = X.shape[1]
    dfw = _prepared(X, True, Dx_agg=agg, G_agg=agg, rand_size=False)
    dfg = _prepared(X, False, Dx_agg=agg, G_agg=agg, rand_size=False)
    cfgw, cfgg = dfw._cfg, dfg._cfg
    assert cfgw.windowed and not cfgg.windowed
    s = cfgw.len_subset

    # same logical state for both layouts
    perm = dfw._feat_perm
    stw = dfw._state
    stg = dfg._state._replace(
        D=jnp.asarray(dfw.components_), B=dfg._state.B,
        G=stw.G, key=stw.key)

    Xb = jnp.asarray(X[:50], jnp.float32)
    Xw = dfw._ingest_features(Xb)
    idx = jnp.arange(50, dtype=jnp.int32)
    order = jnp.arange(6, dtype=jnp.int32)

    outw = somf_step_inner(stw, Xw, idx, jnp.asarray(start, jnp.int32),
                           order, cfgw)
    window_feats = jnp.asarray(perm[(start + np.arange(s)) % n],
                               jnp.int32)
    outg = somf_step_inner(stg, Xb, idx, window_feats, order, cfgg)

    # masked windows run the identical GEMMs; 'full' computes the padded
    # GEMM plus a mirror-correction term, so f32 summation order differs
    rtol = 2e-5 if agg == 'masked' else 5e-4
    D_logical = np.asarray(outw.D)[:, :n][:, dfw._feat_inv]
    np.testing.assert_allclose(D_logical, np.asarray(outg.D),
                               rtol=rtol, atol=rtol / 10)
    np.testing.assert_allclose(np.asarray(outw.C), np.asarray(outg.C),
                               rtol=rtol, atol=rtol / 100)
    B_logical = np.asarray(outw.B)[:, :n][:, dfw._feat_inv]
    np.testing.assert_allclose(B_logical, np.asarray(outg.B),
                               rtol=rtol, atol=rtol)
    # mirror invariant
    np.testing.assert_array_equal(np.asarray(outw.D)[:, n:],
                                  np.asarray(outw.D)[:, :s])
    np.testing.assert_array_equal(np.asarray(outw.B)[:, n:],
                                  np.asarray(outw.B)[:, :s])


@pytest.mark.parametrize('start', [0, 117, 380])  # head / interior / wrap
def test_writeback_forms_identical(start):
    """The two windowed D write-back forms ('cond' round 3,
    'purewrite' round 4 — selected by static D size in production,
    _step._WRITEBACK='auto') produce bit-identical results on head,
    interior and wrapping windows."""
    import modl_tpu.decomposition._step as _step

    X = _planted()
    outs = {}
    for form in ('cond', 'purewrite'):
        old = _step._WRITEBACK
        _step._WRITEBACK = form
        try:
            df = _prepared(X, True, Dx_agg='masked', G_agg='masked',
                           rand_size=False)
            Xw = df._ingest_features(jnp.asarray(X[:50], jnp.float32))
            out = somf_step_inner(
                df._state, Xw, jnp.arange(50, dtype=jnp.int32),
                jnp.asarray(start, jnp.int32),
                jnp.arange(6, dtype=jnp.int32), df._cfg)
            outs[form] = np.asarray(out.D)
        finally:
            _step._WRITEBACK = old
    np.testing.assert_array_equal(outs['cond'], outs['purewrite'])
    # mirror invariant holds for both
    n, s = X.shape[1], df._cfg.len_subset
    np.testing.assert_array_equal(outs['cond'][:, n:],
                                  outs['cond'][:, :s])


def test_windowed_rand_size_step_masks_tail():
    """rand_size windows: only the first n_valid columns update."""
    X = _planted()
    n = X.shape[1]
    dfw = _prepared(X, True, Dx_agg='masked', G_agg='masked',
                    rand_size=True)
    cfg = dfw._cfg
    assert cfg.windowed and cfg.rand_size
    w = cfg.len_max
    start, n_valid = n - w // 2, w // 3          # wrapping window
    Xb = dfw._ingest_features(jnp.asarray(X[:50], jnp.float32))
    idx = jnp.arange(50, dtype=jnp.int32)
    order = jnp.arange(6, dtype=jnp.int32)
    out = somf_step_inner(dfw._state, Xb, idx,
                          jnp.asarray(start, jnp.int32), order, cfg,
                          n_valid=jnp.asarray(n_valid, jnp.int32))
    D0 = np.asarray(dfw._state.D)
    D1 = np.asarray(out.D)
    np.testing.assert_array_equal(D1[:, n:], D1[:, :w])
    # columns outside the live window prefix are untouched
    live = set((start + np.arange(n_valid)) % n)
    untouched = np.setdiff1d(np.arange(n), sorted(live))
    np.testing.assert_array_equal(D1[:, untouched], D0[:, untouched])
    changed = D1[:, sorted(live)] != D0[:, sorted(live)]
    assert changed.any()


def test_windowed_fit_reconstructs_and_reproduces():
    X = _planted()
    df = DictFact(n_components=6, reduction=4, code_alpha=1e-3,
                  code_l1_ratio=0, random_state=0, batch_size=50,
                  n_epochs=6)
    df.fit(X)
    assert df._cfg.windowed  # auto engages for resident fit()
    assert df.components_.shape == (6, X.shape[1])
    rec = df.transform(X) @ df.components_
    err = np.sum((X - rec) ** 2) / np.sum(X ** 2)
    assert err < 0.02

    df2 = DictFact(n_components=6, reduction=4, code_alpha=1e-3,
                   code_l1_ratio=0, random_state=0, batch_size=50,
                   n_epochs=6)
    df2.fit(X)
    np.testing.assert_array_equal(df.components_, df2.components_)


def test_windowed_matches_gather_quality_cycling():
    """Cycling windows tile the feature circle exactly like the
    reference partition; final quality must match gather mode."""
    X = _planted()
    errs = {}
    for mode in ('window', 'gather'):
        df = DictFact(n_components=6, reduction=4, code_alpha=1e-3,
                      code_l1_ratio=0, random_state=0, batch_size=50,
                      n_epochs=6, replacement=False, rand_size=False,
                      subset_sampling=mode)
        df.fit(X)
        assert df._cfg.windowed == (mode == 'window')
        rec = df.transform(X) @ df.components_
        errs[mode] = np.sum((X - rec) ** 2) / np.sum(X ** 2)
    assert errs['window'] < 0.02 and errs['gather'] < 0.02


def test_windowed_streaming_partial_fit():
    """partial_fit ingests (permute + pad) each incoming batch."""
    X = _planted()
    df = DictFact(n_components=6, reduction=4, code_alpha=1e-3,
                  code_l1_ratio=0, random_state=0, batch_size=50,
                  subset_sampling='window')
    df.prepare(n_samples=X.shape[0], X=X)
    assert df._cfg.windowed
    for lo in range(0, X.shape[0], 100):
        df.partial_fit(X[lo:lo + 100], np.arange(lo, lo + 100))
    rec = df.transform(X) @ df.components_
    assert np.sum((X - rec) ** 2) / np.sum(X ** 2) < 0.1


def test_windowed_set_params_g_upgrade_keeps_layout():
    X = _planted()
    df = DictFact(n_components=6, reduction=4, code_alpha=1e-3,
                  code_l1_ratio=0, random_state=0, batch_size=50,
                  subset_sampling='window', G_agg='masked',
                  Dx_agg='masked')
    df.prepare(n_samples=X.shape[0], X=X)
    df.partial_fit(X[:100], np.arange(100))
    df.set_params(G_agg='full')
    assert df._cfg.windowed
    n = X.shape[1]
    D = df.components_
    np.testing.assert_allclose(np.asarray(df._state.G), D @ D.T,
                               rtol=1e-4, atol=1e-5)
    df.partial_fit(X[100:200], np.arange(100, 200))  # still runs


@pytest.mark.parametrize('l1_ratio', [1.0, 0.5])
def test_windowed_l1_step_equals_gather_step(l1_ratio):
    """code_l1_ratio > 0: the CD/FISTA dual gap scales with
    y_norm2 = ||x||^2, which the mirror pad used to inflate — the
    windowed step must match gather-mode codes exactly (the solver sees
    identical norms)."""
    X = _planted()
    n = X.shape[1]
    kw = dict(Dx_agg='masked', G_agg='masked', rand_size=False)
    dfw = _prepared(X, True, **kw)
    dfg = _prepared(X, False, **kw)
    for df in (dfw, dfg):
        df.code_l1_ratio = l1_ratio
        df._cfg = dataclasses.replace(df._cfg, code_l1_ratio=l1_ratio,
                                      code_alpha=0.1)
    cfgw, cfgg = dfw._cfg, dfg._cfg
    s = cfgw.len_subset
    start = n - s // 2                      # wrapping window
    perm = dfw._feat_perm
    stw = dfw._state
    stg = dfg._state._replace(D=jnp.asarray(dfw.components_), key=stw.key)

    Xb = jnp.asarray(X[:50], jnp.float32)
    Xw = dfw._ingest_features(Xb)
    idx = jnp.arange(50, dtype=jnp.int32)
    order = jnp.arange(6, dtype=jnp.int32)
    outw = somf_step_inner(stw, Xw, idx, jnp.asarray(start, jnp.int32),
                           order, cfgw)
    window_feats = jnp.asarray(perm[(start + np.arange(s)) % n],
                               jnp.int32)
    outg = somf_step_inner(stg, Xb, idx, window_feats, order, cfgg)
    np.testing.assert_allclose(np.asarray(outw.code[:50]),
                               np.asarray(outg.code[:50]),
                               rtol=2e-5, atol=1e-7)
    D_logical = np.asarray(outw.D)[:, :n][:, dfw._feat_inv]
    np.testing.assert_allclose(D_logical, np.asarray(outg.D),
                               rtol=2e-5, atol=2e-6)


def test_windowed_set_params_reduction_repads():
    """The round-2 crash repro: changing ``reduction`` on a windowed
    learner must re-ingest the mirror-pad layout at the new width (the
    'reducing ratio' fMRI method does this every epoch)."""
    X = _planted()
    n = X.shape[1]
    df = _prepared(X, True, rand_size=False)
    df.partial_fit(X[:100], np.arange(100))
    D_before = df.components_.copy()
    B_before = df.B_.copy()
    df.set_params(reduction=8)
    assert df._cfg.windowed
    s = df._cfg.len_subset
    assert s == n // 8
    D_raw = np.asarray(df._state.D)
    assert D_raw.shape == (6, n + s)
    np.testing.assert_array_equal(D_raw[:, n:], D_raw[:, :s])
    # the logical state is invariant under the re-pad
    np.testing.assert_array_equal(df.components_, D_before)
    np.testing.assert_array_equal(df.B_, B_before)
    df.partial_fit(X[100:200], np.arange(100, 200))  # used to raise
    # widening within the window limit also re-pads
    df.set_params(reduction=2)
    assert df._cfg.windowed and df._cfg.len_subset == n // 2
    df.partial_fit(X[200:300], np.arange(200, 300))
    rec = df.transform(X) @ df.components_
    assert np.sum((X - rec) ** 2) / np.sum(X ** 2) < 0.2


def test_windowed_set_params_falls_back_to_gather():
    """A reduction change that makes the window wider than n/2 cannot
    keep the windowed layout: fall back to gather mode with a warning,
    restoring logical feature order."""
    X = _planted()
    df = _prepared(X, True, rand_size=True)
    assert df._cfg.windowed
    df.partial_fit(X[:100], np.arange(100))
    D_before = df.components_.copy()
    with pytest.warns(UserWarning, match='falling back to gather'):
        df.set_params(reduction=2)  # len_max = 200 + 8 std > n/2
    assert not df._cfg.windowed
    assert df._feat_perm is None
    np.testing.assert_array_equal(df.components_, D_before)
    df.partial_fit(X[100:200], np.arange(100, 200))
    rec = df.transform(X) @ df.components_
    assert np.isfinite(rec).all()


def test_windowed_reduction_annealing_sequence():
    """Simulate the fMRI 'reducing ratio' schedule end-to-end on a
    windowed learner: every epoch shrinks reduction toward 1
    (reference fmri.py:531-535)."""
    X = _planted()
    df = _prepared(X, True, rand_size=False)
    base = 8
    for epoch in range(4):
        reduction = 1 + (base - 1) / np.sqrt(epoch + 1)
        df.set_params(reduction=reduction)
        df.partial_fit(X, np.arange(X.shape[0]))
    rec = df.transform(X) @ df.components_
    assert np.sum((X - rec) ** 2) / np.sum(X ** 2) < 0.05


def test_set_params_cannot_windowize_live_gather_state():
    """A live gather-mode state has no ingestion permute baked in, so a
    mid-run switch to subset_sampling='window' must not flip the config
    (it would misinterpret the unpadded arrays)."""
    X = _planted()
    df = _prepared(X, False)
    df.partial_fit(X[:100], np.arange(100))
    df.set_params(subset_sampling='window')
    assert not df._cfg.windowed
    df.partial_fit(X[100:200], np.arange(100, 200))


@pytest.mark.parametrize('agg', ['average'])
def test_windowed_average_aggregators(agg):
    """The per-sample EMA estimators (Dx_agg/G_agg='average') read the
    same windowed D/X slices as 'masked'; end-to-end quality and layout
    invariants must hold."""
    X = _planted()
    df = DictFact(n_components=6, reduction=4, code_alpha=1e-3,
                  code_l1_ratio=0, random_state=0, batch_size=50,
                  n_epochs=6, Dx_agg=agg, G_agg=agg,
                  subset_sampling='window')
    df.fit(X)
    assert df._cfg.windowed
    n = X.shape[1]
    s = df._cfg.len_max if df._cfg.rand_size else df._cfg.len_subset
    D_raw = np.asarray(df._state.D)
    np.testing.assert_array_equal(D_raw[:, n:], D_raw[:, :s])
    rec = df.transform(X) @ df.components_
    err = np.sum((X - rec) ** 2) / np.sum(X ** 2)
    assert err < 0.02


@pytest.mark.parametrize('rand_size', [True, False])
def test_windowed_scan_deferred_B_matches_stepping(rand_size):
    """The fused epoch scan defers B's full-width EMA across segments
    (``_step._deferred_seg``): B = pi * B0 + SC.T @ Xseg with per-step
    window reconstruction. Identical math, summation reordered — the
    scan trajectory must match per-step ``somf_step`` to f32 roundoff
    on every statistics leaf."""
    from modl_tpu.decomposition._step import (_deferred_seg, somf_scan)
    X = _planted(400, 480)
    df = DictFact(n_components=6, reduction=6, code_alpha=1e-3,
                  random_state=0, batch_size=50, rand_size=rand_size,
                  subset_sampling='window')
    df.prepare(n_samples=400, X=X)
    cfg = df._cfg
    assert cfg.windowed
    assert _deferred_seg(cfg, 8) >= 2, 'deferred path must engage'
    Xd = df._ingest_features(jnp.asarray(X))
    idx = jnp.arange(400, dtype=jnp.int32)
    Xb = Xd.reshape(8, 50, -1)
    ib = idx.reshape(8, 50)
    st_scan = somf_scan(df._state, Xb, ib, cfg)
    st_step = df._state
    for t in range(8):
        st_step = somf_step_jit(st_step, Xb[t], ib[t], cfg)
    for name in ('D', 'B', 'C', 'G', 'comp_norm', 'code'):
        a, b = getattr(st_scan, name), getattr(st_step, name)
        if a is None:
            continue
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        rel = float(jnp.max(jnp.abs(a - b))) / scale
        # comp_norm is a near-zero budget residual: its own magnitude
        # is roundoff-sized, so the relative scale is inflated
        # 1e-4 headroom: the planted rank-6 data leaves the Gram
        # near-singular, so the ridge solve amplifies the f32
        # summation-reorder noise by its condition number
        tol = 1e-3 if name == 'comp_norm' else 1e-4
        assert rel < tol, f'{name}: rel {rel}'


def test_windowed_stability_matches_gather_seed_sweep():
    """Statistical validation of the windowed-sampler deviation
    (dict_fact.py:21-30: subsets are circular windows of ONE fixed
    feature order per fit, not uniform C(n, s) draws).

    Protocol = the reference's own stability metric
    (modl/decomposition/stability.py:7-30): fit several seeds per
    sampler on noisy planted data hard enough that fits genuinely
    vary (overcomplete k, l1 codes, 2 epochs), then compare the
    within-group mean pairwise amari discrepancy of windowed vs
    gather fits, and the cross-group discrepancy against both.
    Overlapping distributions == the windowed layout does not change
    what the estimator converges to, only how subsets are drawn.
    Measured sweep recorded in docs/windowed_stability.md.
    """
    from modl_tpu.decomposition.stability import (amari_discrepency,
                                                  mean_amari_discrepency)
    rng = np.random.RandomState(7)
    k_true = 6
    code = rng.randn(300, k_true)
    Q = rng.randn(k_true, 400)
    X = (code @ Q
         + np.sqrt(k_true) * rng.randn(300, 400)).astype(np.float32)

    groups = {}
    for mode in ('window', 'gather'):
        dicts = []
        for seed in range(4):
            df = DictFact(n_components=8, reduction=4, code_alpha=1e-1,
                          code_l1_ratio=1, random_state=seed,
                          batch_size=50, n_epochs=2,
                          subset_sampling=mode)
            df.fit(X)
            assert df._cfg.windowed == (mode == 'window')
            dicts.append(df.components_)
        groups[mode] = dicts

    mw, sw = mean_amari_discrepency(groups['window'])
    mg, sg = mean_amari_discrepency(groups['gather'])
    cross = [amari_discrepency(a, b)
             for a in groups['window'] for b in groups['gather']]
    mc, sc = float(np.mean(cross)), float(np.std(cross))

    # the problem must be hard enough that the metric has signal
    assert mg > 5e-3, f'sweep degenerate: gather within-mean {mg}'
    # overlapping distributions: each pair of the three means within
    # 2 sigma of the other's spread (sigma floored at 20% of the
    # means' scale so a freak zero-variance group cannot fail a
    # healthy sweep)
    floor = 0.2 * max(mw, mg, mc)
    for a, b, spread in ((mw, mg, sw + sg), (mc, mw, sc + sw),
                         (mc, mg, sc + sg)):
        assert abs(a - b) < 2 * max(spread, floor), \
            f'distributions separated: {mw}+-{sw} vs {mg}+-{sg}, ' \
            f'cross {mc}+-{sc}'
