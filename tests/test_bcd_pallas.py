"""Pallas BCD kernel vs the lax/numpy reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import modl_tpu.ops.bcd_pallas as bp


@pytest.fixture(autouse=True)
def interpret_mode():
    old = bp.INTERPRET
    bp.INTERPRET = True
    yield
    bp.INTERPRET = old


def _enet_norm(v, l1r):
    a = np.abs(v)
    return np.sum(a * (l1r + (1 - l1r) * a))


def _project(v, radius, l1r):
    from modl_tpu.ops.enet import enet_projection
    return np.asarray(enet_projection(jnp.asarray(v), radius, l1r))


def _reference(D, R, C, cn, order, comp_pos=False, l1r=0.0):
    D, R, cn = D.copy(), R.copy(), cn.copy()
    for kk in order:
        budget = cn[kk] + _enet_norm(D[kk], l1r)
        R += np.outer(C[kk], D[kk])
        if C[kk, kk] > 1e-20:
            D[kk] = R[kk] / C[kk, kk]
        if comp_pos:
            D[kk] = np.maximum(D[kk], 0)
        D[kk] = _project(D[kk], budget, l1r)
        cn[kk] = budget - _enet_norm(D[kk], l1r)
        R -= np.outer(C[kk], D[kk])
    return D, cn


@pytest.mark.parametrize("comp_pos", [False, True])
@pytest.mark.parametrize("l1r", [0.0, 1.0, 0.5])
def test_bcd_kernel_matches_reference(comp_pos, l1r):
    k, s = 8, 96
    rng = np.random.RandomState(0)
    D = rng.randn(k, s).astype(np.float32)
    D /= np.linalg.norm(D, axis=1, keepdims=True)
    C = (lambda A: (A @ A.T + 0.1 * np.eye(k)).astype(np.float32))(
        rng.randn(k, k))
    grad = rng.randn(k, s).astype(np.float32)
    R = (grad - C @ D).astype(np.float32)
    cn = np.zeros(k, np.float32)
    order = rng.permutation(k).astype(np.int32)

    # the kernel takes the gradient (delayed-update formulation); the
    # reference below maintains the explicit residual R = grad - C @ D
    Dn, cnn = bp.bcd_update(jnp.asarray(D), jnp.asarray(grad),
                            jnp.asarray(C), jnp.asarray(cn),
                            jnp.asarray(order), comp_pos=comp_pos,
                            l1_ratio=l1r)
    Dref, cnr = _reference(D, R, C, cn, order, comp_pos=comp_pos, l1r=l1r)
    np.testing.assert_allclose(np.asarray(Dn), Dref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cnn), cnr, atol=2e-5)


@pytest.mark.parametrize("mode", ["grouped", "panel"])
def test_rank1_modes_match_reference_multi_panel(mode):
    """Both in-panel residual maintenance modes reproduce the sequential
    reference across SEVERAL panels (k > PANEL_ATOMS exercises the
    inter-panel delayed update and the panel-entry cn/budget reads)."""
    k, s = 32, 80
    rng = np.random.RandomState(1)
    D = rng.randn(k, s).astype(np.float32)
    D /= np.abs(D).sum(axis=1, keepdims=True)
    C = (lambda A: (A @ A.T / k + np.eye(k)).astype(np.float32))(
        rng.randn(k, k))
    grad = rng.randn(k, s).astype(np.float32) * 0.1
    R = (grad - C @ D).astype(np.float32)
    cn = np.zeros(k, np.float32)
    order = rng.permutation(k).astype(np.int32)
    old_mode = bp.RANK1_MODE
    bp.RANK1_MODE = mode
    bp._bcd_update_ordered.clear_cache()
    try:
        Dn, cnn = bp.bcd_update(jnp.asarray(D), jnp.asarray(grad),
                                jnp.asarray(C), jnp.asarray(cn),
                                jnp.asarray(order), l1_ratio=1.0)
    finally:
        bp.RANK1_MODE = old_mode
        bp._bcd_update_ordered.clear_cache()
    Dref, cnr = _reference(D, R, C, cn, order, l1r=1.0)
    np.testing.assert_allclose(np.asarray(Dn), Dref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cnn), cnr, atol=2e-5)


def test_block_driver_pallas_matches_lax_path():
    """When k exceeds the whole-matrix VMEM budget, _update_dict runs
    the block-recomputed driver: per 'max_block' rows of the visit
    order, OUT-of-block residual contributions are pre-subtracted with
    the in-block C columns zeroed and the kernel reconstructs in-block
    rows itself (the k=1024 HCP plumbing). Shrinking VMEM_BUDGET forces
    that path at toy shapes; its trajectory must equal the pure-lax
    block path, which is itself pinned to the numpy oracle."""
    import dataclasses

    import jax.numpy as jnp

    from modl_tpu import DictFact
    from modl_tpu.decomposition._step import somf_step_jit

    rng = np.random.RandomState(2)
    k, n, b = 16, 128, 32
    X = rng.randn(4 * b, n).astype(np.float32)
    df = DictFact(n_components=k, reduction=2, code_alpha=1e-3,
                  comp_l1_ratio=1.0, random_state=0, batch_size=b,
                  dtype=np.float32)
    df.prepare(n_samples=4 * b, X=X)
    s = df._cfg.len_subset
    old_budget = bp.VMEM_BUDGET
    # between the 8-row-block and whole-k=16 footprints at this s, so
    # the driver must split into kernel-eligible (>= PANEL_ATOMS) blocks
    bp.VMEM_BUDGET = (bp.vmem_footprint(8, s)
                      + bp.vmem_footprint(k, s)) // 2
    try:
        assert not bp.supported(k, s, np.float32, 1.0)
        assert 8 <= bp.max_block(k, s, np.float32) < k
        states = {}
        for use_pallas in (True, False):
            cfg = dataclasses.replace(df._cfg, use_pallas=use_pallas)
            st = df._state
            for step in range(3):
                Xb = jnp.asarray(X[step * b:(step + 1) * b])
                idx = jnp.arange(step * b, (step + 1) * b,
                                 dtype=jnp.int32)
                st = somf_step_jit(st, Xb, idx, cfg)
            states[use_pallas] = st
    finally:
        bp.VMEM_BUDGET = old_budget
    np.testing.assert_allclose(np.asarray(states[True].D),
                               np.asarray(states[False].D),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(states[True].comp_norm),
                               np.asarray(states[False].comp_norm),
                               rtol=1e-4, atol=1e-5)


def test_supported_gating():
    assert bp.supported(70, 16000, np.float32, 0.0)
    assert bp.supported(70, 16000, np.float32, 1.0)
    assert not bp.supported(70, 16000, np.float64, 0.0)   # f64
    assert not bp.supported(1024, 16000, np.float32, 0.0)  # VMEM budget
    # sub-panel row counts: Mosaic cannot prove 8-sublane alignment of
    # the panel slices (k=6 measured failing to compile on a real v5e);
    # tiny dictionaries take the lax path
    assert not bp.supported(6, 16000, np.float32, 0.0)
    assert bp.supported(8, 16000, np.float32, 0.0)


def test_block_driver_subpanel_tail_matches_lax():
    """A tail block narrower than one panel (k % max_block in 1..7,
    e.g. k=260 at the 256 cap) cannot run the Pallas kernel (sublane
    alignment, cf. supported()); the driver must route just that block
    through the lax body and still match the pure-lax trajectory.
    Reproduced at toy scale: budget forces 16-row blocks at k=20 ->
    blocks of 16 (kernel) + 4 (lax tail)."""
    import dataclasses

    import jax.numpy as jnp

    from modl_tpu import DictFact
    from modl_tpu.decomposition._step import somf_step_jit

    rng = np.random.RandomState(4)
    k, n, b = 20, 128, 32
    X = rng.randn(3 * b, n).astype(np.float32)
    df = DictFact(n_components=k, reduction=2, code_alpha=1e-3,
                  comp_l1_ratio=1.0, random_state=0, batch_size=b,
                  dtype=np.float32)
    df.prepare(n_samples=3 * b, X=X)
    s = df._cfg.len_subset
    old_budget = bp.VMEM_BUDGET
    bp.VMEM_BUDGET = (bp.vmem_footprint(16, s)
                      + bp.vmem_footprint(k, s)) // 2
    try:
        assert not bp.supported(k, s, np.float32, 1.0)
        assert bp.max_block(k, s, np.float32) == 16
        states = {}
        for use_pallas in (True, False):
            cfg = dataclasses.replace(df._cfg, use_pallas=use_pallas)
            st = df._state
            for step in range(3):
                Xb = jnp.asarray(X[step * b:(step + 1) * b])
                idx = jnp.arange(step * b, (step + 1) * b,
                                 dtype=jnp.int32)
                st = somf_step_jit(st, Xb, idx, cfg)
            states[use_pallas] = st
    finally:
        bp.VMEM_BUDGET = old_budget
    np.testing.assert_allclose(np.asarray(states[True].D),
                               np.asarray(states[False].D),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(states[True].comp_norm),
                               np.asarray(states[False].comp_norm),
                               rtol=2e-4, atol=2e-5)


def test_l1_projection_accuracy_both_regimes():
    """The bracketed-Newton threshold tracks the exact (sort-based)
    projection: machine-exact in the shallow-shrinkage regime and
    within ~1e-2 relative on deep-shrinkage heavy-tailed rows (plain
    left-started Newton measured up to ~2x short of lam* there)."""
    from modl_tpu.ops.enet import enet_projection
    rng = np.random.RandomState(7)
    s = 4096
    cases = []
    for kind in range(3):
        if kind == 0:
            v = rng.randn(s)                      # deep: ||v||_1 >> r
        elif kind == 1:
            v = rng.laplace(size=s)               # deep heavy-tailed
        else:
            v = rng.randn(s) * 0.02               # shallow: mild shrink
        cases.append(v.astype(np.float32))
    for kind, v in enumerate(cases):
        radius = 1.0 if kind < 2 else 0.6 * np.abs(v).sum()
        got = np.asarray(bp._project_rows(jnp.asarray(v[None, :]),
                                          jnp.float32(radius), 1.0))[0]
        want = np.asarray(enet_projection(jnp.asarray(v), radius, 1.0))
        scale = max(np.abs(want).max(), 1e-30)
        tol = 2e-2 if kind < 2 else 1e-5
        assert np.abs(got - want).max() / scale < tol, (kind, np.abs(
            got - want).max() / scale)
        assert np.abs(got).sum() <= radius * (1 + 1e-5)


def test_l1_projection_feasible_on_adversarial_rows():
    """The kernel's Newton l1 projection is capped at NEWTON_ITERS;
    under-convergence is one-sided (lam < lam*), so the safeguard scale
    must keep every projected row INSIDE its l1 ball — otherwise the
    comp_norm budget bookkeeping would go negative. Spiky geometric
    magnitude ladders maximize the breakpoint count Newton must cross."""
    rng = np.random.RandomState(3)
    k, s = 8, 256
    # rows with geometrically spread magnitudes (many distinct
    # breakpoints) and a few massive spikes
    D = (rng.randn(k, s) * np.logspace(-6, 3, s)[None, :]).astype(
        np.float32)
    D[:, :4] *= 1e4
    C = np.eye(k, dtype=np.float32)  # solve step: D_new = R_k / 1
    grad = (D * 37.0).astype(np.float32)       # forces a big resolve
    cn = np.zeros(k, np.float32)
    order = np.arange(k, dtype=np.int32)
    Dn, cnn = bp.bcd_update(jnp.asarray(D), jnp.asarray(grad),
                            jnp.asarray(C), jnp.asarray(cn),
                            jnp.asarray(order), comp_pos=False,
                            l1_ratio=1.0)
    Dn, cnn = np.asarray(Dn), np.asarray(cnn)
    norms = np.abs(Dn).sum(axis=1)
    # budget for every row was cn + ||D_k||_1 = ||D_k||_1
    budgets = np.abs(D).sum(axis=1)
    assert np.all(norms <= budgets * (1 + 1e-5))
    assert np.all(cnn >= -1e-4 * budgets)


def test_prepermuted_driver_matches_gathered():
    """The two block-driver layouts (_step._DRIVER_MODE: per-block row
    gathers at dynamic visit-order indices vs one up-front permutation
    with static slices) are pure data-movement alternatives — their
    trajectories must be identical."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import modl_tpu.decomposition._step as _step
    from modl_tpu import DictFact
    from modl_tpu.decomposition._step import somf_step_jit

    rng = np.random.RandomState(3)
    k, n, b = 16, 128, 32
    X = rng.randn(3 * b, n).astype(np.float32)
    df = DictFact(n_components=k, reduction=2, code_alpha=1e-3,
                  comp_l1_ratio=1.0, random_state=0, batch_size=b,
                  dtype=np.float32)
    df.prepare(n_samples=3 * b, X=X)
    s = df._cfg.len_subset
    old_budget = bp.VMEM_BUDGET
    bp.VMEM_BUDGET = (bp.vmem_footprint(8, s)
                      + bp.vmem_footprint(k, s)) // 2
    try:
        assert 8 <= bp.max_block(k, s, np.float32) < k
        cfg = dataclasses.replace(df._cfg, use_pallas=True)
        states = {}
        for mode in ('gathered', 'prepermuted'):
            _step._DRIVER_MODE = mode
            jax.clear_caches()   # same cfg -> same jit key; force retrace
            st = df._state
            for step in range(3):
                Xb = jnp.asarray(X[step * b:(step + 1) * b])
                idx = jnp.arange(step * b, (step + 1) * b,
                                 dtype=jnp.int32)
                st = somf_step_jit(st, Xb, idx, cfg)
            states[mode] = st
    finally:
        bp.VMEM_BUDGET = old_budget
        _step._DRIVER_MODE = 'gathered'
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(states['gathered'].D),
                                  np.asarray(states['prepermuted'].D))
    np.testing.assert_array_equal(
        np.asarray(states['gathered'].comp_norm),
        np.asarray(states['prepermuted'].comp_norm))
