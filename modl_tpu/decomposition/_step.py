"""Pure-functional SOMF/OMF core: learner state pytree + jitted step.

This is the TPU-native re-design of ``modl/decomposition/dict_fact.py``
(reference call stack SURVEY.md 3.1). The reference mutates estimator
attributes in-place across a thread pool; here the entire learner state is
one immutable pytree and one jitted ``somf_step`` implements the whole
``_single_batch_fit`` pipeline (dict_fact.py:495-526):

    subset draw -> step weights -> code solve -> C/B statistics EMA ->
    block coordinate descent on the dictionary (subset columns only).

Epochs run as ``lax.scan`` over minibatches resident in HBM
(``somf_scan``); streaming callers (fMRI, callbacks) call ``somf_step``
per batch from the host.

Everything here is side-effect free: no thread hazards exist by
construction (the reference's snapshot race, dict_fact.py:535-543, has no
counterpart), so refits with the same seed are bitwise reproducible.

Documented deviation — ``comp_pos`` clamping: the reference clamps the
ENTIRE components_subset matrix at every atom iteration of the BCD
(dict_fact.py:684-685), re-clamping rows whose projection already ran
and rows not yet updated. Here only the atom being updated is clamped
before its enet projection: each row is clamped exactly once, right
before the projection that decides its final value, which is the
mathematically intended nonnegativity constraint. NMF trajectories can
therefore differ from the reference in low-order digits. The parity
oracle (tests/test_reference_parity.py) encodes the row-only semantics
and pins it, including a comp_pos=True case.
"""
import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import ema_gemm
from ..ops.enet import enet_norm, enet_projection
from ..ops.precision import precise
from ..ops.sampler import (draw_subset, draw_subset_sized, draw_window,
                           draw_window_sized)
from ..ops.solvers import (enet_regression_multi_gram,
                           enet_regression_single_gram)
from ..ops.weights import batch_weight


def _mem_sharding(kind):
    # offload is single-device by design (rejected together with meshes)
    return jax.sharding.SingleDeviceSharding(jax.devices()[0],
                                             memory_kind=kind)


def _to_host(x):
    return jax.device_put(x, _mem_sharding('pinned_host'))


def _to_device(x):
    return jax.device_put(x, _mem_sharding('device'))


def _host_gather(arr, idx):
    """Gather rows of a pinned_host-resident array (host compute)."""
    from jax.experimental.compute_on import compute_on
    with compute_on('device_host'):
        out = arr[_to_host(idx)]
    return _to_device(out)


def _host_scatter_set(arr, idx, val):
    """Scatter rows into a pinned_host-resident array (host compute)."""
    from jax.experimental.compute_on import compute_on
    with compute_on('device_host'):
        return arr.at[_to_host(idx)].set(_to_host(val))


# perf-attribution hook (benchmarks only — breaks exactness): names of
# BCD block-driver stages to skip/replace when timing
# ({'gather', 'gemm', 'scatter'}; see benchmarks/hcp_step_timing.py)
_DRIVER_ABLATE = frozenset()

# deferred-B segment-length override for on-device A/Bs
# (benchmarks/hcp_step_timing.py --seg). None = _deferred_seg's model.
# Exact math at any value (the segmentation is a summation reorder,
# pinned by tests/test_windowed.py), so this knob never breaks parity.
_SEG_OVERRIDE = None

# block-driver layout: 'gathered' = per-block row gathers/scatters at
# dynamic visit-order indices; 'prepermuted' = permute all operands
# into visit order once, static slices + dynamic_update_slice at
# static offsets per block, inverse-permute at the end. Identical math
# (pinned by tests/test_bcd_pallas.py's driver parity test); A/B'd on
# device via benchmarks/hcp_step_timing.py --driver.
_DRIVER_MODE = 'gathered'

# windowed D write-back form: 'cond' gates the head/mirror fixup behind
# lax.cond (exact no-op on interior windows), 'purewrite' computes the
# post-write head from pre-write data and writes it unconditionally
# with no read-after-write. Identical values either way (pinned by
# tests/test_windowed.py); the fast choice is size-dependent — the
# cond makes XLA materialize a defensive copy of the full-width D
# every step, negligible at ADHD shapes (~60 MB: the purewrite's extra
# head writes cost more, 90k -> 98k samples/s with cond) but
# catastrophic at HCP-1024 (~0.9 GB: 2.66 ms/batch, 21.6k -> 27.6k
# with purewrite). 'auto' switches on the static D byte size.
_WRITEBACK = 'auto'
_WRITEBACK_COND_MAX_BYTES = 256 * 1024 * 1024


def _keep_dp_sharded(x, cfg):
    """Constrain a per-sample state leaf ((n_samples, ...)) to stay
    dp-sharded under SPMD (no-op off-mesh / on indivisible axes)."""
    if x is None or cfg.mesh is None:
        return x
    dp = cfg.mesh.shape.get('dp', 1)
    if dp <= 1 or x.shape[0] % dp != 0:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    return lax.with_sharding_constraint(
        x, NamedSharding(cfg.mesh, P('dp')))


class SomfState(NamedTuple):
    """All learner state (mirrors the attribute list dict_fact.py:223-249)."""
    D: jax.Array                    # (k, n_features) dictionary
    C: jax.Array                    # (k, k) code second-moment EMA
    B: jax.Array                    # (k, n_features) code-data EMA
    G: Optional[jax.Array]          # (k, k) Gram, only for G_agg == 'full'
    comp_norm: jax.Array            # (k,) transient enet-norm budget
    code: Optional[jax.Array]       # (n_samples, k) per-sample codes
    Dx_avg: Optional[jax.Array]     # (n_samples, k), Dx_agg == 'average'
    G_avg: Optional[jax.Array]      # (n_samples, k, k), G_agg == 'average'
    n_iter: jax.Array               # () int32: samples seen
    sample_n_iter: jax.Array        # (n_samples,) int32: visits per sample
    box: jax.Array                  # (n_features,) sampler cycling box
    cursor: jax.Array               # () int32 sampler cursor
    key: jax.Array                  # PRNG key (sampler + BCD order)


@dataclass(frozen=True)
class SomfConfig:
    """Static solver configuration (hashable -> jit cache key)."""
    n_components: int
    len_subset: int
    reduction: float
    Dx_agg: str                     # 'full' | 'masked' | 'average'
    G_agg: str                      # 'full' | 'masked' | 'average'
    optimizer: str                  # 'variational' | 'sgd'
    learning_rate: float
    sample_learning_rate: float
    step_size: float
    code_alpha: float
    code_l1_ratio: float
    comp_l1_ratio: float
    code_pos: bool
    comp_pos: bool
    tol: float
    max_iter: int
    replacement: bool
    rand_size: bool = False         # Binomial subset sizes (traced mask)
    len_max: int = 0                # static subset storage width (rand_size)
    use_pallas: bool = False        # VMEM-resident BCD kernel when eligible
    code_solver: str = 'cd'         # 'cd' (reference-exact) | 'fista' (MXU)
    average_offload: bool = False   # per-sample EMA state lives in host RAM
    mesh: object = None             # jax.sharding.Mesh for SPMD runs
                                    # (hashable; pickling drops it)
    windowed: bool = False          # subsets are circular windows of one
                                    # fixed feature order (mirror-padded
                                    # storage, no gathers); `subset`
                                    # arguments are scalar window starts
    n_features: int = 0             # logical feature count (windowed mode;
                                    # stored arrays are n_features +
                                    # len_subset wide)


def _feat_count(cfg):
    """Size of the mesh's feature axis (1 off-mesh / dp-only)."""
    return cfg.mesh.shape.get('feat', 1) if cfg.mesh is not None else 1


def _subset_cols(A, subset, width, cfg, rows_dp=False):
    """Columns of A addressed by a subset: a ``dynamic_slice`` window
    (windowed mode, ``subset`` is the scalar start; the mirror pad makes
    circular windows contiguous) or a gather (index-array mode). Under a
    feat>1 mesh the window read runs shard-local + psum
    (``_window_cols_feat``): a traced-start dynamic_slice on a sharded
    axis would otherwise make GSPMD all-gather the full feature axis."""
    if cfg.windowed:
        if _feat_count(cfg) > 1:
            return _window_cols_feat(A, subset, width, cfg,
                                     rows_dp=rows_dp)
        start = jnp.asarray(subset, jnp.int32)
        return lax.dynamic_slice(A, (jnp.int32(0), start),
                                 (A.shape[0], width))
    return jnp.take(A, subset, axis=1)


def _window_cols_feat(A, start, width, cfg, rows_dp=False):
    """Window [start, start+width) of a feat-sharded 2-D array.

    Each device slices the window's intersection with its contiguous
    column shard out of a zero-padded copy of the shard (dynamic_slice
    clamping lands non-overlapping devices entirely in the zero pad),
    and one ``psum`` over 'feat' reassembles the exact (rows, width)
    window — ICI moves only the window, never the feature axis. Adding
    zeros is exact in floating point, so this is a pure layout change.
    ``rows_dp``: keep the row axis dp-sharded (minibatch operands)."""
    from jax.sharding import PartitionSpec as P
    mesh = cfg.mesh

    def read(A_loc, st):
        rows, n_loc = A_loc.shape
        off = st - lax.axis_index('feat') * n_loc
        pad = jnp.zeros((rows, width), A_loc.dtype)
        A_pad = jnp.concatenate([pad, A_loc, pad], axis=1)
        # explicit clip: lax.dynamic_slice WRAPS negative starts
        # (Python-style) rather than clamping them, so a far-off-shard
        # window (off << -width) would alias real columns instead of
        # landing in the zero pad
        begin = jnp.clip(off + width, 0, n_loc + width)
        sl = lax.dynamic_slice(A_pad, (jnp.int32(0), begin),
                               (rows, width))
        return lax.psum(sl, 'feat')

    rs = ('dp' if rows_dp and A.shape[0] % mesh.shape.get('dp', 1) == 0
          else None)
    return jax.shard_map(read, mesh=mesh, in_specs=(P(rs, 'feat'), P()),
                         out_specs=P(rs, None), check_vma=False)(
        A, jnp.asarray(start, jnp.int32))


def _windowed_writeback_feat(D, vals, head_new, start, cfg, n_log, s):
    """Feat-sharded form of the windowed 'purewrite' write-back chain:
    window write at ``start``, then the precomputed post-write head at
    column 0 and at the mirror (column ``n_log``). Each device updates
    only its own column shard with shard-local reads/writes of window
    width (no full-width copies, no cross-device traffic: the values
    are replicated inputs). Requires the per-shard width to hold a full
    window (n_stored / feat >= s — gated in DictFact._make_config)."""
    from jax.sharding import PartitionSpec as P
    mesh = cfg.mesh
    k = D.shape[0]

    def write(D_loc, V, H, st):
        n_loc = D_loc.shape[1]
        base = lax.axis_index('feat') * n_loc

        def put(D_loc, V, st0):
            off = st0 - base
            # the DUS start actually used; n_loc >= s by the config gate
            t = jnp.clip(off, 0, n_loc - s)
            d = off - t
            # align V with the local region: the final content of local
            # column t+j is V[:, t+j-off] = V[:, j-d]; clip to stay in
            # the zero pads (lax.dynamic_slice WRAPS negative starts) —
            # the no-overlap cases a clamp distorts are masked off below
            Vpad = jnp.concatenate(
                [jnp.zeros((k, s), V.dtype), V,
                 jnp.zeros((k, s), V.dtype)], axis=1)
            Vs = lax.dynamic_slice(
                Vpad, (jnp.int32(0), jnp.clip(s - d, 0, 2 * s)), (k, s))
            R = lax.dynamic_slice(D_loc, (jnp.int32(0), t), (k, s))
            j = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
            g = base + t + j                     # global column ids
            m = (g >= st0) & (g < st0 + s)
            return lax.dynamic_update_slice(
                D_loc, jnp.where(m, Vs, R), (jnp.int32(0), t))

        D_loc = put(D_loc, V, st)
        D_loc = put(D_loc, H, jnp.int32(0))
        return put(D_loc, H, jnp.int32(n_log))

    return jax.shard_map(write, mesh=mesh,
                         in_specs=(P(None, 'feat'), P(), P(), P()),
                         out_specs=P(None, 'feat'), check_vma=False)(
        D, vals, head_new, jnp.asarray(start, jnp.int32))


@precise
def _solve_code(state, X, sample_indices, w_sample, subset, cfg,
                n_valid=None):
    """Code computation with the three Dx/G estimators
    (dict_fact.py:577-648). Returns (code_batch, Dx_avg', G_avg').

    ``n_valid`` (traced, rand_size mode): only the first n_valid subset
    columns are live; the rest are zero-masked, which cancels exactly in
    every product below. Scaling stays the *fixed* ``reduction`` - the
    reference does the same under Binomial sizes (dict_fact.py:595,604).
    """
    D = state.D
    Dx_avg, G_avg = state.Dx_avg, state.G_avg
    reduction = jnp.asarray(cfg.reduction, D.dtype)

    # windowed: static window width; gather: the index array's length
    width = ((cfg.len_max if cfg.rand_size else cfg.len_subset)
             if cfg.windowed else subset.shape[0])

    if cfg.Dx_agg != 'full' or cfg.G_agg != 'full':
        D_subset = _subset_cols(D, subset, width, cfg)  # (k, s)
        if n_valid is not None:
            valid = (jnp.arange(width) < n_valid)
            D_subset = D_subset * valid.astype(D.dtype)[None, :]

    if cfg.Dx_agg == 'full':
        Dx = X @ D.T
        if cfg.windowed:
            # padded storage: the mirror columns [n, n+w) duplicate the
            # head columns [0, w) - subtract their contribution
            n_log = cfg.n_features
            Dx = Dx - X[:, n_log:] @ D[:, n_log:].T
    else:
        X_subset = _subset_cols(X, subset, width, cfg,
                                 rows_dp=True)  # (b, s)
        Dx = (X_subset @ D_subset.T) * reduction
        if cfg.Dx_agg == 'average':
            # Dx_avg (n, k) stays device-resident even in offload mode -
            # it is small (the reference likewise memmaps only
            # G_average_, dict_fact.py:431-441).
            old = Dx_avg[sample_indices]
            # unvisited rows (exact zeros, e.g. freshly allocated by a
            # mid-run aggregator switch) take the new estimate with
            # weight 1 - identical to the reference on normal paths
            # (first visit has count 1 -> w_sample == 1) and unbiased
            # after a switch
            unvisited = jnp.sum(jnp.abs(old), axis=-1) == 0
            w_eff = jnp.where(unvisited, 1.0, w_sample)
            Dx = old * (1.0 - w_eff[:, None]) + Dx * w_eff[:, None]
            Dx_avg = Dx_avg.at[sample_indices].set(Dx)

    if cfg.G_agg == 'full':
        G = state.G
    else:
        G = (D_subset @ D_subset.T) * reduction
        if cfg.G_agg == 'average':
            if cfg.average_offload:
                old = _host_gather(G_avg, sample_indices)  # (b, k, k)
            else:
                old = G_avg[sample_indices]
            unvisited = jnp.sum(jnp.abs(old), axis=(-2, -1)) == 0
            w_eff = jnp.where(unvisited, 1.0, w_sample)
            G = (old * (1.0 - w_eff[:, None, None])
                 + G[None] * w_eff[:, None, None])
            if cfg.average_offload:
                G_avg = _host_scatter_set(G_avg, sample_indices, G)
            else:
                G_avg = G_avg.at[sample_indices].set(G)

    w0 = (state.code[sample_indices] if state.code is not None
          else jnp.ones(Dx.shape, Dx.dtype))
    # windowed storage appends mirror columns that duplicate the head;
    # the solvers only use X through y_norm2 = ||x_i||^2 (dual-gap
    # scaling), which the duplicates would inflate by ||x[:w]||^2 and
    # with it the stopping tolerance — slice to the logical width (a
    # static slice XLA fuses into the norm reduction)
    X_solver = X[:, :cfg.n_features] if cfg.windowed else X
    if cfg.G_agg == 'average':
        code = enet_regression_multi_gram(
            w0, G, Dx, X_solver, cfg.code_l1_ratio, cfg.code_alpha,
            cfg.code_pos, cfg.tol, cfg.max_iter, solver=cfg.code_solver)
    else:
        code = enet_regression_single_gram(
            w0, G, Dx, X_solver, cfg.code_l1_ratio, cfg.code_alpha,
            cfg.code_pos, cfg.tol, cfg.max_iter, solver=cfg.code_solver)
    return code, Dx_avg, G_avg


def _bcd_kernel_call(cfg, D_blk, grad_blk, C_inner, cn, order):
    """Invoke the Pallas BCD kernel, mesh-aware.

    ``grad_blk`` follows the kernel's delayed-update contract
    (bcd_pallas.bcd_update): the surrogate gradient rows with any
    out-of-block residual contributions pre-subtracted — NOT the full
    residual; the kernel reconstructs per-atom residual rows itself.

    Under SPMD (``cfg.mesh``) GSPMD has no partitioning rule for the
    pallas custom call, so the call is wrapped in ``shard_map`` with
    fully-replicated specs: every device runs the identical VMEM-resident
    update (the dictionary update is replicated compute in the dp
    data-parallel decomposition anyway — the reference's analog is that
    every thread sees the full dictionary, dict_fact.py:650-715).
    Feature-sharded operands are all-gathered at entry (k x s, a few MB
    over ICI) and the replicated result re-shards on exit.
    """
    from ..ops import bcd_pallas
    kw = dict(comp_pos=cfg.comp_pos, l1_ratio=cfg.comp_l1_ratio)
    if cfg.mesh is None:
        return bcd_pallas.bcd_update(D_blk, grad_blk, C_inner, cn,
                                     order=order, **kw)
    from jax.sharding import PartitionSpec as P
    shard_map = jax.shard_map
    args = (D_blk, grad_blk, C_inner, cn)
    if order is not None:
        args = args + (order,)

    def run(*ops):
        o = ops[4] if order is not None else None
        return bcd_pallas.bcd_update(ops[0], ops[1], ops[2], ops[3],
                                     order=o, **kw)

    return shard_map(run, mesh=cfg.mesh, in_specs=(P(),) * len(args),
                     out_specs=(P(), P()), check_vma=False)(*args)


def _update_dict(D, G, comp_norm, C, grad_subset, subset, w, order, cfg,
                 n_features, n_valid=None):
    """Block coordinate descent on the subset columns (dict_fact.py:650-715).

    The per-atom rank-1 residual maintenance (BLAS ``ger`` in the
    reference) becomes outer-product updates inside a ``fori_loop`` over a
    randomly permuted atom order; the enet-norm budget bookkeeping
    (``comp_norm_``) is kept verbatim.

    ``n_valid`` (rand_size mode): columns >= n_valid are zero-masked -
    zero is a fixed point of the BCD row update (zero gradient, zero
    residual, shrinkage of 0 is 0) and contributes nothing to any norm
    or product, so the update is exactly the reference's on the first
    n_valid columns; masked columns are restored before the scatter.
    """
    k = cfg.n_components
    s = (cfg.len_max if cfg.rand_size else cfg.len_subset) \
        if cfg.windowed else subset.shape[0]
    dtype = D.dtype
    D_cols = _subset_cols(D, subset, s, cfg)    # (k, s)
    if n_valid is not None:
        valid = (jnp.arange(s) < n_valid)
        validf = valid.astype(dtype)[None, :]
        D_subset = D_cols * validf
        grad_subset = grad_subset * validf
    else:
        D_subset = D_cols
    incremental_G = cfg.G_agg == 'full' and s < n_features / 2.0

    if incremental_G:
        # G is maintained incrementally across the whole fit: bf16 noise
        # here would random-walk, so these k x k-output products are exact
        G = G - jnp.matmul(D_subset, D_subset.T,
                           precision=jax.lax.Precision.HIGHEST)

    from ..ops import bcd_pallas

    if (cfg.optimizer == 'variational' and cfg.use_pallas
            and bcd_pallas.supported(k, s, dtype, cfg.comp_l1_ratio)):
        # delayed-update kernel: takes the gradient directly, no
        # C @ D residual GEMM needed
        D_subset, comp_norm = _bcd_kernel_call(
            cfg, D_subset, grad_subset, C, comp_norm, order)
    elif cfg.optimizer == 'variational':
        # Block-recomputed BCD: identical sequential math, restructured
        # so the residual for each 128-atom block of the visit order is
        # recomputed with one (bs, k) x (k, s) MXU GEMM, and the per-atom
        # rank-1 corrections touch only the (bs, s) block (instead of
        # maintaining the full (k, s) residual with two rank-1 passes per
        # atom, which is HBM-traffic-bound at k ~ 1000). When a block
        # fits VMEM, the Pallas kernel runs the inner loop with zero HBM
        # traffic (XLA loop carries otherwise round-trip HBM per atom).
        # Exactness is pinned by tests/test_reference_parity.py.
        BLOCK = 128

        def make_block_body(bs):
            def block_body(j, carry):
                D_blk, R_blk, C_inner, ob, cn = carry
                cb = C_inner[:, j]                       # (bs,)
                cjj = C_inner[j, j]
                Dj = D_blk[j]                            # (s,)
                budget = cn[ob[j]] + enet_norm(Dj, cfg.comp_l1_ratio)
                Rj = R_blk[j] + cjj * Dj
                good = cjj > 1e-20
                Dj_new = jnp.where(good, Rj / jnp.where(good, cjj, 1.0),
                                   Dj)
                if cfg.comp_pos:
                    Dj_new = jnp.maximum(Dj_new, 0.0)
                Dj_new = enet_projection(Dj_new, budget,
                                         cfg.comp_l1_ratio)
                cn = cn.at[ob[j]].set(
                    budget - enet_norm(Dj_new, cfg.comp_l1_ratio))
                R_blk = R_blk - jnp.outer(cb, Dj_new - Dj)
                D_blk = D_blk.at[j].set(Dj_new)
                return D_blk, R_blk, C_inner, ob, cn
            return block_body

        pallas_bs = (bcd_pallas.max_block(k, s, dtype)
                     if cfg.use_pallas else 0)
        pallas_block = (pallas_bs >= 8
                        and k >= bcd_pallas.PANEL_ATOMS)
        if pallas_block:
            BLOCK = pallas_bs
        # blocks narrower than one panel (a < 8-row tail, e.g.
        # k = 260 with a 256 cap) cannot use the kernel: Mosaic has no
        # proof of 8-sublane alignment for sub-panel row slices
        # (cf. bcd_pallas.supported). Such tails run the lax body —
        # they are at most 7 rows.
        kernel_ok = (lambda bs: pallas_block
                     and bs >= bcd_pallas.PANEL_ATOMS)
        if pallas_block and _DRIVER_MODE == 'prepermuted':
            # one gather into visit order up front; every per-block
            # access below is a static slice and every write-back a
            # dynamic_update_slice at a static offset (in-place
            # friendly), with one inverse gather at the end
            inv = jnp.argsort(order)
            Dp = jnp.take(D_subset, order, axis=0)          # (k, s)
            Bp = jnp.take(grad_subset, order, axis=0)       # (k, s)
            Cp = jnp.take(jnp.take(C, order, axis=0), order, axis=1)
            cnp = jnp.take(comp_norm, order)
            for start in range(0, k, BLOCK):
                bs = min(BLOCK, k - start)
                B_blk = lax.slice(Bp, (start, 0), (start + bs, s))
                C_rows = lax.slice(Cp, (start, 0), (start + bs, k))
                C_inner = lax.slice(Cp, (start, start),
                                    (start + bs, start + bs))
                D_blk = lax.slice(Dp, (start, 0), (start + bs, s))
                if kernel_ok(bs):
                    out_mask = jnp.where(
                        (jnp.arange(k) >= start)
                        & (jnp.arange(k) < start + bs),
                        jnp.zeros((), dtype), jnp.ones((), dtype))
                    G_blk = B_blk - (C_rows * out_mask[None, :]) @ Dp
                    cn_blk = lax.slice(cnp, (start,), (start + bs,))
                    D_blk, cn_blk = _bcd_kernel_call(
                        cfg, D_blk, G_blk, C_inner, cn_blk, None)
                else:                       # sub-panel tail: lax body
                    R_blk = B_blk - C_rows @ Dp
                    ob = jnp.arange(start, start + bs, dtype=jnp.int32)
                    D_blk, _, _, _, cnp = lax.fori_loop(
                        0, bs, make_block_body(bs),
                        (D_blk, R_blk, C_inner, ob, cnp))
                    cn_blk = lax.slice(cnp, (start,), (start + bs,))
                Dp = lax.dynamic_update_slice(Dp, D_blk,
                                              (jnp.int32(start),
                                               jnp.int32(0)))
                cnp = lax.dynamic_update_slice(cnp, cn_blk,
                                               (jnp.int32(start),))
            D_subset = jnp.take(Dp, inv, axis=0)
            comp_norm = jnp.take(cnp, inv)
        else:
          for start in range(0, k, BLOCK):
            bs = min(BLOCK, k - start)
            ob = lax.dynamic_slice(order, (start,), (bs,))
            C_rows = jnp.take(C, ob, axis=0)             # (bs, k)
            C_inner = jnp.take(C_rows, ob, axis=1)       # (bs, bs)
            if 'gather' in _DRIVER_ABLATE:               # benchmarks only
                D_blk = lax.dynamic_slice(D_subset, (start, 0), (bs, s))
                B_blk = lax.dynamic_slice(grad_subset, (start, 0),
                                          (bs, s))
            else:
                D_blk = jnp.take(D_subset, ob, axis=0)   # (bs, s)
                B_blk = jnp.take(grad_subset, ob, axis=0)  # (bs, s)
            if kernel_ok(bs):
                # kernel contract: pre-subtract only the OUT-of-block
                # residual contributions (zero the in-block C columns);
                # the kernel reconstructs in-block rows itself
                out_mask = jnp.ones((k,), dtype).at[ob].set(0.0)
                if 'gemm' in _DRIVER_ABLATE:             # benchmarks only
                    G_blk = B_blk
                else:
                    G_blk = B_blk - (C_rows * out_mask[None, :]) @ D_subset
                cn_blk = jnp.take(comp_norm, ob)
                # rows already sit in visit order -> identity order
                D_blk, cn_blk = _bcd_kernel_call(
                    cfg, D_blk, G_blk, C_inner, cn_blk, None)
                comp_norm = comp_norm.at[ob].set(cn_blk)
                if 'scatter' in _DRIVER_ABLATE:          # benchmarks only
                    continue
            else:
                R_blk = B_blk - C_rows @ D_subset
                D_blk, _, _, _, comp_norm = lax.fori_loop(
                    0, bs, make_block_body(bs),
                    (D_blk, R_blk, C_inner, ob, comp_norm))
            D_subset = D_subset.at[ob].set(D_blk)
    else:  # 'sgd': projected gradient ascent on the surrogate
        R = grad_subset - C @ D_subset
        budgets = comp_norm + enet_norm(D_subset, cfg.comp_l1_ratio, axis=1)
        D_new = D_subset + w * cfg.step_size * R
        if cfg.comp_pos:
            D_new = jnp.maximum(D_new, 0.0)
        D_new = jax.vmap(
            lambda row, r: enet_projection(row, r, cfg.comp_l1_ratio)
        )(D_new, budgets)
        comp_norm = budgets - enet_norm(D_new, cfg.comp_l1_ratio, axis=1)
        D_subset = D_new

    if cfg.G_agg == 'full' and incremental_G:
        G = G + jnp.matmul(D_subset, D_subset.T,
                           precision=jax.lax.Precision.HIGHEST)
    if n_valid is not None:
        D_subset = jnp.where(valid[None, :], D_subset, D_cols)
    if cfg.windowed:
        # write the window, fold any wrapped tail back into the head,
        # and refresh the mirror so D[:, n:] == D[:, :s] again. Two
        # value-identical forms (pinned against each other by
        # tests/test_windowed.py), chosen by the STATIC D byte size
        # (_WRITEBACK above):
        #
        # 'purewrite' (round 4, large D): the post-write head and
        # mirror contents are computed from PRE-write data (the old
        # head + the new window values, aligned with two traced-shift
        # dynamic_slices of a zero-padded window copy), then the
        # write-back is a chain of three dynamic_update_slices with no
        # conditional and no read-after-write. At HCP-1024 shapes
        # (~0.9 GB D) the alternatives measured catastrophically: a
        # lax.cond around the fixup makes XLA materialize a defensive
        # copy of D EVERY batch, branch taken or not (2.66 ms/batch —
        # the round-4 trace's single largest op), and an unconditional
        # fixup reading head/mirror after the window write defeats
        # in-place reuse entirely (round 3: 6.2 ms/step). The pure
        # write chain keeps the carried D buffer in place:
        # 9.4 -> ~6.9 ms/batch.
        #
        # 'cond' (round 3, small D): the fixup is an exact no-op for
        # interior windows, so it is gated behind lax.cond. The cond's
        # defensive copy is noise at these sizes while the purewrite
        # form's two extra head/mirror writes are not (ADHD-70:
        # 98k samples/s cond vs 90k purewrite).
        n_log = cfg.n_features
        start = jnp.asarray(subset, jnp.int32)
        zero = jnp.int32(0)
        if 'nowb' in _DRIVER_ABLATE:                    # benchmarks only
            D_subset = D_subset * 1.0   # keep the compute, skip writes
            return D, G, comp_norm
        form = _WRITEBACK
        if _feat_count(cfg) > 1:
            # feat-sharded D: shard-local purewrite (the distributed
            # write-back below); always the purewrite form — the cond's
            # defensive carry copy and read-after-write both defeat
            # in-place reuse of the sharded carry exactly as they do
            # single-device
            form = 'purewrite'
        elif form == 'auto':
            d_bytes = D.shape[0] * D.shape[1] * jnp.dtype(dtype).itemsize
            form = ('cond' if d_bytes <= _WRITEBACK_COND_MAX_BYTES
                    else 'purewrite')
        if form == 'purewrite':
            head_pre = lax.slice(D, (0, 0), (k, s))     # pre-write read
            colh = jnp.arange(s)[None, :]
            # traced right-shift by ``start``: A[:, c] = D_subset[:, c-q]
            # via a dynamic_slice into [zeros | D_subset | zeros]
            Dpad = jnp.concatenate(
                [jnp.zeros((k, s), dtype), D_subset,
                 jnp.zeros((k, s), dtype)], axis=1)
            shift_win = lax.dynamic_slice(
                Dpad, (zero, jnp.int32(s) - start), (k, s))
            # wrapped columns: A2[:, c] = D_subset[:, c + n - start]
            # (offset clamps harmlessly when there is no wrap - the
            # where mask below is then all-false)
            shift_wrap = lax.dynamic_slice(
                Dpad, (zero, jnp.int32(s) + jnp.int32(n_log) - start),
                (k, s))
            # head after this step: window overlap (start < s) takes
            # the new window values; wrapped tail columns
            # (start + s > n) take the wrapped window values; interior
            # windows change nothing (both masks empty)
            head_new = jnp.where(colh >= start, shift_win, head_pre)
            head_new = jnp.where(colh < start + s - n_log, shift_wrap,
                                 head_new)
            if _feat_count(cfg) > 1:
                # identical three-write chain, executed shard-local on
                # the feat-sharded D (D_subset/head_new are replicated)
                D = _windowed_writeback_feat(D, D_subset, head_new,
                                             start, cfg, n_log, s)
            else:
                D = lax.dynamic_update_slice(D, D_subset, (zero, start))
                if 'nofix' not in _DRIVER_ABLATE:       # benchmarks only
                    D = lax.dynamic_update_slice(D, head_new,
                                                 (zero, zero))
                    D = lax.dynamic_update_slice(D, head_new,
                                                 (zero, jnp.int32(n_log)))
        else:
            D = lax.dynamic_update_slice(D, D_subset, (zero, start))

            def _fix_mirror(D):
                wrapped = start + s - n_log   # columns past n (<=0: none)
                head = lax.slice(D, (0, 0), (k, s))
                mirror = lax.slice(D, (0, n_log), (k, n_log + s))
                head = jnp.where(jnp.arange(s)[None, :] < wrapped,
                                 mirror, head)
                D = lax.dynamic_update_slice(D, head, (zero, zero))
                return lax.dynamic_update_slice(
                    D, head, (zero, jnp.int32(n_log)))

            if 'nofix' not in _DRIVER_ABLATE:           # benchmarks only
                needs_fix = (start < s) | (start + s > n_log)
                D = lax.cond(needs_fix, _fix_mirror, lambda D: D, D)
    else:
        D = D.at[:, subset].set(D_subset)
    if cfg.G_agg == 'full' and not incremental_G:
        G = jnp.matmul(D, D.T, precision=jax.lax.Precision.HIGHEST)
        if cfg.windowed:
            Dm = lax.slice(D, (0, cfg.n_features),
                           (k, D.shape[1]))     # mirror block (k, s)
            G = G - jnp.matmul(Dm, Dm.T,
                               precision=jax.lax.Precision.HIGHEST)
    return D, G, comp_norm


def somf_step_inner(state: SomfState, X, sample_indices, subset, order,
                    cfg: SomfConfig, n_valid=None, deferred=None):
    """The deterministic step body given an externally drawn feature
    subset and BCD atom order. Exposed separately so the full step can
    be oracle-tested against an independent implementation
    (tests/test_reference_parity.py). Leaves box/cursor/key untouched.

    ``deferred`` (windowed fused scans only): ``(B0, Xseg, SC, pi,
    trow)`` activates the deferred-B representation — B's full-width
    EMA pass is NOT applied this step; instead the segment's scaled
    code buffer SC and decay product pi are advanced, and the gradient
    window is reconstructed as ``pi * B0[:, win] + SC.T @ Xseg[:, win]``
    (identical math, summation reordered). Returns ``(state', SC', pi')``
    with ``state'.B`` left at B0; the scan driver materialises
    ``B = pi * B0 + SC.T @ Xseg`` once per segment — one full-width
    HBM pass instead of one per batch.
    """
    dtype = state.D.dtype
    b = X.shape[0]
    n_features = cfg.n_features if cfg.windowed else state.D.shape[1]

    # --- step weights ---
    n_iter = state.n_iter + b
    sample_n_iter = state.sample_n_iter.at[sample_indices].add(1)
    this_sni = sample_n_iter[sample_indices]
    w_sample = jnp.asarray(this_sni, dtype) ** (-cfg.sample_learning_rate)
    w = jnp.asarray(
        batch_weight(n_iter, b, cfg.learning_rate, 0.0, dtype=dtype), dtype)

    # --- code ---
    code_batch, Dx_avg, G_avg = _solve_code(
        state, X, sample_indices, w_sample, subset, cfg, n_valid=n_valid)
    code = (state.code.at[sample_indices].set(code_batch)
            if state.code is not None else None)

    # --- surrogate statistics (dict_fact.py:559-575) ---
    # C feeds the BCD denominators and is k x k -> exact (HIGHEST) at
    # negligible cost; B's per-step GEMM contribution is EMA-averaged
    # and HBM-bound, so it keeps the fast MXU path (docs/precision.md)
    CtC = jnp.matmul(code_batch.T, code_batch,
                     precision=jax.lax.Precision.HIGHEST)
    if cfg.optimizer == 'variational':
        C = state.C * (1.0 - w) + w * CtC / b
        if deferred is None:
            B = state.B * (1.0 - w) + w * (code_batch.T @ X) / b
        else:
            B0, Xseg, SC, pi, trow = deferred
            # advance the deferred representation: decay every earlier
            # batch's coefficient by (1 - w), deposit this batch's
            # scaled codes; pi tracks the segment's running decay of B0
            # (safe at pi -> 0: nothing is ever divided by it)
            SC = SC * (1.0 - w)
            SC = lax.dynamic_update_slice(SC, (w / b) * code_batch,
                                          (trow * b, jnp.int32(0)))
            pi = pi * (1.0 - w)
            B = state.B           # stays B0 until the segment boundary
    else:
        C = CtC / b
        B = (code_batch.T @ X) / b

    # --- dictionary update on the subset columns ---
    # (windowed: B's mirror invariant is maintained automatically - the
    # EMA above is full-width linear in the mirror-padded X)
    width = cfg.len_max if cfg.rand_size else cfg.len_subset
    if deferred is None or cfg.optimizer != 'variational':
        grad_subset = _subset_cols(B, subset, width, cfg)
    else:
        # reconstruct the window of the up-to-date B without having
        # applied any full-width pass: rows of SC for future batches
        # are still zero and contribute nothing
        Xwin = _subset_cols(Xseg, subset, width, cfg)
        grad_subset = (pi * _subset_cols(B0, subset, width, cfg)
                       + SC.T @ Xwin)
    D, G, comp_norm = _update_dict(
        state.D, state.G, state.comp_norm, C, grad_subset, subset, w,
        order, cfg, n_features, n_valid=n_valid)

    # keep the per-sample statistics dp-sharded through the step: their
    # scatter updates at global sample indices otherwise let GSPMD
    # choose (and it picks replicated), un-sharding the one state leaf
    # that grows with the dataset (G_avg, (n_samples, k, k) —
    # parallel/mesh.py::_spec_for_leaf)
    code = _keep_dp_sharded(code, cfg)
    Dx_avg = _keep_dp_sharded(Dx_avg, cfg)
    if not cfg.average_offload:
        G_avg = _keep_dp_sharded(G_avg, cfg)
    state = state._replace(D=D, C=C, B=B, G=G, comp_norm=comp_norm,
                           code=code, Dx_avg=Dx_avg, G_avg=G_avg,
                           n_iter=n_iter, sample_n_iter=sample_n_iter)
    if deferred is None:
        return state
    return state, SC, pi


def somf_step(state: SomfState, X, sample_indices, cfg: SomfConfig,
              deferred=None):
    """One minibatch update (dict_fact.py:495-526, serial semantics)."""
    # --- feature subset (sampler.pyx via traced cycling box) ---
    if cfg.windowed:
        if cfg.rand_size:
            start, n_valid, cursor, key = draw_window_sized(
                state.cursor, state.key, cfg.len_subset, cfg.len_max,
                cfg.n_features, cfg.replacement)
        else:
            start, cursor, key = draw_window(
                state.cursor, state.key, cfg.len_subset, cfg.n_features,
                cfg.replacement)
            n_valid = None
        key, order_key = jax.random.split(key)
        order = jax.random.permutation(order_key, cfg.n_components)
        state = state._replace(cursor=cursor, key=key)
        return somf_step_inner(state, X, sample_indices, start, order, cfg,
                               n_valid=n_valid, deferred=deferred)
    if cfg.rand_size:
        subset, n_valid, box, cursor, key = draw_subset_sized(
            state.box, state.cursor, state.key, cfg.len_subset,
            cfg.len_max, cfg.replacement)
    else:
        subset, box, cursor, key = draw_subset(
            state.box, state.cursor, state.key, cfg.len_subset,
            cfg.replacement)
        n_valid = None
    key, order_key = jax.random.split(key)
    order = jax.random.permutation(order_key, cfg.n_components)
    state = state._replace(box=box, cursor=cursor, key=key)
    return somf_step_inner(state, X, sample_indices, subset, order, cfg,
                           n_valid=n_valid)


somf_step_jit = jax.jit(somf_step, static_argnames=("cfg",))


def offload_supported():
    """Whether the backend can execute host-memory placement (the CPU
    runtime lacks the annotate_device_placement custom call). Runs the
    exact gather/scatter pattern the offloaded step uses."""
    try:
        host = _mem_sharding('pinned_host')
        x = jax.device_put(jnp.zeros((8, 2)), host)
        idx = jnp.arange(4, dtype=jnp.int32)

        def f(x, idx):
            blk = _host_gather(x, idx) + 1.0
            return _host_scatter_set(x, idx, blk)

        out = jax.jit(f, out_shardings=host)(x, idx)
        jax.block_until_ready(out)
        return out.sharding.memory_kind == 'pinned_host'
    except Exception:
        return False


def state_out_shardings(state, cfg):
    """out_shardings pytree pinning the offloaded EMA leaves to host."""
    host = _mem_sharding('pinned_host')
    fields = {f: None for f in state._fields}
    if cfg.average_offload and state.G_avg is not None:
        fields['G_avg'] = host
    return SomfState(**fields)


def make_offload_step(state, cfg):
    # Per-batch offloaded step (interactive paths). XLA layout
    # assignment rejects host-placed while-loop carries, so the fused
    # variant is the segmented scan below, not a plain somf_scan.
    return jax.jit(somf_step, static_argnames=("cfg",),
                   out_shardings=state_out_shardings(state, cfg))


def _offload_scan_body(state: SomfState, X_batches, idx_batches,
                       cfg: SomfConfig):
    """Segmented fused epoch for ``average_offload``.

    Host-placed arrays cannot ride a ``lax.scan`` carry, so the
    reference-memmap analog (G_average_ in host RAM,
    dict_fact.py:431-439) used to force per-batch dispatch. Instead:
    gather the segment's per-sample state rows to the device ONCE
    (G_avg from pinned host over PCIe, the device-resident per-sample
    leaves by row gather), remap the scan to segment-local sample
    indices, run the fully fused device scan, and scatter the rows
    back at the segment boundary. Segment size bounds the transient
    device residency (dict_fact.py::OFFLOAD_SEG_BYTES).

    Requires sample indices to be unique within the segment (each
    global row maps to one local row); the caller checks this and
    falls back to per-batch stepping otherwise.
    """
    flat = idx_batches.reshape(-1)
    local = jnp.arange(flat.shape[0], dtype=jnp.int32).reshape(
        idx_batches.shape)
    seg = state._replace(
        G_avg=_host_gather(state.G_avg, flat),
        Dx_avg=(state.Dx_avg[flat] if state.Dx_avg is not None else None),
        code=(state.code[flat] if state.code is not None else None),
        sample_n_iter=state.sample_n_iter[flat])

    # inside the segment every per-sample leaf (G_avg included) is
    # device-resident, so the step must take the plain device indexing
    # path — average_offload only describes the OUTER state layout
    cfg_inner = dataclasses.replace(cfg, average_offload=False)

    def body(carry, inp):
        Xb, idxb = inp
        return somf_step(carry, Xb, idxb, cfg_inner), None

    out, _ = lax.scan(body, seg, (X_batches, local))
    return state._replace(
        D=out.D, C=out.C, B=out.B, G=out.G, comp_norm=out.comp_norm,
        n_iter=out.n_iter, box=out.box, cursor=out.cursor, key=out.key,
        G_avg=_host_scatter_set(state.G_avg, flat, out.G_avg),
        Dx_avg=(state.Dx_avg.at[flat].set(out.Dx_avg)
                if state.Dx_avg is not None else None),
        code=(state.code.at[flat].set(out.code)
              if state.code is not None else None),
        sample_n_iter=state.sample_n_iter.at[flat].set(
            out.sample_n_iter))


def make_offload_scan(state, cfg):
    """Jitted segmented scan with the G_avg output pinned to host."""
    return jax.jit(_offload_scan_body, static_argnames=("cfg",),
                   out_shardings=state_out_shardings(state, cfg))


def _deferred_seg(cfg, n_batches):
    """Deferred-B segment length (batches) for the fused scan; 0 = off.

    B's per-batch EMA is one full-width read-modify-write of the (k, n)
    statistics — HBM-bound at large k (measured ~6 ms/step of the 15 ms
    HCP-1024 step). Deferring it across a segment of T batches costs a
    per-step (k, T*b) x (T*b, width) window-correction GEMM instead, so
    T is capped where the correction (~T*b*k*width MACs) stays below
    ~2/3 of the amortised full-width GEMM (b*k*n MACs)."""
    if not (cfg.windowed and cfg.optimizer == 'variational'):
        return 0
    if _SEG_OVERRIDE is not None:
        return int(min(_SEG_OVERRIDE, n_batches))
    width = cfg.len_max if cfg.rand_size else cfg.len_subset
    seg = (2 * cfg.n_features) // (3 * max(width, 1))
    return int(max(0, min(seg, 16, n_batches)))


@partial(jax.jit, static_argnames=("cfg",))
def somf_scan(state: SomfState, X_batches, idx_batches, cfg: SomfConfig):
    """Fused epoch segment: scan ``somf_step`` over stacked minibatches.

    X_batches: (n_batches, batch_size, n_features) resident in HBM.
    Windowed variational configs run the deferred-B segmentation (see
    ``somf_step_inner``): identical math with B's full-width EMA pass
    applied once per segment instead of once per batch.
    """
    T = X_batches.shape[0]
    seg = _deferred_seg(cfg, T)
    if seg < 2:
        def body(carry, inp):
            Xb, idxb = inp
            return somf_step(carry, Xb, idxb, cfg), None

        state, _ = lax.scan(body, state, (X_batches, idx_batches))
        return state

    b = X_batches.shape[1]
    k = cfg.n_components
    dtype = state.D.dtype
    pos = 0
    while pos < T:
        L = min(seg, T - pos)
        Xs = lax.slice_in_dim(X_batches, pos, pos + L, axis=0)
        Is = lax.slice_in_dim(idx_batches, pos, pos + L, axis=0)
        Xseg = Xs.reshape(L * b, -1)
        B0 = state.B
        SC0 = jnp.zeros((L * b, k), dtype)

        def body(carry, inp):
            st, SC, pi, trow = carry
            Xb, idxb = inp
            st, SC, pi = somf_step(st, Xb, idxb, cfg,
                                   deferred=(B0, Xseg, SC, pi, trow))
            return (st, SC, pi, trow + 1), None

        (state, SC, pi, _), _ = lax.scan(
            body, (state, SC0, jnp.asarray(1.0, dtype), jnp.int32(0)),
            (Xs, Is))
        # one full-width pass materialises the segment's B. An in-place
        # Pallas EMA-GEMM alternative exists (ops/ema_gemm.py) but
        # measured a ~0.4 ms/batch NET LOSS at HCP-1024 vs this dot
        # (strided column-tile DMAs lose to XLA's one-time layout copy;
        # A/B in its docstring) — it stays gated off by its ENABLED
        # flag and this branch only engages for explicit A/Bs.
        if (cfg.use_pallas and cfg.mesh is None
                and ema_gemm.supported(k, B0.shape[1], Xseg.shape[0],
                                       dtype)):
            state = state._replace(
                B=ema_gemm.ema_accumulate(B0, SC, Xseg, pi))
        else:
            state = state._replace(B=pi * B0 + SC.T @ Xseg)
        pos += L
    return state


@partial(jax.jit, static_argnames=("code_l1_ratio", "code_alpha", "code_pos",
                                   "tol", "max_iter", "solver"))
@precise
def compute_code(D, G, X, code_l1_ratio, code_alpha, code_pos, tol, max_iter,
                 solver='cd'):
    """Inference path: codes for new data rows (CodingMixin.transform,
    dict_fact.py:47-92). ``G`` may be None -> recomputed from D."""
    if G is None:
        G = D @ D.T
    Dx = X @ D.T
    w0 = jnp.ones(Dx.shape, Dx.dtype)
    return enet_regression_single_gram(
        w0, G, Dx, X, code_l1_ratio, code_alpha, code_pos, tol, max_iter,
        solver=solver)


@partial(jax.jit, static_argnames=("code_l1_ratio", "code_alpha", "code_pos",
                                   "tol", "max_iter", "solver"))
@precise
def objective_value(D, G, X, code_l1_ratio, code_alpha, code_pos, tol,
                    max_iter, solver='cd'):
    """Penalised reconstruction objective (dict_fact.py:94-114)."""
    code = compute_code(D, G, X, code_l1_ratio, code_alpha, code_pos, tol,
                        max_iter, solver=solver)
    loss = jnp.sum((X - code @ D) ** 2) / 2.0
    regul = code_alpha * (jnp.sum(jnp.abs(code)) * code_l1_ratio
                          + (1.0 - code_l1_ratio) * jnp.sum(code ** 2) / 2.0)
    return (loss + regul) / X.shape[0]


@partial(jax.jit, static_argnames=("axis",))
def apply_permutation(arr, perm, axis=0):
    return jnp.take(arr, perm, axis=axis)


@jax.jit
def apply_permutation_host(arr, perm):
    """Row permutation of a pinned_host-resident array, on the host."""
    from jax.experimental.compute_on import compute_on
    with compute_on('device_host'):
        return arr[_to_host(perm)]
