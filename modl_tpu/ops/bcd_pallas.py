"""Pallas TPU kernel for the block-coordinate-descent dictionary update.

The BCD loop (dict_fact.py:672-694) is sequential over atoms; the
textbook (right-looking) formulation does two rank-1 residual updates on
the (k, s) residual matrix R per atom plus a row solve + ball
projection. Done in XLA HLO, every iteration round-trips R through HBM
(~2 k*s*4 bytes per atom -> ~1.3 GB/batch in the ADHD-70 config).

This kernel goes one step further than keeping R resident: it never
maintains R at all (left-looking / delayed-update formulation). D and
the *gradient* rows live in VMEM; each atom's residual row is
reconstructed on the fly with ONE MXU contraction against the
in-place-updated D buffer:

    R_j = grad_j - sum_i C[j, i] * D_cur[i] + C[j, j] * D_cur[j]

where D_cur holds updated rows for already-visited atoms and original
rows for the rest - exactly the right-looking recurrence, by
telescoping. HBM sees one read of grad and one read + one write of D;
VMEM sees one (fold*k, spp) read per atom instead of the right-looking
~3 full-block touches (read R, read tiled delta, write R).

Performance shape (v5e-measured):

- Atoms are visited in row order 0..k-1: the caller pre-permutes rows
  into the random visit order (``bcd_update`` does this when given
  ``order``), so every row access inside the kernel is a cheap dynamic
  slice on the sublane dimension (``pl.ds``). An earlier one-hot
  select/merge formulation did ~6 full-block VPU passes per atom and
  measured 13x slower.
- Rows are *folded* sublane-major: the (k, s) buffers are reshaped (in
  XLA, outside the kernel) to (k*FOLD, s/FOLD) so one atom's row
  occupies FOLD=8 sublanes instead of 1. Row-local work (the ball
  projection's data-dependent reduction chain) then runs at full VPU
  sublane utilization instead of 1/8.
- The contraction weights for atom j are C's row j broadcast into the
  folded layout: row j of the pre-repeated (k, fold*k) matrix
  C_rep[j, fold*i + g] = C[j, i] is a cheap dynamic *sublane* slice
  (dynamic lane slices are slow in Mosaic), masked by the constant
  fold-selector T[f, fold*i + g] = [f == g] so each folded sublane f
  contracts with its own fold-offset rows.

Constraint geometries (static ``comp_l1_ratio``):

- l2 ball (``== 0``, default for DictFact/ImageDictFact): closed-form
  norm scaling (enet.pyx:62-70);
- l1 ball (``== 1``, the fMRI path): bracketed Newton on the convex
  piecewise-linear KKT equation g(lam) = sum(relu(|v|-lam)) = r.
  The bracket starts at [mean-shrinkage lower bound, chord-root upper
  bound]; each iteration probes max(tangent step, midpoint) and
  tightens the rejected side with a secant. Plain left-started Newton
  is exact in the common shallow-shrinkage regime but can sit ~2x
  short of lam* after 6 iterations in the deep-shrinkage regime
  (rarely-used atom against a large gradient); the bracketed form is
  machine-exact shallow and <= ~1e-2 relative deep at the same 6
  evaluations, and beats plain bisection's fixed 40-step chain ~6x;
- general elastic-net (``0 < ratio < 1``): fixed-count bisection on the
  monotone KKT equation (2^-30 relative precision, pure VPU reductions).

Scope limits: float32 and the VMEM budget below; float64 and larger
shapes fall back to the lax path
(`modl_tpu/decomposition/_step.py::_update_dict`), and large k is
handled by the block-recomputed driver there (which calls this kernel
once per row block of the visit order).
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# flipped to True by tests to run the kernel in interpreter mode on CPU
INTERPRET = False

# perf-attribution hook (benchmarks only — breaks exactness): names of
# kernel stages to skip when timing, e.g. {'proj', 'corr_in', 'c8'}
_ABLATE = frozenset()

# VMEM budget for the resident D + R buffers (bytes); beyond this fall
# back to lax / smaller row blocks. Headroom above it (v5e has ~16 MB)
# absorbs the C_rep/T constants and the rank-1 matmul temporary.
VMEM_BUDGET = 13 * 1024 * 1024 + 512 * 1024

# sublane folding factor for row-local work (VPU tile is 8 sublanes)
FOLD = 8
# fold only when rows are wide enough for the relayout to pay off
FOLD_MIN_S = 2048

# bracketed-Newton evaluations for the l1-ball threshold (see
# _project_rows): machine-exact in the shallow-shrinkage regime and
# <= ~1e-2 relative in adversarial deep-shrinkage rows at 6; residual
# under-convergence is one-sided and made feasible by the safeguard
# scale below. The chain sits on the kernel's per-atom critical path
# (~0.25 us per evaluation at k ~ 1000), so the count is kept minimal.
NEWTON_ITERS = 6
# bisection steps for the general enet-ball threshold
PROJ_ITERS = 30
# atoms per panel: the per-atom residual reconstruction is split into
# one (p*fold, fold*k) x (fold*k, spp) panel contraction against the
# out-of-panel dictionary (amortised over p atoms, full-height MXU
# operand at p*fold = 128 rows) plus a per-atom (fold, p*fold) x
# (p*fold, spp) in-panel contraction — the only matmul left on the
# sequential critical path, with a K dimension p/k the size. p=8 won
# both on-device A/Bs over 16/32, and the grouped maintenance below
# favours small panels (its per-atom FMA count grows with p).
PANEL_ATOMS = 8
# in-panel residual maintenance after each atom's update:
# - 'grouped': the panel residual is held as per-atom (fold, spp)
#   values; atom a's delta is folded into later atoms' rows with one
#   scalar-FMA each (exact f32, pure VPU). Only ONE such FMA — the
#   next atom's — sits on the sequential critical path; the rest are
#   independent and schedule alongside it.
# - 'panel': single (p*fold, spp) residual value updated with a
#   K=fold one-hot tiling matmul + masked FMA per atom (an MXU
#   round trip on the critical path).
RANK1_MODE = 'grouped'


def supported(k, s, dtype, comp_l1_ratio):
    """Whether the Pallas kernel covers this configuration."""
    del comp_l1_ratio  # all geometries are covered
    if jnp.dtype(dtype) != jnp.float32:
        return False
    # the sequential panel grid slices D_out at row offsets that are
    # multiples of fold * p; with p < PANEL_ATOMS Mosaic cannot prove
    # 8-sublane alignment of the vector loads (measured: k=6 fails to
    # compile on a real v5e). Tiny dictionaries take the lax path —
    # they are latency-trivial anyway.
    if k < PANEL_ATOMS:
        return False
    return vmem_footprint(k, s) <= VMEM_BUDGET


def vmem_footprint(k, s):
    """Model of the kernel's VMEM residency in bytes (f32).

    Resident plan (see _panel_kernel): D is the one (k x s) buffer
    (aliased in/out); the gradient, folded-C rows and panel-C blocks
    are streamed per panel. Temporaries: G ring (2 blocks) + c8 +
    R_list values + output rows ~ 5 panel-rows of width s; Ttile and
    the W value are (p*fold, fold*k) each."""
    fold = FOLD if s >= FOLD_MIN_S else 1
    sp = -(-s // fold) * fold
    p = min(PANEL_ATOMS, max(k, 1))
    kp = -(-k // p) * p
    return 4 * (kp * sp
                + 5 * p * sp
                + 2 * p * fold * fold * kp
                + 2 * p * fold * kp
                + 4 * kp)


def max_block(k_total, s, dtype):
    """Largest row-block size the kernel supports at subset width s."""
    if jnp.dtype(dtype) != jnp.float32:
        return 0
    bs = 256
    while bs >= 8 and not supported(bs, s, dtype, 0.0):
        bs //= 2
    return bs if supported(bs, s, dtype, 0.0) else 0


def _enet_norm_rows(v, l1_ratio):
    a = jnp.abs(v)
    return jnp.sum(a * (l1_ratio + (1.0 - l1_ratio) * a))


def _project_rows(v, radius, l1_ratio):
    """Elastic-net-ball projection of one atom row (any 2-D layout of
    the same elements: folding is projection-invariant because every
    reduction here is a full-array reduction), traced radius."""
    tiny = jnp.float32(1e-30)
    if l1_ratio == 0.0:
        norm2 = jnp.sum(v * v)
        scale = jnp.where(norm2 <= radius, 1.0,
                          jnp.sqrt(norm2 / jnp.maximum(radius, tiny)))
        out = jnp.where(radius > 0, v / scale, 0.0)
        return out

    if l1_ratio == 1.0:
        # Bracketed Newton on g(lam) = sum(relu(b - lam)) = r.
        # Plain left-started Newton visits breakpoint segments one at a
        # time and can need >10 iterations in the deep-shrinkage regime
        # (||b||_1 >> r: a rarely-used atom re-solved against a large
        # gradient), leaving lam up to ~2x short (measured on Gaussian/
        # heavy-tailed rows at s=1e4). Keeping a true bracket
        # [lo, hi] with g(lo) >= r >= g(hi) and stepping to
        # max(newton(lo), midpoint) halves the interval whenever the
        # tangent step stalls — bisection-rate worst case, Newton-rate
        # finish — at the same one (g, n_pos) evaluation per iteration.
        b = jnp.abs(v)
        norm = jnp.sum(b)
        m = float(np.prod(v.shape))
        # g(lam) >= ||b||_1 - m*lam  =>  g(lo0) >= r; g(hi0) = 0 <= r
        lo0 = jnp.maximum((norm - radius) / m, 0.0)
        hi0 = jnp.max(b)

        def eval_g(lam):
            t = b - lam
            pos = (t > 0).astype(jnp.float32)
            return jnp.sum(t * pos), jnp.maximum(jnp.sum(pos), 1.0)

        glo0, nlo0 = eval_g(lo0)
        # chord (secant) root as the initial upper bound: the chord
        # through (lo0, g(lo0)) and (hi0, 0) lies above the convex g,
        # so its crossing of r sits right of the root — usually FAR
        # tighter than max(b), which keeps the midpoint probes useful
        hi1 = jnp.clip(lo0 + (glo0 - radius) * (hi0 - lo0)
                       / jnp.maximum(glo0, tiny), lo0, hi0)

        def body(_, carry):
            lo, glo, nlo, hi = carry
            newton = lo + (glo - radius) / nlo      # <= root (convexity)
            t = jnp.clip(jnp.maximum(newton, 0.5 * (lo + hi)), lo, hi)
            g, n = eval_g(t)
            left = g >= radius                      # t still left of root
            # on rejection the secant through (lo, glo), (t, g) gives a
            # tighter valid upper bound than t itself
            sec = lo + (glo - radius) * (t - lo) / jnp.maximum(glo - g,
                                                               tiny)
            return (jnp.where(left, t, lo), jnp.where(left, g, glo),
                    jnp.where(left, n, nlo),
                    jnp.where(left, hi, jnp.minimum(t, sec)))

        lo, glo, nlo, _ = lax.fori_loop(
            0, NEWTON_ITERS, body, (lo0, glo0, nlo0, hi1))
        lam = jnp.maximum(lo + (glo - radius) / nlo, 0.0)
        w = jnp.maximum(b - lam, 0.0)
        # the final tangent step never overshoots lam*, so any residual
        # under-convergence is one-sided (||w||_1 > radius); a final
        # scale guarantees feasibility — exactly a no-op at convergence
        # — so the comp_norm budget bookkeeping can never go negative.
        norm_w = jnp.sum(w)
        scale = jnp.where(norm_w > radius,
                          radius / jnp.maximum(norm_w, tiny), 1.0)
        out = jnp.where(norm <= radius, v, jnp.sign(v) * w * scale)
        return jnp.where(radius > 0, out, jnp.zeros_like(v))

    gamma = 2.0 / l1_ratio - 2.0
    r = radius / l1_ratio
    b = jnp.abs(v)
    norm = jnp.sum(b * (1.0 + gamma / 2.0 * b))

    def scaled_norm(lam):
        w = jnp.maximum(b - lam, 0.0) / (1.0 + lam * gamma)
        return jnp.sum(w * (1.0 + gamma / 2.0 * w))

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        too_big = scaled_norm(mid) > r
        return jnp.where(too_big, mid, lo), jnp.where(too_big, hi, mid)

    lo, hi = lax.fori_loop(
        0, PROJ_ITERS, body,
        (jnp.zeros((), jnp.float32), jnp.max(b)))
    lam = 0.5 * (lo + hi)
    shrunk = jnp.sign(v) * jnp.maximum(b - lam, 0.0) / (1.0 + lam * gamma)
    out = jnp.where(norm <= r, v, shrunk)
    return jnp.where(radius > 0, out, jnp.zeros_like(v))


def _panel_kernel(Cs_ref, Cpan_ref, Ttile_ref, Rep_ref, G_blk_ref,
                  cn_in, D_in, D_out, cn_out, *, k, fold, comp_pos,
                  l1_ratio, p):
    """One grid step = one panel of ``p`` atoms (sequential grid).

    All bookkeeping lives in SSA *values* (registers / compiler-managed
    VMEM temporaries), not refs: per-atom ref reads/writes force Mosaic
    to serialize the unrolled loop on memory order, which measured at
    ~9 us/atom of pure overhead. Refs are touched once per panel, so
    the only serial chain left is the true data dependency:
    corr_in -> solve/project -> panel-row update.

    Memory plan (the round-4 redesign): D stays fully VMEM-resident and
    input/output-ALIASED (rows not written by any panel keep their
    input values — no upfront copy); the gradient block, the folded C
    rows, and the panel-inner C block are *streamed* per panel through
    BlockSpec pipelines. Halving the resident footprint doubles the row
    block the driver can hand one call (k <= 256), and fewer calls is
    the dominant win: ~0.5 ms of per-call machinery was measured per
    pallas_call at HCP shapes (docs/roofline_hcp.md round-4 table).
    """
    pid = pl.program_id(0)
    # D_in/D_out are aliased; rows a panel does not write keep their
    # input values. The explicit first-step copy makes that hold even
    # where the alias is simulated rather than physical (interpret
    # mode); on hardware it is one VMEM-to-itself copy per call.
    @pl.when(pid == 0)
    def _init():
        D_out[:] = D_in[:]
    j0 = pid * p
    C_pan = Cpan_ref[0]                               # (p, p) value
    # panel weights: W[a*fold + f, fold*i + g] = C[j0+a, i][f == g]
    # assembled from C's pre-repeated rows (streamed: this panel's p
    # rows only) with one tiny one-hot matmul (Rep) and the constant
    # fold-selector tile (Ttile)
    C_sub = Cs_ref[:]                                 # (p, fold*k)
    Rep = Rep_ref[:]
    W = jnp.dot(Rep, C_sub,
                preferred_element_type=jnp.float32,
                precision=lax.Precision.DEFAULT) * Ttile_ref[:]
    # Residual contributions of ALL k atoms for every atom in the
    # panel, in ONE full-height MXU contraction against the
    # in-place-updated D buffer: out-of-panel rows enter at their
    # delayed-update values (updated for already-visited panels,
    # original for the rest — exactly the right-looking recurrence
    # by telescoping), and in-panel rows enter at panel-entry
    # (original) values because D's panel rows are only written
    # at panel END — which is precisely what the per-atom re-add /
    # grouped maintenance below expects. DEFAULT (single-pass bf16)
    # MXU precision, pinned explicitly: the bf16 rounding of D rows
    # entering this contraction is the same noise class as the
    # block driver's own DEFAULT residual GEMM recompute, and ~6x
    # cheaper than HIGHEST in Mosaic. Objective-trajectory parity
    # vs the exact lax path is pinned on-device by
    # tests/test_tpu_quality (rel diff <= 1.4e-3 over masked/full
    # x l2/l1-ball fits). Pinning also keeps the kernel lowerable
    # when traced under jax.default_matmul_precision('high') (the
    # ops.precision context): Mosaic has no lowering for HIGH dots.
    if 'c8' in _ABLATE:
        c8 = jnp.zeros((p * fold, D_out.shape[1]), jnp.float32)
    else:
        c8 = jnp.dot(W, D_out[:],
                     preferred_element_type=jnp.float32,
                     precision=lax.Precision.DEFAULT)  # (p*fold, spp)
    G_pan = G_blk_ref[:]                              # (p*fold, spp)
    D_pan = D_out[pl.ds(fold * j0, fold * p), :]      # ORIGINAL rows
    # panel-entry cn rows: each row is written exactly once (by its
    # own atom, into the separate cn_out), so the pristine cn_in
    # slice is always the correct budget source — keeping the budget
    # reads off the per-atom solve's critical path
    cn_pan = cn_in[pl.ds(j0, p), :]                   # (p, 1)
    # panel-wide old norms, vectorized: lane-reduce each folded row,
    # then collapse each fold-group with the one-hot Rep columns
    if 'oldnorm' in _ABLATE:
        norms_old = jnp.ones((1, p), jnp.float32)
    else:
        av = jnp.abs(D_pan)
        lanered = jnp.sum(av * (l1_ratio + (1.0 - l1_ratio) * av),
                          axis=1, keepdims=True)      # (p*fold, 1)
        norms_old = jnp.sum(Rep * lanered, axis=0,
                            keepdims=True)            # (1, p)
    # panel residual, all k atoms' contributions at panel-entry
    # state (own rows included — re-added per atom below)
    R_pan = G_pan if 'rpan' in _ABLATE else G_pan - c8
    grouped = RANK1_MODE == 'grouped'
    if grouped:
        # per-atom residual rows as separate SSA values: atom a's
        # delta folds into a later atom g's row with ONE exact
        # scalar FMA R_list[g] -= C[g, a] * delta — no MXU tiling
        # matmul on the critical path, and only the (a+1)-th FMA is
        # serially needed; the rest overlap with the next solve
        R_list = [R_pan[g * fold:(g + 1) * fold, :]
                  for g in range(p)]
    else:
        # fold-tiler: Tp @ delta broadcasts a (fold, spp) row
        # update to every fold-group of the panel (Mosaic cannot
        # reshape/tile in-kernel; a K=fold matmul against
        # tile(eye(fold)) can)
        Tp = Ttile_ref[0:p * fold, 0:fold]
    new_rows = []
    new_cns = []

    for a in range(p):
        lo, hi = a * fold, (a + 1) * fold
        Dk = D_pan[lo:hi, :]             # own row, original state
        if 'atoms' in _ABLATE:           # perf attribution only:
            new_rows.append(Dk)          # skip the whole per-atom
            new_cns.append(cn_pan[a:a + 1, :])
            continue                     # solve/project/maintain
        # scalars from the panel-inner C block at STATIC indices (a
        # dynamic lane slice into C_sub would be slow in Mosaic)
        budget = jnp.sum(cn_pan[a:a + 1, 0:1]) + jnp.sum(
            norms_old[0:1, a:a + 1])                  # 0-d scalar
        Ckk = jnp.sum(C_pan[a:a + 1, a:a + 1])        # 0-d scalar
        good = Ckk > 1e-20
        # reciprocal off the critical path: the solve below becomes
        # a multiply (VPU divides are several times slower), and
        # Ckk/good/inv depend only on panel-entry values
        inv = 1.0 / jnp.where(good, Ckk, 1.0)
        # re-add own contribution (the residual carries it at the
        # original value: maintenance below only folds in OTHER
        # atoms' deltas before this row is read)
        Rk = (R_list[a] if grouped else R_pan[lo:hi, :]) + Ckk * Dk
        Dk_new = jnp.where(good, Rk * inv, Dk)
        if comp_pos:
            Dk_new = jnp.maximum(Dk_new, 0.0)
        if 'proj' not in _ABLATE:
            Dk_new = _project_rows(Dk_new, budget, l1_ratio)
        if 'norm' in _ABLATE:
            new_cn = budget
        else:
            new_cn = budget - _enet_norm_rows(Dk_new, l1_ratio)
        new_cns.append(jnp.reshape(new_cn, (1, 1)))
        new_rows.append(Dk_new)
        if a + 1 < p and 'maint' not in _ABLATE:
            if grouped:
                delta = Dk_new - Dk
                for g in range(a + 1, p):
                    cga = jnp.sum(C_pan[g:g + 1, a:a + 1])
                    R_list[g] = R_list[g] - cga * delta
            else:
                # rank-1 panel-residual maintenance: one pass over
                # (p*fold, spp) per atom; C[:, a] broadcast into the
                # folded-row layout with the one-hot Rep
                Ck_pan = jnp.dot(Rep, C_pan[:, a:a + 1],
                                 preferred_element_type=jnp.float32,
                                 precision=lax.Precision.DEFAULT)
                delta_t = jnp.dot(Tp, Dk_new - Dk,
                                  preferred_element_type=jnp.float32,
                                  precision=lax.Precision.DEFAULT)
                R_pan = R_pan - Ck_pan * delta_t
    if 'nowrite' not in _ABLATE:
        D_new_pan = (new_rows[0] if p == 1
                     else jnp.concatenate(new_rows, axis=0))
        D_out[pl.ds(fold * j0, fold * p), :] = D_new_pan
    cn_out[pl.ds(j0, p), :] = (new_cns[0] if p == 1
                               else jnp.concatenate(new_cns, axis=0))


@functools.partial(jax.jit,
                   static_argnames=("k", "fold", "comp_pos", "l1_ratio"))
def _bcd_update_ordered(D_subset, grad, C, cn2, k, fold, comp_pos,
                        l1_ratio):
    """Kernel invocation: atoms visited in row order 0..k-1.

    Folds rows sublane-major (outside the kernel, in XLA) so row-local
    work uses all 8 VPU sublanes; pads the atom count to a panel
    multiple (zero rows are exact fixed points of the update: zero
    gradient and C column, shrinkage/scaling of 0 is 0); runs the
    sequential panel grid; unfolds and slices back.
    """
    s = D_subset.shape[1]
    sp = -(-s // fold) * fold
    spp = sp // fold
    p = min(PANEL_ATOMS, k)
    kp = -(-k // p) * p
    if sp != s:
        # zero padding is a fixed point of the update: pad gradients are
        # zero, shrinkage/scaling of 0 is 0, norms are unaffected
        pad = ((0, 0), (0, sp - s))
        D_subset = jnp.pad(D_subset, pad)
        grad = jnp.pad(grad, pad)
    if kp != k:
        D_subset = jnp.pad(D_subset, ((0, kp - k), (0, 0)))
        grad = jnp.pad(grad, ((0, kp - k), (0, 0)))
        C = jnp.pad(C, ((0, kp - k), (0, kp - k)))
        cn2 = jnp.pad(cn2, ((0, kp - k), (0, 0)))
    D8 = D_subset.reshape(kp * fold, spp)
    G8 = grad.reshape(kp * fold, spp)
    # C row j in folded-lane layout: C_rep[j, fold*i + g] = C[j, i]
    C_rep = jnp.repeat(C, fold, axis=1) if fold > 1 else C
    n_pan = kp // p
    # per-panel inner C blocks (n_pan, p, p): per-atom scalars come
    # from here at static indices inside the kernel
    Cpan = jax.vmap(
        lambda o: lax.dynamic_slice(C, (o, o), (p, p)))(
            jnp.arange(n_pan, dtype=jnp.int32) * p)
    # fold-selector tile: Ttile[a*fold + f, fold*i + g] = [f == g]
    T = (jnp.tile(jnp.eye(fold, dtype=D8.dtype), (1, kp))
         if fold > 1 else jnp.ones((1, kp), D8.dtype))
    Ttile = jnp.tile(T, (p, 1))                     # (p*fold, fold*kp)
    # row-replicator one-hot: Rep[a*fold + f, a] = 1
    Rep = jnp.repeat(jnp.eye(p, dtype=D8.dtype), fold, axis=0)
    kern = functools.partial(_panel_kernel, k=kp, fold=fold,
                             comp_pos=comp_pos,
                             l1_ratio=float(l1_ratio), p=p)
    D_new, cn_new = pl.pallas_call(
        kern,
        grid=(n_pan,),
        in_specs=[
            pl.BlockSpec((p, fold * kp), lambda i: (i, 0)),   # C rows
            pl.BlockSpec((1, p, p), lambda i: (i, 0, 0)),     # C panel
            pl.BlockSpec(memory_space=pltpu.VMEM),            # Ttile
            pl.BlockSpec(memory_space=pltpu.VMEM),            # Rep
            pl.BlockSpec((p * fold, spp), lambda i: (i, 0)),  # G block
            pl.BlockSpec(memory_space=pltpu.VMEM),            # cn_in
            pl.BlockSpec(memory_space=pltpu.VMEM),            # D (alias)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kp * fold, spp), D8.dtype),
            jax.ShapeDtypeStruct((kp, 1), cn2.dtype),
        ],
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=INTERPRET,
    )(C_rep, Cpan, Ttile, Rep, G8, cn2, D8)
    D_new = D_new.reshape(kp, sp)[:k, :s]
    return D_new, cn_new[:k]


def bcd_update(D_subset, grad, C, comp_norm, order=None, comp_pos=False,
               l1_ratio=0.0):
    """Run the VMEM-resident BCD loop; returns (D_subset', comp_norm').

    D_subset (k, s) f32; ``grad`` (k, s) is the surrogate gradient
    B[:, subset] (the reference's ``gradient_``) — NOT the residual:
    the kernel reconstructs each atom's residual row on the fly from
    grad and the current D (delayed-update formulation, see module
    docstring), so callers skip the C @ D residual GEMM entirely. A
    block driver updating rows ``ob`` of a larger dictionary passes
    ``grad = B_blk - (C_rows * out_of_block_mask) @ D_full`` — the
    out-of-block contributions pre-subtracted, in-block ones left to
    the kernel. C (k, k), comp_norm (k,), order (k,) int32 atom visit
    order (None = row order); ``l1_ratio`` is the static
    dictionary-ball geometry (comp_l1_ratio). When ``order`` is given,
    rows are permuted into visit order outside the kernel and
    un-permuted after, so the kernel itself always walks rows 0..k-1.
    """
    k, s = D_subset.shape
    if order is not None:
        inv = jnp.argsort(order)
        D_subset = jnp.take(D_subset, order, axis=0)
        grad = jnp.take(grad, order, axis=0)
        C = jnp.take(jnp.take(C, order, axis=0), order, axis=1)
        comp_norm = jnp.take(comp_norm, order)
    fold = FOLD if s >= FOLD_MIN_S else 1
    D_new, cn_new = _bcd_update_ordered(
        D_subset, grad, C, comp_norm.reshape(k, 1), k, fold,
        bool(comp_pos), float(l1_ratio))
    cn_new = cn_new.reshape(k)
    if order is not None:
        D_new = jnp.take(D_new, inv, axis=0)
        cn_new = jnp.take(cn_new, inv)
    return D_new, cn_new


def bcd_update_l2(D_subset, grad, C, comp_norm, order, comp_pos=False):
    """Back-compat wrapper for the l2-ball case."""
    return bcd_update(D_subset, grad, C, comp_norm, order,
                      comp_pos=comp_pos, l1_ratio=0.0)
