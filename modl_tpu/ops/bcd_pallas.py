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
- l1 ball (``== 1``, the fMRI path): Newton iteration on the monotone
  piecewise-linear KKT equation g(lam) = sum(relu(|v|-lam)) = r,
  warm-started at the mean-shrinkage lower bound. Started left of the
  root, Newton on a convex decreasing piecewise-linear function
  converges monotonically and finitely (Condat-style); NEWTON_ITERS=10
  with the warm start is f32-exact in practice and beats bisection's
  fixed 40-step dependent-reduction chain ~4x;
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

# VMEM budget for the resident D + R buffers (bytes); beyond this fall
# back to lax / smaller row blocks. Headroom above it (v5e has ~16 MB)
# absorbs the C_rep/T constants and the rank-1 matmul temporary.
VMEM_BUDGET = 11 * 1024 * 1024

# sublane folding factor for row-local work (VPU tile is 8 sublanes)
FOLD = 8
# fold only when rows are wide enough for the relayout to pay off
FOLD_MIN_S = 2048

# Newton steps for the l1-ball threshold: warm-started at the
# mean-shrinkage bound, ~4 suffice in practice; 6 leaves margin, and
# under-convergence is made feasible by the safeguard scale below (the
# Newton chain sits on the kernel's per-atom critical path, ~0.2 us per
# iteration, so the 10 -> 6 trim is a measurable win at k ~ 1000)
NEWTON_ITERS = 6
# bisection steps for the general enet-ball threshold
PROJ_ITERS = 30
# fully unroll the kernel's atom loop (Mosaic supports only unroll=1 or
# unroll=num_steps): the loop is sequential through D, but unrolling
# removes per-iteration loop overhead and lets Mosaic pipeline the
# independent per-atom slice/extract ops across consecutive atoms
FULL_UNROLL = True


def supported(k, s, dtype, comp_l1_ratio):
    """Whether the Pallas kernel covers this configuration."""
    del comp_l1_ratio  # all geometries are covered
    if jnp.dtype(dtype) != jnp.float32:
        return False
    # resident buffers: D + grad (k x s each), C_rep (k x FOLD k), cn
    vmem_bytes = (2 * k * s + FOLD * k * k + 8 * k) * 4
    if vmem_bytes > VMEM_BUDGET:
        return False
    return True


def max_block(k_total, s, dtype):
    """Largest row-block size the kernel supports at subset width s."""
    if jnp.dtype(dtype) != jnp.float32:
        return 0
    bs = 128
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
        # Newton on g(lam) = sum(relu(b - lam)), warm-started at the
        # mean-shrinkage bound lam0 = (||b||_1 - r)/m: since
        # g(lam) >= ||b||_1 - m lam, g(lam0) >= r, so lam0 sits left of
        # the root and Newton stays monotone and finitely convergent on
        # the piecewise-linear g (each dependent-reduction iteration in
        # VMEM costs ~0.25 us/atom, so the warm start buys real time).
        b = jnp.abs(v)
        norm = jnp.sum(b)
        m = float(np.prod(v.shape))
        lam0 = jnp.maximum((norm - radius) / m, 0.0)

        def body(_, lam):
            t = b - lam
            pos = (t > 0).astype(jnp.float32)
            g = jnp.sum(t * pos)
            n_pos = jnp.maximum(jnp.sum(pos), 1.0)
            return jnp.maximum(lam + (g - radius) / n_pos, 0.0)

        lam = lax.fori_loop(0, NEWTON_ITERS, body, lam0)
        w = jnp.maximum(b - lam, 0.0)
        # Newton from the left never overshoots lam*, so the only
        # failure mode of a capped iteration count is one-sided:
        # lam < lam* and ||w||_1 > radius (conceivable for adversarial
        # rows whose breakpoint count exceeds NEWTON_ITERS). A final
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


def _kernel(C_rep_ref, Cd_ref, T_ref, D_in, G_in, cn_in, D_out,
            cn_out, *, k, fold, comp_pos, l1_ratio):
    # operate in place on the aliased outputs
    D_out[:] = D_in[:]
    cn_out[:] = cn_in[:]

    def body(j, carry):
        Dk = D_out[pl.ds(fold * j, fold), :]              # (fold, spp)
        norm_old = _enet_norm_rows(Dk, l1_ratio)
        budget = jnp.sum(cn_out[pl.ds(j, 1), :]) + norm_old
        # contraction weights: C row j lifted into the folded layout.
        # Dynamic *sublane* slices are cheap in Mosaic (lane slices are
        # not), so C is passed pre-repeated along lanes and row j is one
        # ds(); the constant fold-selector T routes each folded sublane
        # to its own fold-offset rows.
        Cj = C_rep_ref[pl.ds(j, 1), :]                    # (1, fold*k)
        W = T_ref[:] * Cj                                 # (fold, fold*k)
        # The single O(k*s) op per atom: residual-row reconstruction
        # against the in-place-updated D buffer (delayed-update BCD).
        # DEFAULT (single-pass bf16) MXU precision, pinned explicitly:
        # the bf16 rounding of D rows entering this contraction is the
        # same noise class as the block driver's own DEFAULT residual
        # GEMM recompute, and ~6x cheaper than HIGHEST in Mosaic (0.79
        # vs 1.94 ms/block on v5e). Objective-trajectory parity vs the
        # exact lax path is pinned on-device by tests/test_tpu_quality
        # (rel diff <= 1.4e-3 over masked/full x l2/l1-ball fits).
        # Pinning also keeps the kernel lowerable when traced under
        # jax.default_matmul_precision('high') (the ops.precision
        # context): Mosaic has no lowering for HIGH dots.
        corr = jnp.dot(W, D_out[:],
                       preferred_element_type=jnp.float32,
                       precision=lax.Precision.DEFAULT)   # (fold, spp)
        Ckk = jnp.sum(Cd_ref[pl.ds(j, 1), :])
        # corr counts atom j's own (not yet updated) row; adding it back
        # yields exactly the right-looking "re-add own contribution" row
        Rk = G_in[pl.ds(fold * j, fold), :] - corr + Ckk * Dk
        good = Ckk > 1e-20
        Dk_new = jnp.where(good, Rk / jnp.where(good, Ckk, 1.0), Dk)
        if comp_pos:
            Dk_new = jnp.maximum(Dk_new, 0.0)
        Dk_new = _project_rows(Dk_new, budget, l1_ratio)
        new_cn = budget - _enet_norm_rows(Dk_new, l1_ratio)
        cn_out[pl.ds(j, 1), :] = new_cn.reshape(1, 1)
        D_out[pl.ds(fold * j, fold), :] = Dk_new
        return carry

    lax.fori_loop(0, k, body, 0, unroll=k if FULL_UNROLL else None)


@functools.partial(jax.jit,
                   static_argnames=("k", "fold", "comp_pos", "l1_ratio"))
def _bcd_update_ordered(D_subset, grad, C, cn2, k, fold, comp_pos,
                        l1_ratio):
    """Kernel invocation: atoms visited in row order 0..k-1.

    Folds rows sublane-major (outside the kernel, in XLA) so row-local
    work uses all 8 VPU sublanes, runs the kernel, unfolds.
    """
    s = D_subset.shape[1]
    sp = -(-s // fold) * fold
    spp = sp // fold
    if sp != s:
        # zero padding is a fixed point of the update: pad gradients are
        # zero, shrinkage/scaling of 0 is 0, norms are unaffected
        pad = ((0, 0), (0, sp - s))
        D_subset = jnp.pad(D_subset, pad)
        grad = jnp.pad(grad, pad)
    D8 = D_subset.reshape(k * fold, spp)
    G8 = grad.reshape(k * fold, spp)
    # C row j in folded-lane layout: C_rep[j, fold*i + g] = C[j, i]
    C_rep = jnp.repeat(C, fold, axis=1) if fold > 1 else C
    Cdiag = jnp.diagonal(C).reshape(k, 1)
    # fold-selector: T[f, fold*i + g] = [f == g]
    T = (jnp.tile(jnp.eye(fold, dtype=D8.dtype), (1, k))
         if fold > 1 else jnp.ones((1, k), D8.dtype))
    kern = functools.partial(_kernel, k=k, fold=fold, comp_pos=comp_pos,
                             l1_ratio=float(l1_ratio))
    D_new, cn_new = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((k * fold, spp), D8.dtype),
            jax.ShapeDtypeStruct((k, 1), cn2.dtype),
        ],
        input_output_aliases={3: 0, 5: 1},
        interpret=INTERPRET,
    )(C_rep, Cdiag, T, D8, G8, cn2)
    return D_new.reshape(k, sp)[:, :s], cn_new


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
