"""Pallas TPU kernel for the block-coordinate-descent dictionary update.

The BCD loop (dict_fact.py:672-694) is sequential over atoms; each
iteration does two rank-1 residual updates on the (k, s) residual matrix
R plus a row solve + ball projection. Done in XLA HLO, every iteration
round-trips R through HBM (~2 k*s*4 bytes per atom -> ~1.3 GB/batch in
the ADHD-70 config). This kernel keeps D_subset and R resident in VMEM
for the whole loop: HBM sees exactly one read and one write of each.

Two constraint geometries are covered (static ``comp_l1_ratio``):

- l2 ball (``== 0``, default for DictFact/ImageDictFact): closed-form
  norm scaling (enet.pyx:62-70);
- general elastic-net / l1 ball (``> 0``, the fMRI path): the exact
  pivot threshold needs a sort; in VMEM a fixed-count bisection on the
  monotone KKT equation reaches 2^-40 relative precision with pure VPU
  reductions and no data movement, so it replaces the sort here.

Scope limits: float32 and ``2 k s * 4`` bytes within the VMEM budget;
float64 and larger shapes fall back to the lax path
(`modl_tpu/decomposition/_step.py::_update_dict`).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# flipped to True by tests to run the kernel in interpreter mode on CPU
INTERPRET = False

# VMEM budget for D_subset + R (bytes); beyond this fall back to lax.
VMEM_BUDGET = 11 * 1024 * 1024

# bisection steps for the enet-ball threshold (f32-exact at 40)
PROJ_ITERS = 40


def supported(k, s, dtype, comp_l1_ratio):
    """Whether the Pallas kernel covers this configuration."""
    del comp_l1_ratio  # both geometries are covered
    if jnp.dtype(dtype) != jnp.float32:
        return False
    # resident buffers: D + R (k x s each), C (k x k), diag/cn/onehot
    vmem_bytes = (2 * k * s + k * k + 4 * k) * 4
    if vmem_bytes > VMEM_BUDGET:
        return False
    return True


def _enet_norm_row(v, l1_ratio):
    a = jnp.abs(v)
    return jnp.sum(a * (l1_ratio + (1.0 - l1_ratio) * a))


def _project_row(v, radius, l1_ratio):
    """Elastic-net-ball projection of a (1, s) row, traced radius.

    l2: closed form. l1/enet: bisection on the shrinkage threshold
    (monotone; see ops/enet.py::enet_projection_bisect)."""
    tiny = jnp.float32(1e-30)
    if l1_ratio == 0.0:
        norm2 = jnp.sum(v * v)
        scale = jnp.where(norm2 <= radius, 1.0,
                          jnp.sqrt(norm2 / jnp.maximum(radius, tiny)))
        out = jnp.where(radius > 0, v / scale, 0.0)
        return out

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

    lo, hi = jax.lax.fori_loop(
        0, PROJ_ITERS, body,
        (jnp.zeros((), jnp.float32), jnp.max(b)))
    lam = 0.5 * (lo + hi)
    shrunk = jnp.sign(v) * jnp.maximum(b - lam, 0.0) / (1.0 + lam * gamma)
    out = jnp.where(norm <= r, v, shrunk)
    return jnp.where(radius > 0, out, jnp.zeros_like(v))


def _kernel(order_ref, C_ref, Cdiag_ref, D_in, R_in, cn_in, D_out, R_out,
            cn_out, *, k, comp_pos, l1_ratio):
    # operate in place on the aliased outputs
    D_out[:] = D_in[:]
    R_out[:] = R_in[:]
    cn_out[:] = cn_in[:]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)  # (k, 1)

    # Dynamic row indexing compiles pathologically in Mosaic; one-hot
    # select/merge keeps every op static-shape over the whole (k, s)
    # VMEM-resident buffers (a few extra full passes, all VPU).
    def body(j, carry):
        kk = order_ref[j]
        onehot = (row_ids == kk).astype(jnp.float32)          # (k, 1)
        D_all = D_out[:]
        Dk = jnp.sum(D_all * onehot, axis=0, keepdims=True)   # (1, s)
        norm_old = _enet_norm_row(Dk, l1_ratio)
        cn_all = cn_out[:]                                    # (k, 1)
        budget = jnp.sum(cn_all * onehot) + norm_old
        Ck = jnp.sum(C_ref[:] * onehot, axis=0, keepdims=True)  # (1, k)
        Ckk = jnp.sum(Cdiag_ref[:] * onehot)
        # the post-"re-add own contribution" residual row is derivable
        # from the maintained residual without materialising it:
        # Rk = R[kk] + Ckk * Dk  (fuses the two rank-1 passes into one)
        Rk = jnp.sum(R_out[:] * onehot, axis=0, keepdims=True) + Ckk * Dk
        good = Ckk > 1e-20
        Dk_new = jnp.where(good, Rk / jnp.where(good, Ckk, 1.0), Dk)
        if comp_pos:
            Dk_new = jnp.maximum(Dk_new, 0.0)
        Dk_new = _project_row(Dk_new, budget, l1_ratio)
        new_cn = budget - _enet_norm_row(Dk_new, l1_ratio)
        cn_out[:] = cn_all * (1.0 - onehot) + new_cn * onehot
        R_out[:] = R_out[:] - Ck.T * (Dk_new - Dk)
        D_out[:] = D_all * (1.0 - onehot) + onehot * Dk_new
        return carry

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("comp_pos", "l1_ratio"))
def bcd_update(D_subset, R, C, comp_norm, order, comp_pos=False,
               l1_ratio=0.0):
    """Run the VMEM-resident BCD loop; returns (D_subset', comp_norm').

    D_subset (k, s) f32, R (k, s) = grad - C @ D_subset, C (k, k),
    comp_norm (k,), order (k,) int32 atom visit order; ``l1_ratio`` is
    the static dictionary-ball geometry (comp_l1_ratio).
    """
    k, s = D_subset.shape
    cn2 = comp_norm.reshape(k, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # C
            pl.BlockSpec(memory_space=pltpu.VMEM),   # diag(C)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # D
            pl.BlockSpec(memory_space=pltpu.VMEM),   # R
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cn
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(_kernel, k=k, comp_pos=comp_pos,
                             l1_ratio=float(l1_ratio))
    D_new, _, cn_new = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k, s), D_subset.dtype),
            jax.ShapeDtypeStruct((k, s), R.dtype),
            jax.ShapeDtypeStruct((k, 1), comp_norm.dtype),
        ],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=INTERPRET,
    )(order.astype(jnp.int32), C, jnp.diagonal(C).reshape(k, 1),
      D_subset, R, cn2)
    return D_new, cn_new.reshape(k)


def bcd_update_l2(D_subset, R, C, comp_norm, order, comp_pos=False):
    """Back-compat wrapper for the l2-ball case."""
    return bcd_update(D_subset, R, C, comp_norm, order, comp_pos=comp_pos,
                      l1_ratio=0.0)
