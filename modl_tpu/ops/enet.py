"""Elastic-net ball geometry, TPU-native.

Replaces the reference Cython kernels (``modl/utils/math/enet.pyx:38-168``)
with batched, vectorised jax.numpy implementations:

- ``enet_norm``       <- enet.pyx:125-148 (sum |v| (l1r + (1-l1r)|v|))
- ``enet_scale``      <- enet.pyx:150-168 (closed-form scaling onto the ball)
- ``enet_projection`` <- enet.pyx:38-122. The reference uses a sequential
  Lobato-quicksort pivot search; on TPU an O(m log m) descending sort +
  cumulative sums finds the same support size ``rho`` and threshold ``l``
  (the closed-form threshold of enet.pyx:113-121 is kept verbatim), which
  vectorises over atoms with ``vmap`` and maps onto the VPU.

All functions are jit-safe: ``l1_ratio`` is treated as a static Python
float (it selects the code path at trace time), while ``radius`` may be a
traced scalar.
"""
import jax
import jax.numpy as jnp

__all__ = ["enet_norm", "enet_scale", "enet_projection", "enet_projection_batch"]


def enet_norm(v, l1_ratio, axis=-1):
    """Elastic-net norm ``sum_i |v_i| (l1_ratio + (1 - l1_ratio) |v_i|)``.

    Mirrors ``enet.pyx:125-148``. Works on batched inputs along ``axis``.
    """
    a = jnp.abs(v)
    return jnp.sum(a * (l1_ratio + (1.0 - l1_ratio) * a), axis=axis)


def enet_scale(v, l1_ratio, radius=1.0, axis=-1):
    """Scale ``v`` so that its elastic-net norm equals ``radius``.

    Closed form of ``enet.pyx:150-168``: find S >= 0 with
    ``l1_ratio * S * ||v||_1 + (1 - l1_ratio) * S^2 * ||v||_2^2 = radius``.
    Returns ``v * S``. A zero vector maps to itself.
    """
    l1 = jnp.sum(jnp.abs(v), axis=axis, keepdims=True) * l1_ratio
    l2 = jnp.sum(v * v, axis=axis, keepdims=True) * (1.0 - l1_ratio)
    safe_l2 = jnp.where(l2 != 0, l2, 1.0)
    safe_l1 = jnp.where(l1 != 0, l1, 1.0)
    s_quad = (-l1 + jnp.sqrt(l1 * l1 + 4.0 * radius * safe_l2)) / (2.0 * safe_l2)
    s_lin = radius / safe_l1
    S = jnp.where(l2 != 0, s_quad, jnp.where(l1 != 0, s_lin, 0.0))
    return v * S


def _enet_projection_vec(v, radius, l1_ratio):
    """Project one vector on the elastic-net ball of a (traced) radius.

    Sort-based equivalent of the pivot algorithm in ``enet.pyx:38-122``.
    ``l1_ratio`` must be a static Python float.
    """
    m = v.shape[0]
    dtype = v.dtype
    radius = jnp.asarray(radius, dtype)

    if l1_ratio == 0.0:
        # Pure l2-ball projection (enet.pyx:62-70)
        norm2 = jnp.sum(v * v)
        scale = jnp.where(norm2 <= radius, 1.0, jnp.sqrt(norm2 / jnp.maximum(radius, jnp.finfo(dtype).tiny)))
        out = v / scale
        return jnp.where(radius > 0, out, jnp.zeros_like(v))

    gamma = 2.0 / l1_ratio - 2.0
    r = radius / l1_ratio
    b = jnp.abs(v)
    norm = jnp.sum(b * (1.0 + gamma / 2.0 * b))

    # Threshold search on the sorted magnitudes: rho = |{j : b_(j) above
    # threshold}|; the predicate below is the pivot-inclusion test of
    # enet.pyx:100-101 evaluated at every sorted prefix.
    bs = jnp.sort(b)[::-1]
    terms = bs * (1.0 + gamma / 2.0 * bs)
    s_cum = jnp.cumsum(terms)
    j = jnp.arange(1, m + 1, dtype=dtype)
    cond = s_cum - j * (1.0 + gamma / 2.0 * bs) * bs < r * (1.0 + gamma * bs) ** 2
    rho = jnp.sum(cond.astype(dtype))
    s = jnp.sum(jnp.where(cond, terms, 0.0))

    if gamma != 0.0:  # l1_ratio < 1 (true elastic-net ball), enet.pyx:113-117
        a = gamma ** 2 * r + gamma * rho * 0.5
        d = 2.0 * r * gamma + rho
        c = r - s
        disc = jnp.maximum(d * d - 4.0 * a * c, 0.0)
        lam = (-d + jnp.sqrt(disc)) / (2.0 * a)
    else:  # pure l1 ball, enet.pyx:119
        lam = (s - r) / jnp.maximum(rho, 1.0)

    shrunk = jnp.sign(v) * jnp.maximum(b - lam, 0.0) / (1.0 + lam * gamma)
    out = jnp.where(norm <= r, v, shrunk)
    return jnp.where(radius > 0, out, jnp.zeros_like(v))


def enet_projection(v, radius, l1_ratio):
    """Projection of ``v`` (1-D) on the elastic-net ball of given radius.

    ``radius`` may be traced; ``l1_ratio`` must be static.
    Matches ``enet_projection`` in ``enet.pyx:38-122``.
    """
    return _enet_projection_vec(v, radius, l1_ratio)


def enet_projection_bisect(v, radius, l1_ratio, n_iter=40):
    """Sort-free elastic-net ball projection via bisection on the
    shrinkage threshold.

    The exact sort-based projection costs an O(m log^2 m) bitonic sort
    per call on TPU; inside the sequential BCD loop (one projection per
    atom per step, dict_fact.py:686-689) that sort dominates. The KKT
    threshold ``lam`` satisfies the monotone scalar equation
    ``norm(w(lam)) = radius`` with
    ``w(lam) = sign(v) max(|v|-lam, 0) / (1 + lam gamma)``, so ``n_iter``
    bisection steps of masked reductions reach ~2^-40 relative precision.

    Measured on TPU v5e the 40 sequential reductions LOSE to the single
    bitonic sort (7.7 vs 5.1 ms/batch in the ADHD-70 config), so the BCD
    hot path uses the exact ``enet_projection``; this variant is kept for
    very long rows where an O(m) pass beats an O(m log^2 m) sort.
    """
    dtype = v.dtype
    radius = jnp.asarray(radius, dtype)

    if l1_ratio == 0.0:
        return _enet_projection_vec(v, radius, l1_ratio)

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

    lo0 = jnp.zeros((), dtype)
    hi0 = jnp.max(b)
    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo0, hi0))
    lam = 0.5 * (lo + hi)
    shrunk = jnp.sign(v) * jnp.maximum(b - lam, 0.0) / (1.0 + lam * gamma)
    out = jnp.where(norm <= r, v, shrunk)
    return jnp.where(radius > 0, out, jnp.zeros_like(v))


def enet_projection_batch(V, radii, l1_ratio):
    """Row-wise projection of a (k, m) matrix with per-row radii (k,)."""
    return jax.vmap(lambda v, r: _enet_projection_vec(v, r, l1_ratio))(V, radii)
