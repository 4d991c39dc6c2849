"""Random feature-subset generation (the SOMF "reduction" trick).

Replaces ``modl/utils/randomkit/sampler.pyx`` (Mersenne-Twister + Cython
box shuffles) with two TPU-native pieces:

1. ``draw_subset`` - a *traced* fixed-size sampler usable inside a jitted
   step. State is ``(box, cursor, key)`` carried in the learner pytree:
   - ``replacement=True``: i.i.d. random cyclic *windows* of a lazily
     reshuffled permutation. The reference reshuffles the whole box per
     call (sampler.pyx:49-52) — on TPU that is an O(n log^2 n) bitonic
     sort of the full feature range every step, dominating the step at
     n ~ 2e5. Here each draw gathers ``len_subset`` elements at a
     uniformly random offset (O(s)), and the box is re-permuted once per
     ``n // len_subset`` draws so windows decorrelate across cycles.
     Per-feature visitation stays uniform (each feature lies in exactly
     ``len_subset`` of the n windows) and subsets never contain
     duplicates; the documented deviation is a small within-cycle
     co-occurrence correlation between features adjacent in the current
     permutation, which the per-cycle reshuffle bounds.
   - ``replacement=False``: cycle through the shuffled box so consecutive
     subsets partition the feature set; when fewer than ``len_subset``
     unseen features remain, the unseen tail is kept first (in order) and
     the already-seen head is reshuffled behind it (sampler.pyx:53-69).
     The tail-preserving reshuffle is expressed as a roll + keyed argsort
     so every branch is shape-static.

   TPU requires static shapes, so the *storage* of a subset has fixed
   size. The reference's two size modes (sampler.pyx:44-48) map to:

   - ``rand_size=False``: subsets of exactly ``len_subset = n //
     reduction`` features.
   - ``rand_size=True`` (the reference default): the *drawn* size is
     ``m ~ Binomial(n, 1/reduction)`` per draw, emulated under jit as a
     fixed ``len_max``-wide window plus the traced count ``m``
     (``draw_subset_sized``); consumers mask columns ``>= m`` to zero,
     which is algebraically a no-op in every downstream product and a
     fixed point of the dictionary update, so the effective subset has
     exactly the Binomial size. ``len_max`` caps the draw at
     mean + 8 std (P(exceed) < 1e-14; draws are clamped).

2. ``Sampler`` - a host-side, eager replica of the reference class
   (including ``rand_size``) for API parity and for host-driven
   pipelines. Backed by numpy Generator instead of randomkit MT19937;
   golden values differ, distributional properties match.
"""
import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["init_sampler_state", "draw_subset", "draw_subset_sized",
           "draw_window", "binomial_len_max", "Sampler"]


def draw_window(cursor, key, len_subset, n_features, replacement):
    """Window-mode draw (``SomfConfig.windowed``): features live in one
    fixed random order for the whole fit and a subset is the circular
    window ``[start, start + len_subset)`` of that order, so subset
    reads/writes are ``dynamic_slice``s instead of gathers (TPU gathers
    cost ~100x HBM bandwidth at these shapes). Returns
    ``(start, cursor', key')``.

    - replacement=True: ``start ~ Uniform[0, n)`` - circularity makes
      per-feature inclusion exactly uniform at 1/reduction.
    - replacement=False: ``start = cursor``, advancing by ``len_subset``
      (the reference's cycling partition, sampler.pyx:49-52, with a
      fixed box: consecutive windows tile the feature circle).
    """
    k_draw, k_next = jax.random.split(key)
    if replacement:
        start = jax.random.randint(k_draw, (), 0, n_features, jnp.int32)
        return start, cursor, k_next
    start = (cursor % n_features).astype(jnp.int32)
    new_cursor = ((cursor + len_subset) % n_features).astype(jnp.int32)
    return start, new_cursor, k_next


def draw_window_sized(cursor, key, len_subset, len_max, n_features,
                      replacement):
    """Window-mode draw with Binomial subset sizes (``rand_size=True``,
    sampler.pyx:44-47): the window has static width ``len_max`` and only
    the first ``m ~ Binomial(n, len_subset/n)`` columns are live (the
    caller zero-masks the rest, exactly as in ``draw_subset_sized``).
    Returns ``(start, m, cursor', key')``; the cycling cursor advances
    by the *drawn* size like the reference."""
    k_size, k_draw, k_next = jax.random.split(key, 3)
    p = len_subset / n_features
    m = jax.random.binomial(k_size, n=float(n_features), p=p)
    m = jnp.clip(m.astype(jnp.int32), 1, len_max)
    if replacement:
        start = jax.random.randint(k_draw, (), 0, n_features, jnp.int32)
        return start, m, cursor, k_next
    start = (cursor % n_features).astype(jnp.int32)
    return start, m, ((cursor + m) % n_features).astype(jnp.int32), k_next


def binomial_len_max(n_features, len_subset):
    """Static storage width for Binomial(n, len_subset/n) draws:
    mean + 8 std, clamped to the feature count."""
    import math
    p = len_subset / max(n_features, 1)
    std = math.sqrt(max(n_features * p * (1.0 - p), 0.0))
    return int(min(n_features, math.ceil(len_subset + 8.0 * std)))


def init_sampler_state(n_features, seed_key):
    """Initial (box, cursor) for the traced sampler: a shuffled arange.

    Mirrors sampler.pyx:34-39 (permutation then an extra shuffle).
    """
    box = jax.random.permutation(seed_key, n_features).astype(jnp.int32)
    return box, jnp.int32(0)


def draw_subset(box, cursor, key, len_subset, replacement):
    """Draw the next feature subset; returns (subset, box, cursor, key).

    ``len_subset`` and ``replacement`` are static; everything else traced.
    """
    n = box.shape[0]
    k_draw, k_next = jax.random.split(key)

    if replacement:
        # cursor counts draws since the last reshuffle of the box
        k_perm, k_off = jax.random.split(k_draw)
        draws_per_cycle = max(n // len_subset, 1)
        box = jax.lax.cond(
            cursor >= draws_per_cycle,
            lambda b: jax.random.permutation(k_perm, b),
            lambda b: b,
            box)
        cursor = jnp.where(cursor >= draws_per_cycle, 0, cursor)
        offset = jax.random.randint(k_off, (), 0, n)
        # wraparound window as one contiguous slice of the doubled box
        # (keeps per-feature inclusion exactly uniform; cheaper than a
        # modulo gather)
        wrapped = jnp.concatenate([box, box[:len_subset]])
        subset = jax.lax.dynamic_slice(wrapped, (offset,), (len_subset,))
        return subset, box, (cursor + 1).astype(jnp.int32), k_next

    remainder = n - cursor
    needs_reshuffle = remainder < len_subset

    # Reshuffled box: unseen tail first (original order), the
    # already-seen head randomly permuted behind it. A keyed argsort makes
    # this shape-static: negative ascending keys pin the tail, uniform
    # keys shuffle the rest. The O(n log n) sort runs only once per cycle
    # (~every reduction steps): lax.cond executes a single branch on TPU,
    # so the common no-reshuffle step costs one dynamic slice.
    def reshuffle(operands):
        box, cursor = operands
        rolled = jnp.roll(box, -cursor)
        idx = jnp.arange(n)
        rand = jax.random.uniform(k_draw, (n,))
        rem = (n - cursor).astype(idx.dtype)
        sort_key = jnp.where(idx < rem, idx.astype(rand.dtype) - n, rand)
        return rolled[jnp.argsort(sort_key)], jnp.int32(0)

    def keep(operands):
        box, cursor = operands
        return box, cursor

    box, start = jax.lax.cond(needs_reshuffle, reshuffle, keep,
                              (box, cursor))
    subset = jax.lax.dynamic_slice(box, (start,), (len_subset,))
    cursor = (start + len_subset).astype(jnp.int32)
    return subset, box, cursor, k_next


def draw_subset_sized(box, cursor, key, len_subset, len_max, replacement):
    """Binomial-size subset draw (``rand_size=True``, sampler.pyx:44-47).

    Returns ``(subset, m, box, cursor, key)`` where ``subset`` has the
    static width ``len_max`` and only the first ``m`` entries (traced,
    ``m ~ Binomial(n, len_subset/n)`` clamped to ``[1, len_max]``) form
    the drawn subset; callers zero-mask columns ``>= m``. Window
    mechanics mirror ``draw_subset``: uniform-offset wraparound windows
    of a lazily reshuffled box (replacement) or the cycling partition
    with the tail-preserving reshuffle (without replacement, where the
    cursor advances by the *drawn* size, exactly like the reference's
    ``lim_sup = lim_inf + len_subset``).
    """
    n = box.shape[0]
    k_size, k_draw, k_next = jax.random.split(key, 3)
    p = len_subset / n
    m = jax.random.binomial(k_size, n=float(n), p=p)
    m = jnp.clip(m.astype(jnp.int32), 1, len_max)

    if replacement:
        k_perm, k_off = jax.random.split(k_draw)
        draws_per_cycle = max(n // len_subset, 1)
        box = jax.lax.cond(
            cursor >= draws_per_cycle,
            lambda b: jax.random.permutation(k_perm, b),
            lambda b: b,
            box)
        cursor = jnp.where(cursor >= draws_per_cycle, 0, cursor)
        offset = jax.random.randint(k_off, (), 0, n)
        wrapped = jnp.concatenate([box, box[:len_max]])
        subset = jax.lax.dynamic_slice(wrapped, (offset,), (len_max,))
        return subset, m, box, (cursor + 1).astype(jnp.int32), k_next

    remainder = n - cursor
    needs_reshuffle = remainder < m

    def reshuffle(operands):
        box, cursor = operands
        rolled = jnp.roll(box, -cursor)
        idx = jnp.arange(n)
        rand = jax.random.uniform(k_draw, (n,))
        rem = (n - cursor).astype(idx.dtype)
        sort_key = jnp.where(idx < rem, idx.astype(rand.dtype) - n, rand)
        return rolled[jnp.argsort(sort_key)], jnp.int32(0)

    box, start = jax.lax.cond(needs_reshuffle, reshuffle,
                              lambda o: o, (box, cursor))
    wrapped = jnp.concatenate([box, box[:len_max]])
    subset = jax.lax.dynamic_slice(wrapped, (start,), (len_max,))
    cursor = (start + m).astype(jnp.int32)
    return subset, m, box, cursor, k_next


class Sampler:
    """Host-side eager sampler, API-compatible with the reference class.

    Parameters mirror ``sampler.pyx:10-39``: ``range_`` (number of
    features), ``rand_size`` (Binomial subset sizes), ``replacement``
    (reshuffle per call vs cycling partition), ``random_seed``.

    The cycling state is expressed as (feature order, consumed-prefix
    cursor) — the same formulation as the traced sampler above — rather
    than the reference's in-place box swaps; the emitted subset
    sequences satisfy the identical contracts (each draw is disjoint
    from the cycle's previous draws; a partial tail at a cycle boundary
    is served first, in order, before the refilled pool).
    """

    def __init__(self, range_, rand_size=True, replacement=True,
                 random_seed=None):
        self.range = int(range_)
        self.rand_size = bool(rand_size)
        self.replacement = bool(replacement)
        self.random_state = np.random.RandomState(random_seed)
        self.box = self.random_state.permutation(self.range)
        self.cursor = 0  # features before the cursor were already served

    def _draw_size(self, reduction):
        if self.rand_size:
            return int(self.random_state.binomial(self.range,
                                                  1.0 / reduction))
        return int(self.range / reduction)

    def yield_subset(self, reduction):
        n = self.range
        m = self._draw_size(reduction)
        if self.replacement or m >= n:
            # i.i.d. draws: a fresh order every call, take its prefix
            self.box = self.random_state.permutation(self.box)
            self.cursor = min(m, n)
            return self.box[:self.cursor].copy()
        left = n - self.cursor
        if left == 0:
            # cycle exhausted exactly: refill with a full reshuffle
            self.box = self.random_state.permutation(self.box)
            self.cursor = 0
        elif left < m:
            # cycle boundary mid-draw: the not-yet-served tail moves to
            # the front (order preserved) and the served part is
            # reshuffled behind it (sampler.pyx:59-64 semantics)
            served = self.random_state.permutation(self.box[:self.cursor])
            self.box = np.concatenate([self.box[self.cursor:], served])
            self.cursor = 0
        out = self.box[self.cursor:self.cursor + m].copy()
        self.cursor += m
        return out
