"""Property tests for the host RandomState utility.

Port of the reference's golden-value RNG tests
(modl/utils/randomkit/tests/test_random.py:11-47) with the goldens
replaced by distribution/structure properties — the bit stream is
PCG64, not MT19937 (SURVEY.md §4.2).
"""
import pickle

import numpy as np
import pytest

from modl_tpu.utils.random import RandomState


def test_randint_bounds_and_mean():
    rng = RandomState(0)
    draws = np.array([rng.randint(10) for _ in range(10000)])
    # rk_interval semantics: inclusive upper bound.
    assert draws.min() == 0
    assert draws.max() == 10
    assert abs(draws.mean() - 5.0) < 0.1


def test_permutation_is_permutation():
    rng = RandomState(42)
    perm = rng.permutation(137)
    assert np.array_equal(np.sort(perm), np.arange(137))
    # Not the identity (probability ~1/137!).
    assert not np.array_equal(perm, np.arange(137))


def test_shuffle_1d_preserves_multiset():
    rng = RandomState(1)
    x = np.arange(50) * 3
    orig = x.copy()
    rng.shuffle(x)
    assert np.array_equal(np.sort(x), np.sort(orig))
    assert not np.array_equal(x, orig)


def test_shuffle_2d_row_shuffle():
    rng = RandomState(2)
    x = np.arange(60, dtype=float).reshape(20, 3)
    orig = x.copy()
    rng.shuffle(x)
    # Rows move as units (reference random_fast.pyx:113-125).
    row_sets = {tuple(r) for r in x}
    assert row_sets == {tuple(r) for r in orig}
    assert not np.array_equal(x, orig)


def test_shuffle_list():
    rng = RandomState(3)
    x = list(range(30))
    rng.shuffle(x)
    assert sorted(x) == list(range(30))


def test_shuffle_with_trace_identity():
    """shuffled[i] == original[trace[i]] for every co-shuffled array."""
    rng = RandomState(7)
    a = np.arange(40, dtype=np.int64)
    b = np.arange(40, dtype=float)[:, None] * np.ones((1, 5))
    a0, b0 = a.copy(), b.copy()
    trace = rng.shuffle_with_trace([a, b])
    assert np.array_equal(a, a0[trace])
    assert np.array_equal(b, b0[trace])
    assert np.array_equal(np.sort(trace), np.arange(40))


def test_shuffle_with_trace_shared_permutation():
    """All arrays in the list receive the SAME permutation."""
    rng = RandomState(11)
    a = np.arange(25)
    b = np.arange(25)
    rng.shuffle_with_trace([a, b])
    assert np.array_equal(a, b)


def test_shuffle_with_trace_mismatched_lengths():
    rng = RandomState(0)
    with pytest.raises(ValueError):
        rng.shuffle_with_trace([np.arange(5), np.arange(6)])


def test_external_swap_replays_permutation():
    """shuffle(x, swap=...) replays a drawn swap sequence exactly."""
    rng = RandomState(5)
    swap = rng._draw_swaps(30)
    x = np.arange(30)
    y = np.arange(30) * 10
    rng.shuffle(x, swap=swap)
    rng.shuffle(y, swap=swap)
    assert np.array_equal(y, x * 10)


def test_pickle_restarts_from_initial_seed():
    """Pickle-by-reseed (reference random_fast.pyx:56-57): the clone
    reproduces the stream from construction, not from the pickle
    point."""
    rng = RandomState(123)
    first = [rng.randint(1000) for _ in range(5)]
    clone = pickle.loads(pickle.dumps(rng))
    assert [clone.randint(1000) for _ in range(5)] == first


def test_seed_reset_reproduces():
    rng = RandomState(9)
    p1 = rng.permutation(64)
    rng.seed(9)
    p2 = rng.permutation(64)
    assert np.array_equal(p1, p2)


def test_bad_seed_raises():
    with pytest.raises(ValueError):
        RandomState("not-a-seed")


def test_binomial_moments():
    rng = RandomState(17)
    draws = np.array([rng.binomial(100, 0.3) for _ in range(5000)])
    assert abs(draws.mean() - 30.0) < 0.5
    assert abs(draws.std() - np.sqrt(100 * 0.3 * 0.7)) < 0.3


def test_none_seed_is_entropy():
    a = RandomState(None)
    assert a.initial_seed is None
    # Two entropy-seeded streams should differ.
    b = RandomState(None)
    pa = [a.randint(10 ** 9) for _ in range(4)]
    pb = [b.randint(10 ** 9) for _ in range(4)]
    assert pa != pb
