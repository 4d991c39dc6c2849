"""Utility tests (reference: modl/utils/tests/*)."""
import os

import numpy as np
import pytest

from modl_tpu.utils import concatenated_cv, get_sub_slice
from modl_tpu.utils.system import get_cache_dirs, get_output_dir
from modl_tpu.datasets import get_data_dirs
from modl_tpu.decomposition.stability import (amari_discrepency,
                                              mean_amari_discrepency)


def test_get_sub_slice():
    np.testing.assert_array_equal(
        get_sub_slice(None, slice(2, 5)), np.arange(2, 5))
    np.testing.assert_array_equal(
        get_sub_slice(slice(10, 20), slice(2, 5)), np.arange(12, 15))
    idx = np.array([5, 7, 9, 11])
    np.testing.assert_array_equal(
        get_sub_slice(idx, slice(1, 3)), np.array([7, 9]))
    np.testing.assert_array_equal(get_sub_slice(None, np.array([1, 2])),
                                  np.array([1, 2]))


def test_data_dirs_env(monkeypatch, tmp_path):
    monkeypatch.setenv('MODL_SHARED_DATA', str(tmp_path / 'shared'))
    monkeypatch.setenv('MODL_DATA', str(tmp_path / 'local'))
    dirs = get_data_dirs()
    assert dirs[0] == str(tmp_path / 'shared')
    assert dirs[1] == str(tmp_path / 'local')
    assert get_data_dirs('/explicit') == ['/explicit']


def test_cache_dirs_env(monkeypatch):
    monkeypatch.setenv('SHARED_CACHE', '/a')
    monkeypatch.setenv('CACHE', '/b')
    dirs = get_cache_dirs()
    assert dirs[:2] == ['/a', '/b']
    assert get_cache_dirs('/c') == ['/c']


def test_output_dir_env(monkeypatch):
    monkeypatch.setenv('MODL_OUTPUT', '/out')
    assert get_output_dir() == '/out'
    assert get_output_dir('/forced') == '/forced'


def test_amari_discrepency_properties():
    rng = np.random.RandomState(0)
    D = rng.randn(6, 30)
    # identical dictionaries -> zero discrepancy
    assert amari_discrepency(D, D) < 1e-10
    # permutation + scaling invariance
    perm = rng.permutation(6)
    scales = (rng.rand(6) + 0.5)[:, None]
    assert amari_discrepency(D, D[perm] * scales) < 1e-10
    # unrelated dictionaries -> clearly positive
    D2 = rng.randn(6, 30)
    assert amari_discrepency(D, D2) > 0.05


def test_mean_amari_discrepency():
    rng = np.random.RandomState(1)
    dicts = [rng.randn(4, 20) for _ in range(4)]
    mean_d, std_d = mean_amari_discrepency(dicts)
    assert mean_d > 0
    assert std_d >= 0


def test_concatenated_cv():
    def gen(base):
        yield np.array([base, base + 1]), np.array([base + 2])

    folds = list(concatenated_cv([gen(0), gen(10)]))
    train, test = folds[0]
    np.testing.assert_array_equal(train, [0, 1, 10, 11])
    np.testing.assert_array_equal(test, [2, 12])
