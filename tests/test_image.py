"""Tests for the image patch pipeline + ImageDictFact.

Covers the reference's input_data tests (scale_patches moments,
clean_mask vs explicit construction, modl/input_data/tests/test_image.py)
and an end-to-end patch-dictionary fit.
"""
import numpy as np
import pytest

from modl_tpu.decomposition.image import ImageDictFact
from modl_tpu.feature_extraction.image import (LazyCleanPatchExtractor,
                                               extract_patches)
from modl_tpu.input_data.image import clean_mask, fill, scale_patches


def test_scale_patches_moments():
    rng = np.random.RandomState(0)
    patches = rng.randn(30, 8, 8, 3)
    scaled = scale_patches(patches, with_mean=True, with_std=True,
                           channel_wise=True, copy=True)
    means = scaled.mean(axis=(1, 2))
    np.testing.assert_allclose(means, 0, atol=1e-10)
    norms = np.sqrt(np.sum(scaled ** 2, axis=(1, 2, 3)))
    np.testing.assert_allclose(norms, 1, rtol=1e-10)


def test_scale_patches_not_channel_wise():
    rng = np.random.RandomState(0)
    patches = rng.randn(10, 8, 8, 3)
    scaled = scale_patches(patches, channel_wise=False, copy=True)
    np.testing.assert_allclose(scaled.mean(axis=(1, 2, 3)), 0, atol=1e-10)
    np.testing.assert_allclose(
        np.sqrt(np.sum(scaled ** 2, axis=(1, 2, 3))), 1, rtol=1e-10)


def test_clean_mask_vs_explicit():
    rng = np.random.RandomState(0)
    img = rng.rand(20, 24, 2)
    img[5, 7, 0] = -1
    img[13, 2, 1] = -1
    patches = extract_patches(img, (4, 4, 2))
    coords = clean_mask(patches, img)
    # explicit check
    expected = []
    for i in range(patches.shape[0]):
        for j in range(patches.shape[1]):
            if np.all(img[i:i + 4, j:j + 4] != -1):
                expected.append((i, j, 0))
    np.testing.assert_array_equal(coords, np.array(expected))


def test_fill_grid():
    coords = fill(3, 4, 1)
    assert coords.shape == (12, 3)
    np.testing.assert_array_equal(coords[:4, 1], np.arange(4))


def test_lazy_patch_extractor():
    rng = np.random.RandomState(0)
    img = rng.rand(30, 30, 1)
    ext = LazyCleanPatchExtractor(patch_size=(8, 8), random_state=0)
    ext.fit(img)
    assert ext.n_patches_ == 23 * 23
    assert ext.patch_shape_ == (8, 8, 1)
    batch = ext.partial_transform(batch=10)
    assert batch.shape == (10, 8, 8, 1)
    perm = np.random.RandomState(1).permutation(ext.n_patches_)
    first = ext.partial_transform(batch=5).copy()
    ext.shuffle(perm)
    # shuffle changes which patches come first (with high probability)
    second = ext.partial_transform(batch=5)
    assert not np.array_equal(first, second)


def test_lazy_patch_extractor_missing():
    rng = np.random.RandomState(0)
    img = rng.rand(20, 20, 1)
    img[10, 10, 0] = -1
    ext = LazyCleanPatchExtractor(patch_size=(5, 5), random_state=0)
    ext.fit(img)
    patches = ext.transform()
    assert np.all(patches != -1)


@pytest.mark.parametrize("method", ['masked', 'dictionary only', 'sgd'])
def test_image_dict_fact(method):
    rng = np.random.RandomState(0)
    # synthetic image: low-rank patch structure + noise
    base = rng.rand(40, 40, 1)
    idf = ImageDictFact(method=method, n_components=10, batch_size=50,
                        reduction=2, n_epochs=2, patch_size=(6, 6),
                        max_patches=500, random_state=0, verbose=0)
    idf.fit(base)
    assert idf.components_.shape == (10, 6, 6, 1)
    test_patches = LazyCleanPatchExtractor(
        patch_size=(6, 6), max_patches=20, random_state=1).fit(
            base).transform()
    code = idf.transform(test_patches)
    assert code.shape == (20, 10)
    score = idf.score(test_patches)
    assert np.isfinite(score)


@pytest.mark.parametrize("method", ['gram', 'average', 'reducing ratio'])
def test_image_dict_fact_adaptive_methods(method):
    """Methods with mid-run config changes: epoch-4 Gram upgrade,
    per-epoch reduction annealing, per-sample EMA state."""
    rng = np.random.RandomState(0)
    base = rng.rand(30, 30, 1)
    idf = ImageDictFact(method=method, n_components=6, batch_size=30,
                        reduction=2, n_epochs=5, patch_size=(5, 5),
                        max_patches=200, random_state=0)
    idf.fit(base)
    assert idf.components_.shape == (6, 5, 5, 1)
    assert np.all(np.isfinite(idf.components_))
    if method == 'gram':
        # after the epoch-4 switch the learner holds an exact Gram
        assert idf.dict_fact_.G_ is not None


def test_image_dict_fact_nmf():
    rng = np.random.RandomState(0)
    img = np.abs(rng.rand(30, 30, 1))
    idf = ImageDictFact(method='masked', setting='NMF', n_components=5,
                        batch_size=40, reduction=2, n_epochs=1,
                        patch_size=(5, 5), max_patches=200, random_state=0)
    idf.fit(img)
    assert np.all(idf.components_ >= 0)
