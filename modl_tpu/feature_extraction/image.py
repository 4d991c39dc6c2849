"""Lazy patch extraction (reference: modl/feature_extraction/image.py).

``extract_patches`` from old scikit-learn is replaced by
``numpy.lib.stride_tricks.sliding_window_view`` (zero-copy strided view);
patches materialise on demand in ``partial_transform``.
"""
import numpy as np
from numpy.lib.stride_tricks import sliding_window_view
from sklearn.base import BaseEstimator
from sklearn.utils import check_random_state

from ..input_data.image import clean_mask, fill

__all__ = ["LazyCleanPatchExtractor"]


def extract_patches(image, patch_shape):
    """6-D zero-copy view (n_i, n_j, n_k, p_h, p_w, n_chan) of all patches."""
    view = sliding_window_view(image, patch_shape)
    return view


class LazyCleanPatchExtractor(BaseEstimator):
    """Patch extractor that skips patches touching missing (-1) pixels.

    API mirrors the reference class (feature_extraction/image.py:8-83):
    fit / transform / partial_transform / shuffle, ``n_patches_`` and
    ``patch_shape_`` properties. Patches are materialised on demand from
    a strided view (useful for large hyperspectral images).
    """

    def __init__(self, patch_size=None, random_state=None, max_patches=None):
        self.patch_size = patch_size
        self.max_patches = max_patches
        self.random_state = random_state

    def fit(self, X, y=None):
        self.random_state = check_random_state(self.random_state)
        i_h, i_w, n_channels = X.shape
        if self.patch_size is None:
            patch_size = i_h // 10, i_w // 10
        else:
            patch_size = self.patch_size
        patch_shape = (patch_size[0], patch_size[1], n_channels)
        self.patches_ = extract_patches(X, patch_shape)

        clean = np.all(X != -1)
        if not clean:
            self.indices_3d = clean_mask(self.patches_, X)
        else:
            self.indices_3d = fill(*self.patches_.shape[:3])
        n_samples = self.indices_3d.shape[0]
        selection = self.random_state.permutation(n_samples)[:self.max_patches]
        self.indices_3d = self.indices_3d[selection]
        return self

    def partial_transform(self, X=None, batch=None):
        if X is not None:
            self.fit(X)
        if batch is None:
            return self.transform()
        if isinstance(batch, int):
            batch = slice(0, batch)
        these_indices = tuple(self.indices_3d[batch].T)
        return self.patches_[these_indices]

    def transform(self, X=None):
        if X is not None:
            self.fit(X)
        return self.patches_[tuple(self.indices_3d.T)]

    def shuffle(self, permutation=None):
        if permutation is None:
            n_samples = self.indices_3d.shape[0]
            permutation = self.random_state.permutation(n_samples)
        self.indices_3d = self.indices_3d[permutation]

    @property
    def n_patches_(self):
        return self.indices_3d.shape[0]

    @property
    def patch_shape_(self):
        return self.patches_.shape[-3:]
