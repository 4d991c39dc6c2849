"""Raw-data masker: short-circuit ``.npy`` paths / ndarrays to mmap loads.

Reference: modl/input_data/fmri/unmask.py (MultiRawMasker). Pre-unmasked
records are 2-D (n_frames, n_voxels) arrays on disk; transform is a
(memory-mapped) load plus optional standardization — the fast path for
TB-scale streaming where unmasking already happened offline.
"""
import numpy as np
from sklearn.base import BaseEstimator

from .base import NumpyMasker

__all__ = ["MultiRawMasker"]


class MultiRawMasker(BaseEstimator):
    """Masker over pre-unmasked 2-D records (reference unmask.py:10-135)."""

    def __init__(self, mask_img=None, smoothing_fwhm=None, standardize=False,
                 detrend=False):
        self.mask_img = mask_img
        self.smoothing_fwhm = smoothing_fwhm
        self.standardize = standardize
        self.detrend = detrend

    def fit(self, imgs=None, y=None):
        self._backing = NumpyMasker(mask_img=self.mask_img,
                                    standardize=self.standardize,
                                    detrend=self.detrend)
        if self.mask_img is not None:
            self._backing.fit()
            self.mask_img_ = self._backing.mask_img_
            self.n_voxels_ = self._backing.n_voxels_
        return self

    def transform(self, imgs, confounds=None):
        if isinstance(imgs, (list, tuple)):
            return [self.transform(img, confounds) for img in imgs]
        if isinstance(imgs, str) and imgs.endswith('.npy'):
            data = np.load(imgs, mmap_mode='r')
        else:
            data = np.asarray(imgs)
        # NumpyMasker handles both 2-D (pre-unmasked) and 4-D inputs and
        # applies detrend/standardize/confounds uniformly
        return self._backing.transform(data, confounds=confounds)

    def transform_raw(self, imgs):
        """Mask-only load (see NumpyMasker.transform_raw)."""
        if isinstance(imgs, str) and imgs.endswith('.npy'):
            data = np.load(imgs, mmap_mode='r')
        else:
            data = np.asarray(imgs)
        return self._backing.transform_raw(data)

    def inverse_transform(self, components):
        if self.mask_img is None:
            raise ValueError('inverse_transform requires a mask')
        return self._backing.inverse_transform(components)
