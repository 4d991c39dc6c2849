"""Raw-data masker: short-circuit ``.npy`` paths / ndarrays to mmap loads.

Reference: modl/input_data/fmri/unmask.py (MultiRawMasker). Pre-unmasked
records are 2-D (n_frames, n_voxels) arrays on disk; transform is a
(memory-mapped) load plus optional standardization — the fast path for
TB-scale streaming where unmasking already happened offline. Non-``.npy``
inputs (NIfTI paths / image objects) fall back to the full nilearn
masker exactly as the reference does (unmask.py:39-48, 91-109); without
nilearn an image object's ``dataobj`` is still accepted natively.
"""
import numpy as np
from sklearn.base import BaseEstimator

from . import base as _base
from .base import NumpyMasker

__all__ = ["MultiRawMasker"]


def _mask_array(mask_img):
    """Boolean 3-D mask from an ndarray / .npy path / NIfTI image."""
    if mask_img is None or isinstance(mask_img, (np.ndarray, str)):
        return mask_img
    if hasattr(mask_img, 'dataobj'):    # NIfTI-like image object
        return np.asanyarray(mask_img.dataobj) != 0
    return mask_img


class MultiRawMasker(BaseEstimator):
    """Masker over pre-unmasked 2-D records (reference unmask.py:10-135)."""

    def __init__(self, mask_img=None, smoothing_fwhm=None, standardize=False,
                 detrend=False):
        self.mask_img = mask_img
        self.smoothing_fwhm = smoothing_fwhm
        self.standardize = standardize
        self.detrend = detrend

    def fit(self, imgs=None, y=None):
        self._backing = NumpyMasker(mask_img=_mask_array(self.mask_img),
                                    standardize=self.standardize,
                                    detrend=self.detrend)
        if self.mask_img is not None:
            self._backing.fit()
            self.mask_img_ = self._backing.mask_img_
            self.n_voxels_ = self._backing.n_voxels_
        return self

    def _nifti_fallback(self, imgs, confounds=None, raw=False):
        """Reference fallback for non-.npy inputs (unmask.py:39-48):
        delegate to the full nilearn masker when importable; otherwise
        accept image objects natively through their ``dataobj``."""
        if _base.HAS_NILEARN:
            masker = getattr(self, '_nifti_masker_', None)
            if masker is None:
                masker = _base.MultiNiftiMasker(
                    mask_img=self.mask_img,
                    smoothing_fwhm=self.smoothing_fwhm,
                    standardize=self.standardize, detrend=self.detrend)
                masker.fit()
                self._nifti_masker_ = masker
            return masker.transform_single_imgs(imgs, confounds=confounds)
        if hasattr(imgs, 'dataobj'):    # nibabel image without nilearn
            data = np.asanyarray(imgs.dataobj)
            return (self._backing.transform_raw(data) if raw
                    else self._backing.transform(data, confounds=confounds))
        raise ValueError(
            'MultiRawMasker got a non-.npy input %r; handling NIfTI '
            'paths requires nilearn (pass pre-unmasked .npy records or '
            'ndarrays for the native path)' % (imgs,))

    def transform(self, imgs, confounds=None):
        if isinstance(imgs, (list, tuple)):
            return [self.transform(img, confounds) for img in imgs]
        if isinstance(imgs, str):
            if not imgs.endswith('.npy'):
                return self._nifti_fallback(imgs, confounds=confounds)
            data = np.load(imgs, mmap_mode='r')
        elif isinstance(imgs, np.ndarray):
            data = imgs
        else:
            return self._nifti_fallback(imgs, confounds=confounds)
        # NumpyMasker handles both 2-D (pre-unmasked) and 4-D inputs and
        # applies detrend/standardize/confounds uniformly
        return self._backing.transform(data, confounds=confounds)

    def transform_raw(self, imgs):
        """Mask-only load (see NumpyMasker.transform_raw)."""
        if isinstance(imgs, str):
            if not imgs.endswith('.npy'):
                return self._nifti_fallback(imgs, raw=True)
            data = np.load(imgs, mmap_mode='r')
        elif isinstance(imgs, np.ndarray):
            data = imgs
        else:
            return self._nifti_fallback(imgs, raw=True)
        return self._backing.transform_raw(data)

    def inverse_transform(self, components):
        if self.mask_img is None:
            raise ValueError('inverse_transform requires a mask')
        return self._backing.inverse_transform(components)
