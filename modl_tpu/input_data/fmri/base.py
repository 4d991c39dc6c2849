"""Masker abstraction for fMRI-like data.

The reference (modl/input_data/fmri/base.py) builds nilearn
``MultiNiftiMasker`` objects from estimator params. nilearn/nibabel are
optional here: the native path is ``NumpyMasker`` — a boolean 3-D mask
over 4-D arrays / ``.npy`` files (the TPU-friendly raw pipeline; NIfTI
handling delegates to nilearn when importable).
"""
import os

import numpy as np

try:  # optional heavy deps
    import nilearn  # noqa: F401
    from nilearn.input_data import MultiNiftiMasker  # type: ignore
    HAS_NILEARN = True
except Exception:  # pragma: no cover - absent in this image
    HAS_NILEARN = False

from sklearn.base import BaseEstimator

__all__ = ["NumpyMasker", "BaseNilearnEstimator",
            "check_embedded_masker", "HAS_NILEARN"]


class NumpyMasker(BaseEstimator):
    """Mask 4-D arrays into (n_frames, n_voxels) matrices.

    Native analog of a fitted NiftiMasker for ndarray / ``.npy`` data:
    ``transform`` flattens the last-axis time dimension over the mask,
    ``inverse_transform`` scatters component maps back into the volume.

    Parameters
    ----------
    mask_img : 3-D boolean ndarray (or path to a ``.npy`` holding one).
    standardize : bool, center/scale each voxel time-series.
    detrend : bool, remove linear trend per voxel (host-side numpy).
    smoothing_fwhm : accepted for parity; ignored (no spatial smoothing
        without nilearn).
    """

    def __init__(self, mask_img=None, standardize=False, detrend=False,
                 smoothing_fwhm=None):
        self.mask_img = mask_img
        self.standardize = standardize
        self.detrend = detrend
        self.smoothing_fwhm = smoothing_fwhm

    def fit(self, imgs=None, y=None):
        mask = self.mask_img
        if isinstance(mask, str):
            mask = np.load(mask)
        if mask is None:
            if imgs is None:
                raise ValueError('Provide a mask or data to fit the masker')
            img = _load_img(imgs[0] if isinstance(imgs, (list, tuple))
                            else imgs)
            # background mask: voxels with nonzero variance
            mask = img.std(axis=-1) > 0
        self.mask_img_ = np.asarray(mask, bool)
        self.n_voxels_ = int(self.mask_img_.sum())
        return self

    def _check_fitted(self):
        if not hasattr(self, 'mask_img_'):
            raise ValueError('NumpyMasker is not fitted')

    def transform(self, img, confounds=None):
        """(x, y, z, t) array or .npy path -> (t, n_voxels)."""
        data = _load_img(img)
        if data.ndim == 2:  # already masked (raw path) - no mask needed
            out = np.asarray(data, np.float64)
        else:
            self._check_fitted()
            out = data[self.mask_img_].T.astype(np.float64)
        if self.detrend:
            # nilearn's detrend removes the mean AND the linear trend;
            # match it so both masker backends agree with
            # standardize=False.
            out = out - out.mean(0)
            t = np.arange(out.shape[0], dtype=np.float64)
            t = (t - t.mean())
            denom = np.sum(t * t)
            if denom > 0:
                slope = (t[:, None] * out).sum(0) / denom
                out = out - np.outer(t, slope)
        if self.standardize:
            out = out - out.mean(axis=0)
            std = out.std(axis=0)
            std[std == 0] = 1
            out = out / std
        if confounds is not None:
            conf = np.asarray(confounds, np.float64)
            conf = conf - conf.mean(0)
            coef, *_ = np.linalg.lstsq(conf, out, rcond=None)
            out = out - conf @ coef
        return out

    def inverse_transform(self, components):
        """(k, n_voxels) -> (x, y, z, k) volume stack."""
        self._check_fitted()
        components = np.atleast_2d(components)
        shape = self.mask_img_.shape + (components.shape[0],)
        out = np.zeros(shape, components.dtype)
        out[self.mask_img_] = components.T
        return out


def _load_img(img):
    if isinstance(img, str):
        if img.endswith('.npy'):
            return np.load(img, mmap_mode='r')
        if HAS_NILEARN:  # pragma: no cover
            from nilearn._utils import check_niimg
            return np.asanyarray(check_niimg(img).dataobj)
        raise ValueError('Cannot load %r without nibabel/nilearn' % img)
    return np.asarray(img)


class BaseNilearnEstimator(BaseEstimator):
    """Estimator base handling masker construction (reference
    input_data/fmri/base.py:14-61), generalised over masker backends."""

    def __init__(self, mask=None, smoothing_fwhm=None, standardize=True,
                 detrend=True, low_pass=None, high_pass=None, t_r=None,
                 target_affine=None, target_shape=None,
                 mask_strategy='background', mask_args=None, memory=None,
                 memory_level=2, n_jobs=1, verbose=0):
        self.mask = mask
        self.smoothing_fwhm = smoothing_fwhm
        self.standardize = standardize
        self.detrend = detrend
        self.low_pass = low_pass
        self.high_pass = high_pass
        self.t_r = t_r
        self.target_affine = target_affine
        self.target_shape = target_shape
        self.mask_strategy = mask_strategy
        self.mask_args = mask_args
        self.memory = memory
        self.memory_level = memory_level
        self.n_jobs = n_jobs
        self.verbose = verbose

    def fit(self, imgs=None, y=None, confounds=None):
        self.masker_ = check_embedded_masker(self)
        if not hasattr(self.masker_, 'mask_img_'):
            self.masker_.fit(imgs)
        self.mask_img_ = self.masker_.mask_img_
        return self


def check_embedded_masker(estimator):
    """Build a masker from estimator params (reference base.py:69-140).

    ndarray / .npy / NumpyMasker masks -> NumpyMasker; NIfTI masks are
    delegated to nilearn when present.
    """
    mask = getattr(estimator, 'mask', None)
    if isinstance(mask, NumpyMasker):
        if not hasattr(mask, 'mask_img_'):
            mask.fit()
        return mask
    if HAS_NILEARN and mask is not None and not isinstance(
            mask, (np.ndarray, str)):  # pragma: no cover
        masker = MultiNiftiMasker(
            mask_img=mask,
            smoothing_fwhm=estimator.smoothing_fwhm,
            standardize=estimator.standardize,
            detrend=estimator.detrend)
        return masker.fit()
    masker = NumpyMasker(mask_img=mask,
                         standardize=estimator.standardize,
                         detrend=estimator.detrend,
                         smoothing_fwhm=estimator.smoothing_fwhm)
    if mask is not None:
        masker.fit()
    return masker
