"""Mocked-nibabel/nilearn coverage of the NIfTI-gated branches.

This image ships without nibabel/nilearn, so the reference-parity
branches that delegate to them (`decomposition/fmri.py` check_niimg
paths, `input_data/fmri/base.py` masker delegation,
`input_data/fmri/fixes.py` monkey-patches — reference
modl/input_data/fmri/fixes.py:30-228,
modl/decomposition/tests/test_fmri.py:14-113) are exercised here
against minimal in-test fakes installed in ``sys.modules``. The fakes
implement exactly the surface the gated code touches, so these tests
pin the *contract* (what is called, what must come back); the real-deps
CI leg (.github/workflows/test.yml, job nifti-deps) runs the same
modules against genuine nibabel/nilearn.
"""
import pickle
import sys
import types

import numpy as np
import pytest

from sklearn.base import BaseEstimator


class FakeNifti1Image:
    """The slice of nibabel.Nifti1Image the gated code uses."""

    def __init__(self, dataobj=None, affine=None, header=None,
                 extra=None):
        self._dataobj = dataobj
        self.affine = affine
        self.header = header
        self.extra = {} if extra is None else extra
        self._filename = None

    def get_filename(self):
        return self._filename

    def set_filename(self, filename):
        self._filename = filename

    @property
    def dataobj(self):
        return self._dataobj

    @property
    def shape(self):
        return np.asarray(self._dataobj).shape

    def get_data_dtype(self):
        return np.asarray(self._dataobj).dtype


class FakeMultiNiftiMasker(BaseEstimator):
    """nilearn MultiNiftiMasker stand-in: sklearn param surface +
    fit() that records the mask."""

    def __init__(self, mask_img=None, smoothing_fwhm=None,
                 standardize=False, detrend=False, low_pass=None,
                 high_pass=None, t_r=None, target_affine=None,
                 target_shape=None, mask_strategy='background',
                 mask_args=None, memory=None, memory_level=1, n_jobs=1,
                 verbose=0):
        self.mask_img = mask_img
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

    def fit(self, imgs=None):
        self.mask_img_ = self.mask_img
        return self


@pytest.fixture
def nifti_mocks(monkeypatch, tmp_path):
    """Install fake nibabel + nilearn modules; restore joblib hashing
    and the fixes-module cache afterwards."""
    from joblib import hashing as joblib_hashing
    try:
        from joblib import memory as joblib_memory
    except ImportError:  # pragma: no cover
        joblib_memory = None
    import modl_tpu.input_data.fmri.fixes as fixes
    import modl_tpu.input_data.fmri.base as base

    def fake_load(filename, **kwargs):
        img = FakeNifti1Image(np.load(filename), np.eye(4))
        img.set_filename(str(filename))
        return img

    nibabel = types.ModuleType('nibabel')
    nibabel.Nifti1Image = FakeNifti1Image
    nibabel.load = fake_load

    def check_niimg(img):
        if isinstance(img, FakeNifti1Image):
            return img
        return fake_load(img)

    nilearn = types.ModuleType('nilearn')
    nl_utils = types.ModuleType('nilearn._utils')
    nl_utils.check_niimg = check_niimg
    nl_niimg = types.ModuleType('nilearn._utils.niimg')

    def load_niimg(niimg_in, dtype=None):
        return check_niimg(niimg_in)

    nl_niimg.load_niimg = load_niimg
    nl_cache = types.ModuleType('nilearn._utils.cache_mixin')

    def _wiping_safe_cache(memory, func, **kwargs):  # the original
        raise AssertionError('cache wiped')

    nl_cache._safe_cache = _wiping_safe_cache
    nl_input = types.ModuleType('nilearn.input_data')
    nl_input.MultiNiftiMasker = FakeMultiNiftiMasker
    nl_utils.niimg = nl_niimg
    nl_utils.cache_mixin = nl_cache
    nilearn._utils = nl_utils
    nilearn.input_data = nl_input

    for name, mod in (('nibabel', nibabel), ('nilearn', nilearn),
                      ('nilearn._utils', nl_utils),
                      ('nilearn._utils.niimg', nl_niimg),
                      ('nilearn._utils.cache_mixin', nl_cache),
                      ('nilearn.input_data', nl_input)):
        monkeypatch.setitem(sys.modules, name, mod)

    # base.py latched HAS_NILEARN=False at import; flip it for the test
    monkeypatch.setattr(base, 'HAS_NILEARN', True)
    monkeypatch.setattr(base, 'MultiNiftiMasker', FakeMultiNiftiMasker,
                        raising=False)
    # the real joblib hash/memory bindings must survive the test
    monkeypatch.setattr(joblib_hashing, 'hash', joblib_hashing.hash)
    if joblib_memory is not None and hasattr(joblib_memory, 'hash'):
        monkeypatch.setattr(joblib_memory, 'hash', joblib_memory.hash)
    monkeypatch.setattr(fixes, '_PICKLABLE_CACHE', None)
    monkeypatch.delitem(fixes.__dict__, 'Nifti1Image', raising=False)

    yield types.SimpleNamespace(nibabel=nibabel, tmp_path=tmp_path)

    fixes._PICKLABLE_CACHE = None
    fixes.__dict__.pop('Nifti1Image', None)


def _save_vol(tmp_path, name, arr):
    p = tmp_path / name
    np.save(p, arr)
    return str(p) + '.npy' if not str(p).endswith('.npy') else str(p)


def test_picklable_nifti_roundtrip_mocked(nifti_mocks):
    from modl_tpu.input_data.fmri import fixes

    cls, load = fixes.get_picklable_nifti_classes()
    assert issubclass(cls, FakeNifti1Image)
    # the class is published at module scope so pickle can resolve it
    assert getattr(fixes, 'Nifti1Image') is cls
    img = cls(np.arange(8, dtype=np.float32).reshape(2, 2, 2), np.eye(4))
    img.set_filename('/data/rec.nii.gz')
    img2 = pickle.loads(pickle.dumps(img))
    assert type(img2) is cls
    np.testing.assert_array_equal(np.asanyarray(img2.dataobj),
                                  np.asanyarray(img.dataobj))
    assert img2.get_filename() == '/data/rec.nii.gz'
    # second call reuses the cached class (stable identity for pickle)
    assert fixes.get_picklable_nifti_classes()[0] is cls


def test_monkey_patch_nifti_image_hashes_by_token(nifti_mocks, tmp_path):
    from joblib import hashing

    from modl_tpu.input_data.fmri import fixes

    assert fixes.monkey_patch_nifti_image() is True
    # nibabel.load now yields the picklable subclass
    vol = np.zeros((2, 2, 2), np.float32)
    path = _save_vol(tmp_path, 'a.npy', vol)
    img = nifti_mocks.nibabel.load(path)
    assert type(img).__name__ == 'Nifti1Image'
    assert isinstance(img, FakeNifti1Image)

    # file-backed images hash by (filename, mtime, size) token: equal
    # for two image objects over the same file, and NOT a content hash
    img2 = nifti_mocks.nibabel.load(path)
    img2._dataobj = img2._dataobj + 1.0   # different content, same file
    assert hashing.hash(img) == hashing.hash(img2)
    # distinct file -> distinct hash
    other = nifti_mocks.nibabel.load(_save_vol(tmp_path, 'b.npy', vol))
    assert hashing.hash(img) != hashing.hash(other)
    # non-file-backed images fall through to the normal hasher
    mem1 = FakeNifti1Image(vol, np.eye(4))
    assert hashing.hash(mem1) is not None


def test_monkey_patch_nilearn_caching_mocked(nifti_mocks, tmp_path):
    from modl_tpu.input_data.fmri import fixes

    assert fixes.monkey_patch_nilearn_caching() is True
    from nilearn._utils import cache_mixin, niimg

    # load_niimg upgrades plain images to the picklable class
    cls, _ = fixes.get_picklable_nifti_classes()
    img = niimg.load_niimg(_save_vol(tmp_path, 'c.npy',
                                     np.zeros((2, 2, 2), np.float32)))
    assert type(img) is cls
    # the version-skew cache wipe is replaced by a plain memory.cache
    calls = []

    class Mem:
        def cache(self, func, **kwargs):
            calls.append(func)
            return func

    f = cache_mixin._safe_cache(Mem(), len)
    assert f is len and calls == [len]


def test_lazy_scan_check_niimg_path(nifti_mocks):
    from modl_tpu.decomposition.fmri import _lazy_scan

    img = FakeNifti1Image(np.zeros((2, 2, 2, 7), np.float64))
    ns, dtype = _lazy_scan([img])
    assert ns == [7] and dtype == np.float64


def test_count_voxels_nilearn_masker(nifti_mocks):
    from modl_tpu.decomposition.fmri import fMRIDictFact

    mask = np.zeros((2, 2, 2), np.float32)
    mask[0, :, :] = 1.0

    class M:
        mask_img_ = FakeNifti1Image(mask, np.eye(4))

    assert fMRIDictFact._count_voxels(M(), None) == 4


def test_load_img_nilearn_path(nifti_mocks, tmp_path):
    from modl_tpu.input_data.fmri.base import _load_img

    vol = np.random.RandomState(0).randn(2, 2, 2).astype(np.float32)
    path = str(tmp_path / 'd.nii.npy')   # .npy goes the native path
    np.save(path, vol)
    np.testing.assert_array_equal(_load_img(path), vol)
    # a non-.npy string routes through check_niimg -> dataobj
    path2 = str(tmp_path / 'e.nii')
    np.save(path2 + '.npy', vol)
    import os
    os.rename(path2 + '.npy', path2)
    np.testing.assert_array_equal(_load_img(path2), vol)


def test_check_embedded_masker_delegates_to_nilearn(nifti_mocks):
    from modl_tpu.input_data.fmri.base import check_embedded_nifti_masker

    class Est(BaseEstimator):
        def __init__(self):
            self.mask = FakeNifti1Image(np.ones((2, 2, 2), np.float32),
                                        np.eye(4))
            self.smoothing_fwhm = 4.0
            self.standardize = True
            self.n_jobs = 3
            self.memory_level = 2
            self.verbose = 0

    masker = check_embedded_nifti_masker(Est())
    assert isinstance(masker, FakeMultiNiftiMasker)
    assert masker.smoothing_fwhm == 4.0 and masker.standardize
    assert masker.n_jobs == 3 and masker.memory_level == 1
    assert masker.mask_img_ is masker.mask_img
