"""Mocked-dependency coverage of the dataset fetchers' network/optional
paths.

This image has no nilearn/skimage/spectral and no network egress, so the
branches that delegate to them (``datasets/adhd.py::fetch_adhd`` — the
nilearn fetch + mask download + phenotype wrangling of reference
modl/datasets/adhd.py:13-42 — and ``datasets/image.py::load_image``'s
'aviris'/'lisboa' sources, reference modl/datasets/image.py:13-51) are
exercised against minimal in-test fakes installed in ``sys.modules``,
in the same style as tests/test_nifti_mocked.py. The fakes implement
exactly the surface the gated code touches, pinning the contract.
"""
import os
import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# fetch_adhd (reference modl/datasets/adhd.py:13-42)
# ---------------------------------------------------------------------------

def _install_fake_nilearn_datasets(monkeypatch, tmp_path, fetched_urls):
    """Fake nilearn.datasets.fetch_adhd + datasets._utils.fetch_single_file."""
    from sklearn.utils import Bunch

    adhd_root = tmp_path / 'nilearn_data' / 'adhd' / 'data'

    def fake_fetch_adhd(n_subjects=40, data_dir=None, url=None, resume=True,
                        verbose=1):
        func, confounds, pheno = [], [], []
        for i in range(n_subjects):
            sub = adhd_root / ('%07d' % i)
            sub.mkdir(parents=True, exist_ok=True)
            f = sub / ('%07d_rest_tshift_RPI_voreg_mni.nii.gz' % i)
            c = sub / ('%07d_regressors.csv' % i)
            f.write_bytes(b'')
            c.write_text('csf,wm\n0.0,0.0\n')
            func.append(str(f))
            confounds.append(str(c))
            # the reference converts 'Subject' to numeric and indexes by it
            pheno.append({'Subject': '%07d' % i, 'age': 20.0 + i,
                          'adhd': i % 2})
        return Bunch(func=func, confounds=confounds, phenotypic=pheno,
                     description='fake ADHD dataset')

    def fake_fetch_single_file(url, data_dir, resume=True, verbose=1,
                               **kwargs):
        fetched_urls.append(url)
        path = os.path.join(data_dir, os.path.basename(url))
        with open(path, 'wb') as f:
            f.write(b'mask')
        return path

    nl = types.ModuleType('nilearn')
    nl_datasets = types.ModuleType('nilearn.datasets')
    nl_datasets.fetch_adhd = fake_fetch_adhd
    nl_utils = types.ModuleType('nilearn.datasets._utils')
    nl_utils.fetch_single_file = fake_fetch_single_file
    nl_datasets._utils = nl_utils
    nl.datasets = nl_datasets
    for name, mod in (('nilearn', nl), ('nilearn.datasets', nl_datasets),
                      ('nilearn.datasets._utils', nl_utils)):
        monkeypatch.setitem(sys.modules, name, mod)
    return adhd_root


def test_fetch_adhd_mocked(monkeypatch, tmp_path):
    fetched = []
    _install_fake_nilearn_datasets(monkeypatch, tmp_path, fetched)
    monkeypatch.setenv('MODL_DATA', str(tmp_path / 'modl_data'))
    monkeypatch.delenv('MODL_SHARED_DATA', raising=False)

    from modl_tpu.datasets.adhd import fetch_adhd

    data = fetch_adhd(n_subjects=3)
    # functional records + confounds, aligned with the behavioral index
    assert len(data.func) == 3 and len(data.confounds) == 3
    assert list(data.rest.columns) == ['filename', 'confounds']
    assert len(data.rest) == 3
    assert data.rest['filename'].iloc[0] == data.func[0]
    # 'Subject' became the numeric index named 'subject'
    assert data.behavioral.index.names == ['subject']
    assert list(data.behavioral.index) == [0, 1, 2]
    assert data.behavioral['age'].iloc[1] == 21.0
    # dataset root walks up to the 'adhd' directory
    assert os.path.basename(data.root) == 'adhd'
    assert data.func[0].startswith(data.root)
    # the analysis mask was downloaded into the modl data dir
    assert os.path.exists(data.mask)
    assert data.mask.endswith('mask_img.nii.gz')
    assert fetched and 'mask_img.nii.gz' in fetched[0]

    # second call: mask already present -> no re-download
    n_before = len(fetched)
    data2 = fetch_adhd(n_subjects=3)
    assert len(fetched) == n_before
    assert data2.mask == data.mask


def test_fetch_adhd_custom_mask_url(monkeypatch, tmp_path):
    fetched = []
    _install_fake_nilearn_datasets(monkeypatch, tmp_path, fetched)
    monkeypatch.setenv('MODL_DATA', str(tmp_path / 'modl_data2'))
    monkeypatch.delenv('MODL_SHARED_DATA', raising=False)

    from modl_tpu.datasets.adhd import fetch_adhd

    fetch_adhd(n_subjects=1, mask_url='http://example.org/my_mask.nii.gz')
    # custom URL is honoured but the file lands under <data>/adhd/
    assert fetched == ['http://example.org/my_mask.nii.gz']


# ---------------------------------------------------------------------------
# load_image 'aviris' / 'lisboa' (reference modl/datasets/image.py:13-51)
# ---------------------------------------------------------------------------

def test_load_image_aviris_mocked(monkeypatch, tmp_path):
    """AVIRIS: band 110 dropped, -50 sentinel -> -1, rest min-max scaled."""
    data_dir = tmp_path / 'modl_data'
    hdr = (data_dir / 'aviris' / 'f100826t01p00r05rdn_b' /
           'f100826t01p00r05rdn_b_sc01_ort_img.hdr')
    hdr.parent.mkdir(parents=True)
    hdr.write_text('ENVI')
    monkeypatch.setenv('MODL_DATA', str(data_dir))
    monkeypatch.delenv('MODL_SHARED_DATA', raising=False)

    rng = np.random.RandomState(0)
    cube = rng.uniform(100.0, 900.0, size=(4, 5, 112)).astype(np.float64)
    cube[1, 2, :] = -50.0          # missing pixel across all bands
    cube[:, :, 110] = 12345.0      # the dropped water-absorption band

    opened = []

    class FakeSpyFile:
        def open_memmap(self):
            return cube

    spectral = types.ModuleType('spectral')

    def open_image(path):
        opened.append(path)
        return FakeSpyFile()

    spectral.open_image = open_image
    monkeypatch.setitem(sys.modules, 'spectral', spectral)

    from modl_tpu.datasets.image import load_image

    img = load_image('aviris')
    assert opened == [str(hdr)]
    assert img.shape == (4, 5, 111)          # band 110 removed
    assert not np.any(img == 12345.0)
    assert np.all(img[1, 2, :] == -1)        # sentinel preserved as -1
    good = img[img != -1]
    assert good.min() == 0.0 and good.max() == 1.0


def test_load_image_aviris_missing_file(monkeypatch, tmp_path):
    monkeypatch.setenv('MODL_DATA', str(tmp_path))
    monkeypatch.delenv('MODL_SHARED_DATA', raising=False)
    from modl_tpu.datasets.image import load_image
    with pytest.raises(IOError):
        load_image('aviris')


def test_load_image_lisboa_mocked(monkeypatch, tmp_path):
    data_dir = tmp_path / 'modl_data'
    img_path = data_dir / 'images' / 'lisboa.jpg'
    img_path.parent.mkdir(parents=True)
    img_path.write_bytes(b'JFIF')
    monkeypatch.setenv('MODL_DATA', str(data_dir))
    monkeypatch.delenv('MODL_SHARED_DATA', raising=False)

    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, size=(6, 8, 3)).astype(np.uint8)

    skimage = types.ModuleType('skimage')
    sk_io = types.ModuleType('skimage.io')
    sk_io.imread = lambda path: raw
    sk_tr = types.ModuleType('skimage.transform')

    def rescale(image, scale):
        # nearest-neighbour stand-in good enough for the contract
        h = max(1, int(image.shape[0] * scale))
        w = max(1, int(image.shape[1] * scale))
        return image[:h, :w]

    sk_tr.rescale = rescale
    skimage.io = sk_io
    skimage.transform = sk_tr
    for name, mod in (('skimage', skimage), ('skimage.io', sk_io),
                      ('skimage.transform', sk_tr)):
        monkeypatch.setitem(sys.modules, name, mod)

    from modl_tpu.datasets.image import load_image

    img = load_image('lisboa')
    assert img.shape == (6, 8, 3)
    assert img.max() <= 1.0 and img.min() >= 0.0
    gray = load_image('lisboa', gray=True)
    assert gray.shape == (6, 8, 1)
    half = load_image('lisboa', scale=0.5)
    assert half.shape[0] == 3


# ---------------------------------------------------------------------------
# MultiRawMasker non-.npy (NIfTI) fallback (reference unmask.py:39-48)
# ---------------------------------------------------------------------------

class _FakeImg:
    """Minimal NIfTI-like image object (dataobj protocol)."""

    def __init__(self, arr):
        self._arr = np.asarray(arr)

    @property
    def dataobj(self):
        return self._arr


def test_multi_raw_masker_image_object_without_nilearn(monkeypatch):
    """Without nilearn, an image object goes through its dataobj into
    the native masker (4-D -> masked 2-D)."""
    import modl_tpu.input_data.fmri.base as base
    from modl_tpu.input_data.fmri.unmask import MultiRawMasker

    monkeypatch.setattr(base, 'HAS_NILEARN', False)
    mask = np.zeros((3, 3, 2), bool)
    mask[0] = True
    vol = np.random.RandomState(0).randn(3, 3, 2, 5).astype(np.float32)
    masker = MultiRawMasker(mask_img=mask).fit()
    out = masker.transform(_FakeImg(vol))
    assert out.shape == (5, 6)
    np.testing.assert_allclose(out, vol[mask].T, rtol=1e-6)
    raw = masker.transform_raw(_FakeImg(vol))
    np.testing.assert_allclose(raw, vol[mask].T, rtol=1e-6)


def test_multi_raw_masker_nifti_mask_image(monkeypatch):
    """A NIfTI-like mask image is converted to boolean for the native
    backing masker."""
    from modl_tpu.input_data.fmri.unmask import MultiRawMasker

    mask = np.zeros((2, 2, 2), np.float32)
    mask[1] = 1.0
    masker = MultiRawMasker(mask_img=_FakeImg(mask)).fit()
    assert masker.n_voxels_ == 4
    vol = np.arange(16, dtype=np.float32).reshape(2, 2, 2, 2)
    out = masker.transform(vol)
    assert out.shape == (2, 4)


def test_multi_raw_masker_nonnpy_without_nilearn_raises(monkeypatch):
    import modl_tpu.input_data.fmri.base as base
    from modl_tpu.input_data.fmri.unmask import MultiRawMasker

    monkeypatch.setattr(base, 'HAS_NILEARN', False)
    masker = MultiRawMasker().fit()
    with pytest.raises(ValueError, match='non-.npy'):
        masker.transform('/data/rec.nii.gz')


def test_multi_raw_masker_nifti_fallback_delegates(monkeypatch):
    """With nilearn importable, non-.npy inputs delegate to the full
    nilearn masker (reference unmask.py:39-48) — mocked here."""
    import modl_tpu.input_data.fmri.base as base
    from modl_tpu.input_data.fmri.unmask import MultiRawMasker

    calls = []

    class FakeMultiNiftiMasker:
        def __init__(self, mask_img=None, smoothing_fwhm=None,
                     standardize=False, detrend=False):
            self.mask_img = mask_img
            self.smoothing_fwhm = smoothing_fwhm
            self.standardize = standardize
            self.detrend = detrend

        def fit(self, imgs=None):
            self.mask_img_ = self.mask_img
            return self

        def transform_single_imgs(self, imgs, confounds=None):
            calls.append((imgs, confounds))
            return np.ones((4, 7), np.float32)

    monkeypatch.setattr(base, 'HAS_NILEARN', True)
    monkeypatch.setattr(base, 'MultiNiftiMasker', FakeMultiNiftiMasker,
                        raising=False)
    mask = np.ones((2, 2, 2), bool)
    masker = MultiRawMasker(mask_img=mask, standardize=True).fit()

    out = masker.transform('/data/rec.nii.gz')
    assert out.shape == (4, 7)
    assert calls == [('/data/rec.nii.gz', None)]
    # the delegated masker is built once and reused
    out2 = masker.transform(_FakeImg(np.zeros((2, 2, 2, 3))))
    assert out2.shape == (4, 7) and len(calls) == 2
    nm = masker._nifti_masker_
    assert isinstance(nm, FakeMultiNiftiMasker) and nm.standardize
    # .npy strings and ndarrays still take the native short-circuit
    vol2d = np.zeros((3, 8), np.float32)
    assert masker.transform(vol2d).shape == (3, 8)
    assert len(calls) == 2
