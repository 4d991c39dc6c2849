"""Caching fixes: identity tokens + graceful gating without nibabel/nilearn.

The nibabel/nilearn-dependent bodies (picklable Nifti1Image, hasher
rebinding, nilearn cache-mixin patches — reference fixes.py:30-228) are
exercised only when those libraries are importable; this image ships
without them, so the tests pin the gating contract and the token.
"""
import os

import pytest

from modl_tpu.input_data.fmri.fixes import (filename_mtime_token,
                                            get_picklable_nifti_classes,
                                            monkey_patch_nifti_image,
                                            monkey_patch_nilearn_caching)


def _has(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


def test_filename_mtime_token(tmp_path):
    p = tmp_path / "rec.npy"
    p.write_bytes(b"x" * 100)
    tok = filename_mtime_token(str(p))
    assert tok[0] == os.path.abspath(str(p))
    assert tok[2] == 100
    assert tok == filename_mtime_token(str(p))
    # content change at same path -> different token (size component)
    p.write_bytes(b"x" * 101)
    assert filename_mtime_token(str(p))[2] == 101


def test_monkey_patches_gate_on_imports():
    have_nib = _has("nibabel")
    assert monkey_patch_nifti_image() is have_nib
    assert monkey_patch_nilearn_caching() is (have_nib and _has("nilearn"))
    if not have_nib:
        assert get_picklable_nifti_classes() is None


@pytest.mark.skipif(not _has("nibabel"), reason="needs nibabel")
def test_picklable_nifti_roundtrip(tmp_path):  # pragma: no cover
    import pickle

    import numpy as np

    cls, load = get_picklable_nifti_classes()
    img = cls(np.zeros((2, 2, 2), np.float32), np.eye(4))
    img2 = pickle.loads(pickle.dumps(img))
    assert np.allclose(np.asanyarray(img2.dataobj), 0)


def test_safe_to_filename_saves_a_copy(tmp_path):
    """safe_to_filename serialises a deep copy (reference base.py:64-66):
    the original image object must be untouched by save-time header
    mutation."""
    from modl_tpu.input_data.fmri.base import safe_to_filename

    class FakeImg:
        def __init__(self):
            self.header = {"dirty": False}
            self.saved_to = None

        def to_filename(self, filename):
            self.header["dirty"] = True          # save-time mutation
            with open(filename, "w") as f:
                f.write("img")

    img = FakeImg()
    out = tmp_path / "img.nii"
    safe_to_filename(img, str(out))
    assert out.read_text() == "img"
    assert img.header["dirty"] is False          # original untouched
