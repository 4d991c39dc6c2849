"""Caching/pickling fixes for fMRI data objects.

Reference: modl/input_data/fmri/fixes.py — picklable ``Nifti1Image`` and
a joblib hasher that hashes NIfTI images by (filename, mtime) instead of
content so cache lookups don't read gigabytes.

Here the native record format is plain ``.npy`` paths (strings — already
cheap to hash), so only two pieces remain:

- ``filename_mtime_token``: the (path, mtime, size) identity token used
  to key caches on file identity without content reads;
- ``monkey_patch_nifti_image``: when nibabel/nilearn are importable,
  registers a joblib hasher for NIfTI images with the reference's
  (filename, mtime) semantics, and makes in-memory images picklable.
"""
import os

__all__ = ["filename_mtime_token", "monkey_patch_nifti_image"]


def filename_mtime_token(path):
    """Cache-identity token for a data file: (path, mtime, size)."""
    st = os.stat(path)
    return (os.path.abspath(path), st.st_mtime, st.st_size)


def monkey_patch_nifti_image():
    """Apply nibabel/joblib patches when those libraries are present.

    No-op (returns False) without nibabel — the raw ``.npy`` pipeline
    needs no patching.
    """
    try:
        import nibabel
        from joblib import hashing
    except ImportError:
        return False

    class NibabelHasher(hashing.Hasher):  # pragma: no cover - needs nibabel
        def save(self, obj):
            if isinstance(obj, nibabel.Nifti1Image):
                filename = obj.get_filename()
                if filename is not None:
                    obj = filename_mtime_token(filename)
            hashing.Hasher.save(self, obj)

    hashing.NibabelHasher = NibabelHasher
    return True
