"""Caching fixes for fMRI data objects.

Reference: modl/input_data/fmri/fixes.py — a joblib hasher that hashes
NIfTI images by (filename, mtime) instead of content so cache lookups
don't read gigabytes, plus a picklable ``Nifti1Image``.

Here the native record format is plain ``.npy`` paths (strings — already
cheap to hash), so only two pieces remain:

- ``filename_mtime_token``: the (path, mtime, size) identity token used
  to key caches on file identity without content reads;
- ``get_picklable_nifti_classes``: a ``Nifti1Image`` subclass whose
  pickle state carries dataobj/header/affine/filename (the reference's
  picklable image, fixes.py:41-58) plus a ``load`` that upgrades loaded
  images to it;
- ``monkey_patch_nifti_image``: when nibabel is importable, installs
  the picklable class into ``nibabel.load`` results and replaces
  ``joblib.hashing.hash`` (and the ``joblib.memory`` from-import binding)
  with a variant whose Hasher substitutes file-backed ``Nifti1Image``
  objects by their (filename, mtime, size) token — the reference's
  semantics (fixes.py:61-109).
"""
import os

__all__ = ["filename_mtime_token", "get_picklable_nifti_classes",
           "monkey_patch_nifti_image"]


def get_picklable_nifti_classes():  # pragma: no cover - needs nibabel
    """(Nifti1Image subclass, load function) that survive pickling.

    nibabel's ``Nifti1Image`` drops its filename (and may hold an open
    mmap) across pickle; the subclass serialises
    dataobj/header/affine/extra/filename explicitly so cached /
    multiprocessing pipelines can round-trip images (reference
    fixes.py:30-58). Returns None without nibabel.
    """
    try:
        import nibabel
    except ImportError:
        return None

    import numpy as np

    class Nifti1Image(nibabel.Nifti1Image):
        def __getstate__(self):
            return {'dataobj': np.asanyarray(self._dataobj),
                    'header': self.header,
                    'affine': self.affine,
                    'extra': self.extra,
                    'filename': self.get_filename()}

        def __setstate__(self, state):
            fresh = Nifti1Image(dataobj=state['dataobj'],
                                affine=state['affine'],
                                header=state['header'],
                                extra=state['extra'])
            self.__dict__ = fresh.__dict__
            if state['filename'] is not None:
                self.set_filename(state['filename'])

    nibabel_load = nibabel.load

    def load(filename, **kwargs):
        img = nibabel_load(filename, **kwargs)
        if type(img) is nibabel.Nifti1Image:
            img.__class__ = Nifti1Image
        return img

    return Nifti1Image, load


def filename_mtime_token(path):
    """Cache-identity token for a data file: (path, mtime, size)."""
    st = os.stat(path)
    return (os.path.abspath(path), st.st_mtime, st.st_size)


def monkey_patch_nifti_image():
    """Route joblib hashing of file-backed NIfTI images through their
    (filename, mtime, size) token. No-op (returns False) without
    nibabel — the raw ``.npy`` pipeline needs no patching.
    """
    try:
        import nibabel
        from joblib import hashing
    except ImportError:
        return False

    base_cls = getattr(hashing, 'NumpyHasher', hashing.Hasher)

    class NibabelHasher(base_cls):  # pragma: no cover - needs nibabel
        def save(self, obj):
            if isinstance(obj, nibabel.Nifti1Image):
                filename = obj.get_filename()
                if filename is not None:
                    obj = ('__nifti_token__',
                           filename_mtime_token(filename))
            base_cls.save(self, obj)

    def nifti_hash(obj, hash_name='md5',
                   coerce_mmap=False):  # pragma: no cover
        try:
            hasher = NibabelHasher(hash_name=hash_name,
                                   coerce_mmap=coerce_mmap)
        except TypeError:  # plain Hasher has no coerce_mmap
            hasher = NibabelHasher(hash_name=hash_name)
        return hasher.hash(obj)

    hashing.hash = nifti_hash
    # joblib.memory binds `hash` via from-import at module load; rebind
    try:
        from joblib import memory as joblib_memory
        if hasattr(joblib_memory, 'hash'):
            joblib_memory.hash = nifti_hash
    except Exception:  # pragma: no cover
        pass
    # route loads through the picklable Nifti1Image subclass
    classes = get_picklable_nifti_classes()
    if classes is not None:  # pragma: no cover - needs nibabel
        nibabel.load = classes[1]
    return True
