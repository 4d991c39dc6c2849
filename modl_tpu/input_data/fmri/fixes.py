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
           "monkey_patch_nifti_image", "monkey_patch_nilearn_caching"]


_PICKLABLE_CACHE = None


def get_picklable_nifti_classes():
    """(Nifti1Image subclass, load function) that survive pickling.

    nibabel's ``Nifti1Image`` drops its filename (and may hold an open
    mmap) across pickle; the subclass serialises
    dataobj/header/affine/extra/filename explicitly so cached /
    multiprocessing pipelines can round-trip images (reference
    fixes.py:41-58). Returns None without nibabel.

    The subclass is created once and published as this module's
    ``Nifti1Image`` attribute: pickle resolves classes by
    module + qualname, so a function-local class would make the
    instances themselves unpicklable.
    """
    global _PICKLABLE_CACHE
    if _PICKLABLE_CACHE is not None:
        return _PICKLABLE_CACHE
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

    Nifti1Image.__module__ = __name__
    Nifti1Image.__qualname__ = 'Nifti1Image'
    globals()['Nifti1Image'] = Nifti1Image

    nibabel_load = nibabel.load

    def load(filename, **kwargs):
        img = nibabel_load(filename, **kwargs)
        if type(img) is nibabel.Nifti1Image:
            img.__class__ = Nifti1Image
        return img

    _PICKLABLE_CACHE = (Nifti1Image, load)
    return _PICKLABLE_CACHE


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

    class NibabelHasher(base_cls):
        def save(self, obj):
            if isinstance(obj, nibabel.Nifti1Image):
                filename = obj.get_filename()
                if filename is not None:
                    obj = ('__nifti_token__',
                           filename_mtime_token(filename))
            base_cls.save(self, obj)

    def nifti_hash(obj, hash_name='md5',
                   coerce_mmap=False):
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
    if classes is not None:
        nibabel.load = classes[1]
    return True


def monkey_patch_nilearn_caching():
    """Extend the cheap-hashing discipline into nilearn's internals.

    The reference additionally patches nilearn's own loader/cache layer
    (modl fixes.py:110-228) so that *cached masker transforms* — the
    fMRI pipeline's hot cache path — key on file identity rather than
    image content. Applying :func:`monkey_patch_nifti_image` already
    covers most of it here, because modern nilearn hashes through plain
    ``joblib`` (whose ``hash`` we rebind) and loads through
    ``nibabel.load`` (which we wrap); this function closes the two
    remaining nilearn-internal holes:

    - ``nilearn._utils.niimg.load_niimg`` constructs images via the
      class of its input rather than ``nibabel.load``; wrap it so every
      image entering a masker is upgraded to the picklable subclass.
    - ``nilearn._utils.cache_mixin._safe_cache`` wipes the whole cache
      directory whenever the nibabel version changes; replace the wipe
      with a warning so long-lived TB-scale caches survive environment
      upgrades (version skew only affects hash keys, which our
      (filename, mtime, size) token makes version-independent).

    Returns True when the patches were applied, False when nilearn (or
    nibabel) is not importable — the raw ``.npy`` pipeline that this
    package uses natively needs none of this.
    """
    if not monkey_patch_nifti_image():
        return False
    try:
        from nilearn._utils import cache_mixin, niimg
    except ImportError:
        return False

    classes = get_picklable_nifti_classes()
    if classes is None:
        return False
    picklable_cls = classes[0]

    inner_load = niimg.load_niimg

    def load_niimg(niimg_in, dtype=None):
        import nibabel
        img = inner_load(niimg_in, dtype=dtype)
        if type(img) is nibabel.Nifti1Image:
            img.__class__ = picklable_cls
        return img

    niimg.load_niimg = load_niimg

    if hasattr(cache_mixin, '_safe_cache'):
        def _safe_cache(memory, func, **kwargs):
            # identical contract, minus the version-skew cache wipe
            return memory.cache(func, **kwargs)

        cache_mixin._safe_cache = _safe_cache
    return True
