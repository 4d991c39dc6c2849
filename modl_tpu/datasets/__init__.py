"""Dataset loaders and data-directory resolution.

Reference: modl/datasets/__init__.py. The MODL_SHARED_DATA / MODL_DATA /
~/modl_data env chain is preserved; loaders for external corpora
(AVIRIS, MovieLens, Netflix, ADHD) look there and raise informative
errors when the files or the optional deps (nilearn, skimage) are absent.
Synthetic generators are provided so every example runs offline.
"""
import os

__all__ = ["get_data_dirs"]


def get_data_dirs(data_dir=None):
    """Data directory chain: arg > MODL_SHARED_DATA > MODL_DATA >
    ~/modl_data (reference datasets/__init__.py:4-49)."""
    paths = []
    if data_dir is not None:
        paths.extend(data_dir.split(os.pathsep))
    else:
        global_data = os.getenv('MODL_SHARED_DATA')
        if global_data is not None:
            paths.extend(global_data.split(os.pathsep))
        local_data = os.getenv('MODL_DATA')
        if local_data is not None:
            paths.extend(local_data.split(os.pathsep))
        paths.append(os.path.expanduser('~/modl_data'))
    return paths
