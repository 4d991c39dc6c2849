"""ADHD resting-state dataset fetcher (reference: modl/datasets/adhd.py).

Requires nilearn (optional in this image); ``make_synthetic_rest_data``
generates an offline stand-in with planted spatial networks in the same
(records, mask) contract the fMRI estimators consume.
"""
import numpy as np

__all__ = ["fetch_adhd", "make_synthetic_rest_data"]


def fetch_adhd(n_subjects=40, data_dir=None, modl_data_dir=None,
               mask_url=None):
    try:
        from nilearn import datasets as nl_datasets
    except ImportError as e:
        raise ImportError('fetch_adhd requires nilearn; use '
                          'make_synthetic_rest_data for offline runs') \
            from e
    dataset = nl_datasets.fetch_adhd(n_subjects=n_subjects,
                                     data_dir=data_dir)
    return {'func': dataset.func,
            'confounds': dataset.confounds,
            'phenotypic': dataset.phenotypic,
            'description': dataset.description}


def make_synthetic_rest_data(n_subjects=8, n_frames=100, shape=(12, 14, 10),
                             n_networks=6, noise=0.1, seed=0):
    """Synthetic rest-fMRI records: planted smooth spatial networks.

    Returns (list of 4-D arrays, 3-D bool mask, true (k, n_voxels) maps).
    """
    rng = np.random.RandomState(seed)
    mask = np.ones(shape, bool)
    n_voxels = int(np.prod(shape))
    # smooth random spatial maps
    maps = rng.randn(n_networks, *shape)
    try:
        from scipy.ndimage import gaussian_filter
        for i in range(n_networks):
            maps[i] = gaussian_filter(maps[i], sigma=1.5)
    except Exception:
        pass
    flat = maps.reshape(n_networks, n_voxels)
    flat /= np.sqrt(np.sum(flat ** 2, axis=1))[:, None]
    data = []
    for _ in range(n_subjects):
        loadings = rng.randn(n_frames, n_networks)
        X = loadings @ flat + noise * rng.randn(n_frames, n_voxels)
        data.append(X.T.reshape(shape + (n_frames,)))
    return data, mask, flat
