"""Dataset loader / generator tests."""
import numpy as np
import pytest
import scipy.sparse as sp

from modl_tpu.datasets.adhd import make_synthetic_rest_data
from modl_tpu.datasets.image import load_image, make_synthetic_image
from modl_tpu.datasets.recsys import make_synthetic_ratings


def test_make_synthetic_image():
    img = make_synthetic_image(64, 48, n_channels=2, seed=0)
    assert img.shape == (64, 48, 2)
    assert img.min() >= 0 and img.max() <= 1


def test_make_synthetic_image_missing():
    img = make_synthetic_image(32, 32, missing_fraction=0.1, seed=0)
    frac = np.mean(np.any(img == -1, axis=2))
    assert 0.05 < frac < 0.2


def test_load_image_face():
    try:
        img = load_image('face', gray=True)
    except Exception:
        pytest.skip('scipy face dataset unavailable offline')
    assert img.ndim == 3
    assert img.shape[2] == 1
    assert img.max() <= 1.0


def test_load_image_unknown_source():
    with pytest.raises(ValueError):
        load_image('nope')


def test_make_synthetic_ratings():
    X = make_synthetic_ratings(n_users=100, n_items=50, density=0.1,
                               crop=(1., 5.), seed=0)
    assert sp.issparse(X)
    assert X.shape == (100, 50)
    assert X.data.min() >= 1.0 and X.data.max() <= 5.0
    sparsity = X.nnz / (100 * 50)
    assert 0.05 < sparsity < 0.15


def test_make_synthetic_rest_data():
    data, mask, maps = make_synthetic_rest_data(
        n_subjects=3, n_frames=20, shape=(6, 6, 4), n_networks=4)
    assert len(data) == 3
    assert data[0].shape == (6, 6, 4, 20)
    assert mask.shape == (6, 6, 4)
    assert maps.shape == (4, 144)


def test_load_recsys_movielens(tmp_path, monkeypatch):
    """load_recsys entry-splits a MovieLens matrix 75/25
    (reference datasets/recsys.py:41-52)."""
    import scipy.sparse as sp

    from modl_tpu.datasets.recsys import load_recsys, make_synthetic_ratings

    X = make_synthetic_ratings(n_users=60, n_items=40, density=0.2)
    ml_dir = tmp_path / 'movielens100k'
    ml_dir.mkdir()
    from joblib import dump
    dump(sp.coo_matrix(X), ml_dir / 'X_csr.pkl')
    monkeypatch.setenv('MODL_DATA', str(tmp_path))
    monkeypatch.delenv('MODL_SHARED_DATA', raising=False)

    X_tr, X_te = load_recsys('100k', random_state=0)
    assert sp.issparse(X_tr) and X_tr.format == 'csr'
    assert X_tr.shape == X_te.shape == X.shape
    assert X_tr.nnz + X_te.nnz == X.nnz
    assert abs(X_tr.nnz - 0.75 * X.nnz) <= 1


def test_load_recsys_unknown():
    import pytest as _pytest

    from modl_tpu.datasets.recsys import load_recsys
    with _pytest.raises(ValueError):
        load_recsys('nope')


def test_fetch_adhd_requires_nilearn():
    import pytest as _pytest

    from modl_tpu.datasets.adhd import fetch_adhd
    _pytest.importorskip_absent = None
    try:
        import nilearn  # noqa: F401
        has_nilearn = True
    except ImportError:
        has_nilearn = False
    if not has_nilearn:
        with _pytest.raises(ImportError):
            fetch_adhd(n_subjects=1)
