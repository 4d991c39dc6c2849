"""Checkpoint / pickling / experiment-harness tests (SURVEY section 5:
checkpoint-resume, config system, observability)."""
import os
import pickle

import numpy as np

from modl_tpu import DictFact
from modl_tpu.decomposition._step import SomfState
from modl_tpu.utils.checkpoint import (load_estimator, load_state,
                                       save_estimator, save_state)
from modl_tpu.utils.experiment import Experiment


def _fit_small(seed=0):
    rng = np.random.RandomState(0)
    X = rng.randn(60, 24)
    df = DictFact(n_components=4, reduction=2, code_alpha=1e-3,
                  comp_l1_ratio=0, n_epochs=2, batch_size=20,
                  random_state=seed)
    df.fit(X)
    return df, X


def test_estimator_pickle_roundtrip(tmp_path):
    df, X = _fit_small()
    path = str(tmp_path / 'est.pkl')
    save_estimator(df, path)
    df2 = load_estimator(path)
    np.testing.assert_array_equal(df.components_, df2.components_)
    np.testing.assert_array_equal(df.transform(X), df2.transform(X))


def test_pickle_then_resume_training(tmp_path):
    df, X = _fit_small()
    blob = pickle.dumps(df)
    df2 = pickle.loads(blob)
    n_before = df2.n_iter_
    df2.partial_fit(X)  # warm-start resume
    assert df2.n_iter_ == n_before + X.shape[0]


def test_state_save_load_npz(tmp_path):
    df, X = _fit_small()
    path = str(tmp_path / 'state.npz')
    save_state(df._state, path)
    restored = load_state(path, SomfState)
    np.testing.assert_array_equal(np.asarray(df._state.D),
                                  np.asarray(restored.D))
    np.testing.assert_array_equal(np.asarray(df._state.code),
                                  np.asarray(restored.code))
    # fields absent from the run (e.g. G_avg in masked mode) stay None
    assert restored.G_avg is None


def test_state_resume_trajectory_identical(tmp_path):
    """Checkpoint-restart reproduces the uninterrupted trajectory."""
    rng = np.random.RandomState(0)
    X = rng.randn(80, 24)
    df = DictFact(n_components=4, reduction=2, code_alpha=1e-3,
                  comp_l1_ratio=0, batch_size=20, random_state=0)
    df.prepare(n_samples=80, X=X)
    df.partial_fit(X)
    path = str(tmp_path / 'mid.npz')
    save_state(df._state, path)
    df.partial_fit(X)
    D_uninterrupted = df.components_.copy()

    df2 = DictFact(n_components=4, reduction=2, code_alpha=1e-3,
                   comp_l1_ratio=0, batch_size=20, random_state=0)
    df2.prepare(n_samples=80, X=X)
    df2._state = load_state(path, SomfState)
    df2.partial_fit(X)
    np.testing.assert_array_equal(df2.components_, D_uninterrupted)


def test_all_estimators_pickle(tmp_path):
    """Every public estimator pickles after fit and keeps predicting."""
    import scipy.sparse as sp

    from modl_tpu import ImageDictFact, RecsysDictFact, fMRIDictFact
    from modl_tpu.datasets.adhd import make_synthetic_rest_data
    from modl_tpu.datasets.image import make_synthetic_image

    rng = np.random.RandomState(0)

    img = make_synthetic_image(24, 24, patch_size=6, seed=0)
    idf = ImageDictFact(method='masked', n_components=4, batch_size=20,
                        reduction=2, n_epochs=1, patch_size=(5, 5),
                        max_patches=80, random_state=0).fit(img)
    idf2 = pickle.loads(pickle.dumps(idf))
    np.testing.assert_array_equal(idf2.components_, idf.components_)

    Xr = sp.csr_matrix(np.abs(rng.rand(30, 12)))
    mf = RecsysDictFact(n_components=3, n_epochs=1, alpha=0.5,
                        random_state=0).fit(Xr)
    mf2 = pickle.loads(pickle.dumps(mf))
    np.testing.assert_array_equal(mf2.components_, mf.components_)
    np.testing.assert_allclose(mf2.score(Xr), mf.score(Xr), rtol=1e-10)

    data, mask, _ = make_synthetic_rest_data(n_subjects=2, n_frames=15,
                                             shape=(5, 5, 3),
                                             n_networks=3)
    fdf = fMRIDictFact(method='masked', n_components=3, reduction=2,
                       batch_size=5, n_epochs=1, alpha=1e-2, mask=mask,
                       standardize=False, detrend=False,
                       random_state=0).fit(data)
    fdf2 = pickle.loads(pickle.dumps(fdf))
    np.testing.assert_array_equal(fdf2.components_, fdf.components_)
    codes = fdf2.transform(data[:1])
    assert codes[0].shape == (15, 3)


def test_checkpoint_callback(tmp_path):
    from modl_tpu.utils.checkpoint import CheckpointCallback

    rng = np.random.RandomState(0)
    X = rng.randn(60, 24)
    path = str(tmp_path / 'ckpt.npz')
    cb = CheckpointCallback(path, every=1)
    df = DictFact(n_components=4, reduction=2, batch_size=20, verbose=3,
                  n_epochs=2, random_state=0, callback=cb)
    df.fit(X)
    assert cb.n_saved >= 1
    restored = load_state(path, SomfState)
    assert np.asarray(restored.D).shape == (4, 24)


def test_experiment_harness(tmp_path):
    exp = Experiment('toy', output_dir=str(tmp_path))

    @exp.config
    def config():
        return dict(a=1, b='x')

    @exp.main
    def main(a, b, _run):
        _run.info['score'] = a * 2
        return a * 2

    run = exp.run(config_updates={'a': 3})
    assert run.info['score'] == 6
    assert os.path.exists(os.path.join(run.dir, 'config.json'))
    assert os.path.exists(os.path.join(run.dir, 'info.json'))
    rows = Experiment.gather(str(tmp_path))
    assert rows[0]['config']['a'] == 3
    assert rows[0]['run']['status'] == 'COMPLETED'
    # second run gets a fresh directory
    run2 = exp.run()
    assert run2.id == run.id + 1
