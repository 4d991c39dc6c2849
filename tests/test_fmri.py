"""fMRIDictFact tests on synthetic planted spatial components.

Port of modl/decomposition/tests/test_fmri.py (adapted from nilearn's
CanICA tests): 4 planted spatial maps rendered into several subjects of
(8, 8, 1, n) volumes; all methods must recover >= 4 maps at |cos| > 0.95.
NIfTI objects are replaced by 4-D numpy arrays + NumpyMasker (nibabel is
optional and absent in CI).
"""
import numpy as np
import pytest
from sklearn.utils import check_random_state

from modl_tpu.decomposition.fmri import (fMRICoder, fMRIDictFact,
                                         rfMRIDictionaryScorer)
from modl_tpu.input_data.fmri import (MultiRawMasker, NumpyMasker,
                                      create_raw_rest_data,
                                      get_raw_rest_data)

methods = ['masked', 'dictionary only', 'gram', 'average', 'reducing ratio']


def _make_components(shape=(20, 20, 1)):
    # 4 localized signed "activated regions" (reference test geometry)
    components = np.zeros((4,) + shape)
    components[0, :5, :10, 0] = 1
    components[0, 5:10, :10, 0] = -1
    components[1, :5, -10:, 0] = 1
    components[1, 5:10, -10:, 0] = -1
    components[2, -5:, -10:, 0] = 1
    components[2, -10:-5, -10:, 0] = -1
    components[3, -5:, :10, 0] = 1
    components[3, -10:-5, :10, 0] = -1
    return components


def _make_dataset(n_subjects=8, n_frames=40, shape=(20, 20, 1), seed=0):
    rng = check_random_state(seed)
    components = _make_components(shape)
    flat = components.reshape(4, -1)
    data = []
    for _ in range(n_subjects):
        loadings = rng.randn(n_frames, 4)
        noise = rng.randn(n_frames, flat.shape[1]) * 0.01
        X = loadings.dot(flat) + noise
        data.append(X.T.reshape(shape + (n_frames,)))
    mask = np.ones(shape, dtype=bool)
    init = flat + rng.randn(*flat.shape)
    return data, mask, components, init


def _recovered_maps(est_components, true_components):
    flat_true = true_components.reshape(4, -1)
    D = est_components.copy()
    D /= np.sqrt(np.sum(D ** 2, axis=1))[:, None] + 1e-30
    Q = flat_true / np.sqrt(np.sum(flat_true ** 2, axis=1))[:, None]
    G = np.abs(D.dot(Q.T))
    return min(np.sum(np.any(G > 0.95, axis=1)),
               np.sum(np.any(G > 0.95, axis=0)))


@pytest.mark.parametrize("method", methods)
def test_fmri_dict_fact_recovers_components(method):
    data, mask, components, init = _make_dataset()
    dict_fact = fMRIDictFact(method=method, n_components=4, reduction=2,
                             batch_size=20, n_epochs=2, alpha=1,
                             dict_init=init,
                             mask=mask, standardize=False, detrend=False,
                             random_state=0, verbose=0)
    dict_fact.fit(data)
    assert dict_fact.components_.shape == (4, 400)
    maps = _recovered_maps(dict_fact.components_, components)
    assert maps >= 4
    # components_img_ scatters maps back into the volume
    assert dict_fact.components_img_.shape == (20, 20, 1, 4)


def test_fmri_dict_fact_sign_flip():
    data, mask, components, init = _make_dataset()
    dict_fact = fMRIDictFact(method='masked', n_components=4, reduction=2,
                             batch_size=10, n_epochs=2, alpha=1e-3,
                             mask=mask, standardize=False, detrend=False,
                             random_state=0)
    dict_fact.fit(data)
    for comp in dict_fact.components_:
        assert np.sum(comp > 0) >= np.sum(comp < 0)


def test_fmri_transform_score():
    data, mask, components, init = _make_dataset()
    dict_fact = fMRIDictFact(method='masked', n_components=4, reduction=2,
                             batch_size=10, n_epochs=1, alpha=1e-3,
                             mask=mask, standardize=False, detrend=False,
                             random_state=0)
    dict_fact.fit(data)
    codes = dict_fact.transform(data[:2])
    assert len(codes) == 2
    assert codes[0].shape == (40, 4)
    score = dict_fact.score(data[:2])
    assert np.isfinite(score)


def test_fmri_coder_fixed_dictionary():
    data, mask, components, init = _make_dataset()
    flat = components.reshape(4, -1)
    coder = fMRICoder(dictionary=flat, mask=mask, alpha=1e-3,
                      standardize=False, detrend=False)
    coder.fit()
    codes = coder.transform(data[:1])
    assert codes[0].shape == (40, 4)


def test_fmri_scorer_callback():
    data, mask, components, init = _make_dataset()
    scorer = rfMRIDictionaryScorer(test_imgs=data[:2])
    dict_fact = fMRIDictFact(method='masked', n_components=4, reduction=2,
                             batch_size=10, n_epochs=2, alpha=1e-3,
                             mask=mask, standardize=False, detrend=False,
                             random_state=0, verbose=4, callback=scorer)
    dict_fact.fit(data)
    assert len(scorer.score) >= 1
    assert all(np.isfinite(s) for s in scorer.score)


def test_raw_pipeline_roundtrip(tmp_path):
    data, mask, components, init = _make_dataset(n_subjects=3)
    manifest = create_raw_rest_data(data, mask, str(tmp_path),
                                    standardize=False, detrend=False)
    masker, records = get_raw_rest_data(str(tmp_path))
    assert len(records) == 3
    loaded = masker.transform(records[0])
    assert loaded.shape == (40, 400)
    # raw .npy records feed fMRIDictFact directly
    dict_fact = fMRIDictFact(method='masked', n_components=4, reduction=2,
                             batch_size=10, n_epochs=2, alpha=1e-3,
                             mask=mask, standardize=False, detrend=False,
                             random_state=0)
    dict_fact.fit(records)
    assert dict_fact.components_.shape == (4, 400)


def test_multi_raw_masker():
    data, mask, components, init = _make_dataset(n_subjects=2)
    masker = MultiRawMasker(mask_img=mask).fit()
    out = masker.transform(data[0])
    assert out.shape == (40, 400)
    outs = masker.transform(data)
    assert len(outs) == 2


def test_multi_raw_masker_detrends_2d_records():
    """The raw 2-D fast path must apply detrend like the 4-D path."""
    rng = np.random.RandomState(0)
    t = np.arange(50, dtype=float)
    data = np.outer(t, np.full(20, 0.5)) + rng.randn(50, 20) * 0.01
    masker = MultiRawMasker(detrend=True).fit()
    out = masker.transform(data)
    # residual slope after detrending ~ 0
    tc = t - t.mean()
    slope = (tc[:, None] * (out - out.mean(0))).sum(0) / np.sum(tc * tc)
    np.testing.assert_allclose(slope, 0, atol=1e-10)
    # nilearn detrend semantics: the mean is removed along with the trend
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-8)


def test_numpy_masker_standardize_detrend():
    rng = np.random.RandomState(0)
    data = rng.randn(5, 5, 1, 30)
    mask = np.ones((5, 5, 1), bool)
    masker = NumpyMasker(mask_img=mask, standardize=True, detrend=True).fit()
    out = masker.transform(data)
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-10)
    np.testing.assert_allclose(out.std(axis=0), 1, atol=1e-8)
