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


def test_embedded_masker_conflict_warning():
    """A provided masker's params override the estimator's, with a
    warning listing each conflict (reference base.py:110-133)."""
    import warnings

    from modl_tpu.input_data.fmri.base import check_embedded_masker

    mask = np.ones((4, 4, 1), bool)
    provided = NumpyMasker(mask_img=mask, standardize=False, detrend=True,
                           t_r=2.0).fit()
    est = fMRIDictFact(mask=provided, standardize=True, detrend=False,
                       n_components=2)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        masker = check_embedded_masker(est)
    messages = [str(w.message) for w in caught]
    assert any('standardize' in m and 'Overriding' in m for m in messages)
    assert any('detrend' in m for m in messages)
    # masker params won: standardize False, detrend True, t_r carried
    assert masker.standardize is False
    assert masker.detrend is True
    assert masker.t_r == 2.0
    assert hasattr(masker, 'mask_img_')


def test_embedded_masker_forwards_full_param_surface():
    from modl_tpu.input_data.fmri.base import check_embedded_masker

    mask = np.ones((4, 4, 1), bool)
    est = fMRIDictFact(mask=mask, standardize=False, detrend=True,
                       low_pass=0.1, high_pass=0.01, t_r=2.5,
                       mask_strategy='epi', n_jobs=3, verbose=0,
                       memory_level=2, n_components=2)
    masker = check_embedded_masker(est)
    assert masker.low_pass == 0.1
    assert masker.high_pass == 0.01
    assert masker.t_r == 2.5
    assert masker.mask_strategy == 'epi'
    assert masker.n_jobs == 3
    assert masker.memory_level == 1  # estimator level - 1


def test_numpy_masker_butterworth():
    """Band-pass filtering attenuates out-of-band sinusoids."""
    t_r = 1.0
    t = np.arange(256, dtype=float)
    slow = np.sin(2 * np.pi * 0.01 * t)    # below high_pass=0.03
    mid = np.sin(2 * np.pi * 0.1 * t)      # in band
    fast = np.sin(2 * np.pi * 0.4 * t)     # above low_pass=0.2
    data = np.stack([slow, mid, fast], axis=1)[:, None, None, :].T
    data = np.ascontiguousarray(data.reshape(3, 1, 1, 256))
    mask = np.ones((3, 1, 1), bool)
    masker = NumpyMasker(mask_img=mask, low_pass=0.2, high_pass=0.03,
                         t_r=t_r).fit()
    out = masker.transform(data)
    power = (out ** 2).mean(axis=0)
    assert power[1] > 0.3          # in-band survives
    assert power[0] < 0.05 * power[1]
    assert power[2] < 0.05 * power[1]


def test_numpy_masker_filter_requires_t_r():
    mask = np.ones((2, 2, 1), bool)
    masker = NumpyMasker(mask_img=mask, low_pass=0.1).fit()
    with pytest.raises(ValueError, match='t_r'):
        masker.transform(np.random.rand(2, 2, 1, 30))


def test_fmri_transform_parallel_matches_serial():
    """n_jobs > 1 fans record masking out over joblib processes and
    returns identical codes (reference fmri.py:121-124)."""
    data, mask, components, init = _make_dataset(n_subjects=4)
    fd = fMRIDictFact(n_components=4, random_state=0, mask=mask,
                      standardize=False, detrend=False, smoothing_fwhm=None,
                      reduction=2, n_epochs=1, batch_size=20)
    fd.fit(data)
    serial = fd.transform(data)
    fd.n_jobs = 2
    parallel = fd.transform(data)
    assert len(serial) == len(parallel) == len(data)
    for a, b in zip(serial, parallel):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_prepermuted_pipeline_windowed_recovery(tmp_path):
    """feature_order pipelines: records stored in a shuffled voxel
    order, fMRIDictFact auto-switches to windowed subsets, and the
    recovered maps land back in voxel space via the masker."""
    data, mask, components, init = _make_dataset(n_subjects=4)
    create_raw_rest_data(data, mask, str(tmp_path), standardize=False,
                         detrend=False, feature_order=7)
    masker, records = get_raw_rest_data(str(tmp_path))
    assert masker.feature_order_ is not None

    # stored records are permuted; transform of the raw file is identity
    raw = np.load(records[0])
    direct = masker.transform(data[0])
    np.testing.assert_allclose(raw, direct, rtol=1e-6)

    # masker round trip: inverse_transform undoes the shuffle
    flat = components.reshape(4, -1)
    vol = masker.inverse_transform(flat[:, masker.feature_order_])
    np.testing.assert_allclose(np.moveaxis(vol, -1, 0), components)

    dict_fact = fMRIDictFact(method='masked', n_components=4, reduction=4,
                             batch_size=10, n_epochs=3, alpha=1e-3,
                             mask=masker, standardize=False, detrend=False,
                             random_state=0)
    dict_fact.fit(records)
    assert dict_fact.dict_fact_._cfg.windowed
    # components_img_ is back in voxel space: compare against the truth
    maps = np.moveaxis(dict_fact.components_img_, -1, 0).reshape(4, -1)
    assert _recovered_maps(maps, components) >= 4


def test_reducing_ratio_on_prepermuted_pipeline(tmp_path):
    """Round-2 regression: 'reducing ratio' anneals reduction via
    set_params every epoch (reference fmri.py:531-535); on a
    window-ordered pre-permuted pipeline this used to crash on epoch 2
    because the windowed mirror-pad width was baked at prepare time.
    The fit must survive >= 3 epochs and still recover the maps."""
    data, mask, components, init = _make_dataset(n_subjects=4)
    create_raw_rest_data(data, mask, str(tmp_path), standardize=False,
                         detrend=False, feature_order=11)
    masker, records = get_raw_rest_data(str(tmp_path))
    assert masker.feature_order_ is not None

    dict_fact = fMRIDictFact(method='reducing ratio', n_components=4,
                             reduction=4, batch_size=10, n_epochs=3,
                             alpha=1e-3, mask=masker, standardize=False,
                             detrend=False, random_state=0)
    dict_fact.fit(records)
    maps = np.moveaxis(dict_fact.components_img_, -1, 0).reshape(4, -1)
    assert _recovered_maps(maps, components) >= 4


def test_device_clean_matches_host_masker():
    """_clean_device (fused on-device detrend+standardize) must equal
    the NumpyMasker host preprocessing stage-for-stage."""
    import jax.numpy as jnp

    from modl_tpu.decomposition.fmri import _clean_device

    rng = np.random.RandomState(0)
    raw = rng.randn(50, 201) * 3 + rng.randn(1, 201)
    for detrend in (False, True):
        for standardize in (False, True):
            m = NumpyMasker(mask_img=np.ones((201, 1, 1), bool),
                            detrend=detrend, standardize=standardize).fit()
            host = m.transform(raw)
            dev = np.asarray(_clean_device(jnp.asarray(raw), detrend,
                                           standardize, np.float64))
            np.testing.assert_allclose(dev, host, rtol=1e-10, atol=1e-12)


def test_fmri_raw_device_path_matches_host_path():
    """The raw fast path (mask-only host load + device-fused
    detrend/standardize) must reproduce the host-preprocessed fit."""
    from modl_tpu.input_data.fmri.base import NumpyMasker as NM

    class HostOnlyMasker(NM):
        # hide transform_raw so the driver takes the host path
        transform_raw = property()

    data, mask, components, init = _make_dataset(n_subjects=4)
    out = {}
    for name, mask_arg in (('raw', mask),
                           ('host', HostOnlyMasker(mask_img=mask,
                                                   standardize=True,
                                                   detrend=True).fit())):
        fd = fMRIDictFact(method='masked', n_components=4, reduction=2,
                          batch_size=10, n_epochs=2, alpha=1e-3,
                          mask=mask_arg, standardize=True, detrend=True,
                          random_state=0)
        fd.fit(data)
        out[name] = fd.components_
    np.testing.assert_allclose(out['raw'], out['host'],
                               rtol=1e-7, atol=1e-9)


def test_numpy_masker_auto_fit_on_2d_records():
    """Auto-fitting the masker (mask=None) on already-masked 2-D
    (t, voxels) records must infer n_voxels from the COLUMN count —
    a variance mask over axis -1 would measure per-frame variance and
    prepare the learner at n_frames width (round-3 verify regression:
    fMRIDictFact then crashed on the first partial_fit)."""
    rng = np.random.RandomState(0)
    imgs = [rng.randn(40, 500).astype(np.float32) for _ in range(3)]
    masker = NumpyMasker(standardize=True, detrend=True)
    masker.fit(imgs)
    assert masker.n_voxels_ == 500
    assert masker.transform(imgs[0]).shape == (40, 500)

    from modl_tpu import fMRIDictFact
    fm = fMRIDictFact(n_components=5, reduction=2, n_epochs=1,
                      mask=NumpyMasker(), batch_size=20, random_state=0,
                      method='masked', verbose=0)
    fm.fit(imgs)
    assert fm.components_.shape == (5, 500)


def test_record_cache_multi_epoch(tmp_path, monkeypatch):
    """Cross-epoch device-resident record cache (fmri.py::_RecordCache):
    a multi-epoch raw-path fit must (a) replay every record from HBM in
    epochs >= 2 (hits == (n_epochs - 1) * n_records), (b) produce the
    bitwise-identical trajectory to a cache-disabled fit (the cache
    stores the exact device array the stream produced), and (c) survive
    LRU eviction under a budget smaller than the record set."""
    import modl_tpu.decomposition.fmri as fmri_mod

    data, mask, components, init = _make_dataset(n_subjects=3)
    create_raw_rest_data(data, mask, str(tmp_path), standardize=False,
                         detrend=False)
    masker, records = get_raw_rest_data(str(tmp_path))

    def run():
        fd = fMRIDictFact(method='masked', n_components=4, reduction=2,
                          batch_size=10, n_epochs=3, alpha=1e-3,
                          mask=masker, standardize=False, detrend=False,
                          random_state=0)
        fd.fit(records)
        return fd

    fd_cached = run()
    info = fd_cached.record_cache_info_
    assert info['misses'] == len(records)              # epoch 1 only
    assert info['hits'] == 2 * len(records)            # epochs 2-3
    assert info['resident_bytes'] > 0

    monkeypatch.setattr(fmri_mod, 'RECORD_CACHE_BYTES', 0)
    fd_off = run()
    assert not hasattr(fd_off, 'record_cache_info_')
    np.testing.assert_array_equal(fd_cached.components_,
                                  fd_off.components_)

    # budget fits ~1 record -> constant eviction, trajectory unchanged
    one_record = 40 * 400 * np.dtype(np.float32).itemsize
    monkeypatch.setattr(fmri_mod, 'RECORD_CACHE_BYTES', one_record + 1)
    fd_small = run()
    info = fd_small.record_cache_info_
    assert info['resident_bytes'] <= one_record + 1
    assert info['misses'] > len(records)               # evictions re-miss
    np.testing.assert_array_equal(fd_small.components_,
                                  fd_off.components_)
