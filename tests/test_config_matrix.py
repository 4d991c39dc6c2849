"""Config-matrix smoke sweep over the DictFact surface.

Cross-product fuzz of the solver configuration space on small planted
data: every combination must fit, produce finite components respecting
the ball geometry, transform, and score. This is breadth insurance -
the parity/quality suites pin exact values for the canonical configs;
this sweep catches shape/branch bugs in the long tail (odd feature
counts, window wrap edges, rand_size x windowed x aggregator x
optimizer interactions).
"""
import numpy as np
import pytest

from modl_tpu import DictFact


def _data(n=150, n_features=217, k=5, seed=0):
    # deliberately odd n_features: window wrap + pad edges
    rng = np.random.RandomState(seed)
    return (rng.randn(n, k) @ rng.randn(k, n_features)).astype(np.float32)


AGGS = [('masked', 'masked'), ('full', 'full'), ('average', 'average'),
        ('average', 'masked'), ('masked', 'full')]


@pytest.mark.parametrize('Dx_agg,G_agg', AGGS)
@pytest.mark.parametrize('sampling', ['gather', 'window'])
@pytest.mark.parametrize('rand_size,replacement',
                         [(False, True), (True, True), (False, False),
                          (True, False)])
def test_fit_matrix_variational(Dx_agg, G_agg, sampling, rand_size,
                                replacement):
    X = _data()
    df = DictFact(n_components=5, reduction=3, code_alpha=1e-3,
                  code_l1_ratio=0, comp_l1_ratio=0, random_state=0,
                  batch_size=32, n_epochs=2, Dx_agg=Dx_agg, G_agg=G_agg,
                  rand_size=rand_size, replacement=replacement,
                  subset_sampling=sampling)
    df.fit(X)
    D = df.components_
    assert D.shape == (5, X.shape[1])
    assert np.all(np.isfinite(D))
    # l2-ball geometry: every atom inside the unit ball
    assert np.all(np.sum(D ** 2, axis=1) <= 1.0 + 1e-4)
    code = df.transform(X[:20])
    assert code.shape == (20, 5) and np.all(np.isfinite(code))
    assert np.isfinite(df.score(X[:20]))


@pytest.mark.parametrize('sampling', ['gather', 'window'])
@pytest.mark.parametrize('comp_l1_ratio', [1.0, 0.5])
@pytest.mark.parametrize('code_l1_ratio', [0.0, 1.0])
def test_fit_matrix_geometries(sampling, comp_l1_ratio, code_l1_ratio):
    X = _data()
    df = DictFact(n_components=5, reduction=3, code_alpha=1e-2,
                  code_l1_ratio=code_l1_ratio,
                  comp_l1_ratio=comp_l1_ratio, random_state=0,
                  batch_size=32, n_epochs=2, subset_sampling=sampling)
    df.fit(X)
    D = df.components_
    assert np.all(np.isfinite(D))
    # enet-ball budget: l1_ratio*|d|_1 + (1-l1_ratio)*|d|_2^2 <= 1
    enet = (comp_l1_ratio * np.abs(D).sum(1)
            + (1 - comp_l1_ratio) * (D ** 2).sum(1))
    assert np.all(enet <= 1.0 + 1e-3)


@pytest.mark.parametrize('sampling', ['gather', 'window'])
def test_fit_matrix_sgd_and_pos(sampling):
    X = np.abs(_data())
    df = DictFact(n_components=5, reduction=3, code_alpha=1e-3,
                  code_l1_ratio=0, comp_l1_ratio=0, optimizer='sgd',
                  step_size=1e-3, random_state=0, batch_size=32,
                  n_epochs=2, subset_sampling=sampling)
    df.fit(X)
    assert np.all(np.isfinite(df.components_))

    # NMF setting: positive dictionary + positive codes. code_pos is
    # honored on the l1/enet code path; with code_l1_ratio=0 the ridge
    # Cholesky ignores it, exactly like the reference's posv branch
    # (dict_fact_fast.pyx:174-197).
    df2 = DictFact(n_components=5, reduction=3, code_alpha=1e-3,
                   code_l1_ratio=1, comp_l1_ratio=0, comp_pos=True,
                   code_pos=True, random_state=0, batch_size=32,
                   n_epochs=2, subset_sampling=sampling)
    df2.fit(X)
    assert np.all(df2.components_ >= 0)
    assert np.all(df2.transform(X[:10]) >= -1e-7)


@pytest.mark.parametrize('sampling', ['gather', 'window'])
def test_fit_matrix_odd_batches_and_partial(sampling):
    # n not divisible by batch_size: scan path + tail single batch
    X = _data(n=113)
    df = DictFact(n_components=5, reduction=3, code_alpha=1e-3,
                  code_l1_ratio=0, random_state=0, batch_size=32,
                  n_epochs=2, subset_sampling=sampling)
    df.fit(X)
    assert df.n_iter_ == 113 * 2
    # mid-run G upgrade then keep fitting (the 'gram' method hook)
    df.set_params(G_agg='full')
    df.partial_fit(X[:64], np.arange(64))
    assert np.all(np.isfinite(df.components_))
