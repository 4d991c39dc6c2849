"""Host-RAM offload of the per-sample 'average' EMA state.

The reference spills ``G_average_`` to an np.memmap
(dict_fact.py:431-439); the TPU-native counterpart keeps it in
pinned_host memory with host-compute gathers/scatters per batch.
Trajectories must match the HBM-resident path bitwise.
"""
import numpy as np
import pytest

import jax

from modl_tpu import DictFact


from modl_tpu.decomposition._step import offload_supported

_SUPPORTED = offload_supported()


@pytest.mark.skipif(not _SUPPORTED,
                    reason='backend cannot execute host placement '
                           '(CPU runtime); covered on TPU')
def test_average_offload_matches_resident():
    rng = np.random.RandomState(0)
    X = rng.randn(80, 24)
    kwargs = dict(n_components=4, reduction=2, code_alpha=1e-3,
                  comp_l1_ratio=0, Dx_agg='average', G_agg='average',
                  n_epochs=2, batch_size=16, random_state=0)
    ref = DictFact(**kwargs).fit(X)
    off = DictFact(average_offload=True, **kwargs).fit(X)
    np.testing.assert_array_equal(off.components_, ref.components_)
    np.testing.assert_allclose(off.G_average_, ref.G_average_,
                               atol=1e-12)
    np.testing.assert_allclose(off.Dx_average_, ref.Dx_average_,
                               atol=1e-12)
    # the offloaded state actually lives in host memory
    assert off._state.G_avg.sharding.memory_kind == 'pinned_host'


def test_average_offload_on_mesh_shards_instead():
    """On a mesh, average_offload is subsumed by dp sharding of the
    per-sample statistics (parallel/mesh.py::_spec_for_leaf): the fit
    runs the resident sharded step and must match the single-device
    resident trajectory (to SPMD reduction-order roundoff)."""
    from modl_tpu.parallel import make_mesh
    rng = np.random.RandomState(0)
    X = rng.randn(80, 24)
    kwargs = dict(n_components=4, reduction=2, code_alpha=1e-3,
                  comp_l1_ratio=0, Dx_agg='average', G_agg='average',
                  n_epochs=2, batch_size=16, random_state=0)
    ref = DictFact(**kwargs).fit(X)
    df = DictFact(average_offload=True,
                  mesh=make_mesh(n_dp=8, n_feat=1), **kwargs)
    df.fit(X)
    assert not df._cfg.average_offload  # offload machinery disabled
    np.testing.assert_allclose(df.components_, ref.components_,
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(df.G_average_, ref.G_average_,
                               rtol=1e-10, atol=1e-12)
    # the big per-sample array is actually split over the dp axis
    from jax.sharding import PartitionSpec as P
    assert df._state.G_avg.sharding.spec == P('dp')


def test_average_offload_rejects_unsupported_backend():
    if not _SUPPORTED:
        rng = np.random.RandomState(0)
        X = rng.randn(40, 16)
        df2 = DictFact(n_components=4, Dx_agg='average', G_agg='average',
                       average_offload=True, random_state=0)
        with pytest.raises(ValueError):
            df2.prepare(n_samples=40, X=X)
