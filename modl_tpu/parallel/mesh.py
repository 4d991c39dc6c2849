"""Device-mesh data parallelism for the SOMF step.

The reference's only parallelism is an intra-node thread pool splitting
minibatches + a 2-task dict/B split (dict_fact.py:535-543, SURVEY 2.3).
The TPU-native counterpart is SPMD over a ``jax.sharding.Mesh``:

- ``dp`` axis: minibatch rows sharded over devices. The per-device code
  solves are independent; the ``code^T @ X`` / ``code^T @ code``
  contractions over the sharded batch axis make XLA insert the psum that
  reduces per-device B/C contributions over ICI — exactly the SOMF
  data-parallel statistics reduction.
- ``feat`` axis: the wide feature dimension of D, B and X is sharded
  (the tensor-parallel analog for this model family: fMRI has ~2e5
  voxels). The BCD dictionary update is feature-separable given C, so
  the only communication is the k x k Gram psums.

Shardings are expressed as ``NamedSharding`` constraints on the state
pytree + inputs; the single jitted ``somf_step`` is reused unchanged —
XLA's sharding propagation does the rest (GSPMD, no hand-written
collectives needed at this layer).
"""
import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_state", "shard_batch", "shard_batches",
           "shard_indices", "replicate", "config_for_mesh"]


def config_for_mesh(cfg, mesh):
    """Adapt a SomfConfig for sharded execution: record the mesh so the
    step's Pallas BCD kernel call is wrapped in ``shard_map`` with
    replicated specs (GSPMD has no partitioning rule for the custom
    call; `_step.py::_bcd_kernel_call`). ``use_pallas`` keeps whatever
    the backend decided (already False on CPU)."""
    import dataclasses
    return dataclasses.replace(cfg, mesh=mesh)


def make_mesh(n_dp=None, n_feat=1, devices=None):
    """Build a ('dp', 'feat') mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n_devices = len(devices)
    if n_dp is None:
        n_dp = n_devices // n_feat
    if n_dp * n_feat != n_devices:
        raise ValueError('n_dp * n_feat (%d*%d) != n_devices (%d)'
                         % (n_dp, n_feat, n_devices))
    dev_array = np.array(devices).reshape(n_dp, n_feat)
    return Mesh(dev_array, ('dp', 'feat'))


def _spec_for_leaf(path, leaf, mesh):
    """PartitionSpec for each SomfState field (by field name)."""
    name = path[0].name if path else ''
    feature_sharded = {'D': P(None, 'feat'), 'B': P(None, 'feat'),
                       'box': P()}
    # per-sample statistics shard their n_samples axis over dp: the
    # 'average' aggregators' G_average_ is (n_samples, k, k) — the one
    # state leaf that grows with the dataset, and the reason the
    # reference spills it to np.memmap (dict_fact.py:431-439). On a
    # mesh, dp sharding gives the same per-device memory relief
    # (n_samples * k^2 * 4 / dp bytes) without host round trips; the
    # step's gather/EMA/scatter at the batch's global sample indices
    # stays a pure layout change under GSPMD (trajectory pinned ==
    # single-device by tests/test_parallel.py).
    sample_sharded = {'code', 'Dx_avg', 'G_avg', 'sample_n_iter'}
    if name in feature_sharded:
        spec = feature_sharded[name]
        # replicate instead of erroring when the feature axis does not
        # split evenly (windowed storage is padded to a feat multiple in
        # DictFact.prepare; gather-mode widths may not divide)
        if ('feat' in spec
                and leaf.shape[-1] % mesh.shape.get('feat', 1) != 0):
            return P()
        return spec
    if name in sample_sharded:
        if _dp_ok(leaf.shape[0], mesh):
            return P('dp')
        return P()
    return P()


def shard_state(state, mesh):
    """Place a SomfState on the mesh: D/B feature-sharded, per-sample
    statistics dp-sharded, the rest replicated."""
    def place(path, leaf):
        spec = _spec_for_leaf(path, leaf, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, state)


def _dp_ok(size, mesh):
    return size % mesh.shape.get('dp', 1) == 0


def _feat_ok(size, mesh):
    return size % mesh.shape.get('feat', 1) == 0


def shard_batch(X, mesh, feat=False):
    """Shard a (b, n_features) minibatch: rows over dp, optionally
    features over feat. Batches not divisible by dp stay replicated on
    the row axis (the odd remainder batch of an epoch); likewise a
    non-divisible feature axis stays replicated."""
    dp = 'dp' if _dp_ok(X.shape[0], mesh) else None
    ft = 'feat' if feat and _feat_ok(X.shape[-1], mesh) else None
    return jax.device_put(X, NamedSharding(mesh, P(dp, ft)))


def shard_batches(Xb, mesh, feat=False):
    """Shard stacked (n_batches, b, n_features) minibatches for scan."""
    dp = 'dp' if _dp_ok(Xb.shape[1], mesh) else None
    ft = 'feat' if feat and _feat_ok(Xb.shape[-1], mesh) else None
    return jax.device_put(Xb, NamedSharding(mesh, P(None, dp, ft)))


def shard_indices(idx, mesh):
    """Shard (n_batches, b) or (b,) sample-index arrays over dp."""
    b = idx.shape[-1]
    dp = 'dp' if _dp_ok(b, mesh) else None
    spec = P(None, dp) if idx.ndim == 2 else P(dp)
    return jax.device_put(idx, NamedSharding(mesh, spec))


def replicate(x, mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
