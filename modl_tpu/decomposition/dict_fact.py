"""DictFact: sklearn-compatible SOMF/OMF estimator over the jitted core.

Public API mirrors the reference ``modl/decomposition/dict_fact.py``
(``DictFact``, ``Coder``, ``CodingMixin``: fit / partial_fit / prepare /
transform / score / shuffle / set_params, same hyper-parameter names and
semantics). Internals are TPU-native: all learner state is a
``SomfState`` pytree updated by one jitted step; epochs without callbacks
run as a fused ``lax.scan`` over device-resident minibatches.

Deviations from the reference (documented):
- ``rand_size=True`` (Binomial subset sizes, sampler.pyx:44-47, the
  reference default) draws ``m ~ Binomial(n, 1/reduction)`` per step
  like the reference, emulated under jit as a static-width window plus
  a traced validity count (TPU programs need static shapes); draws are
  capped at mean + 8 std (P < 1e-14) and at least 1.
- ``n_threads`` is accepted and ignored: parallelism comes from XLA
  fusion and (optionally) a device mesh, not a thread pool.
- RNG is numpy (host orchestration) + threefry (traced sampler/BCD order)
  instead of MT19937: seeds give self-consistent reproducibility, not
  bit-parity with the reference.
- ``subset_sampling='auto'`` draws subsets as circular windows of ONE
  fixed random feature order for resident fits (``'window'`` forces it,
  ``'gather'`` restores per-draw reshuffled subsets). Per-feature
  inclusion stays exactly uniform at 1/reduction and cycling windows
  tile the feature circle like the reference's partition
  (sampler.pyx:49-52), but the reference reshuffles its box between
  cycles while the windowed order is fixed per fit - the collection of
  reachable subsets is n windows rather than C(n, s). Step math given
  the subset is identical (tests/test_windowed.py); the payoff is
  ~2x end-to-end on TPU (docs/performance.md).
"""
import numpy as np

import jax
import jax.numpy as jnp
from sklearn.base import BaseEstimator, TransformerMixin
from sklearn.utils import check_array, check_random_state, gen_batches
from sklearn.utils.validation import check_is_fitted

from ..ops.enet import enet_scale
from ..ops.sampler import init_sampler_state
from ..utils.system import enable_compilation_cache
from ._step import (SomfConfig, SomfState, apply_permutation, compute_code,
                    objective_value, somf_scan, somf_step_jit)

MAX_INT = np.iinfo(np.int32).max

# transient device residency budget for the segmented offload scan:
# one segment gathers (seg * batch_size, k, k) G_avg rows to HBM
OFFLOAD_SEG_BYTES = 512 * 1024 * 1024


def _default_dtype(dtype):
    """Map requested dtype through JAX's x64 policy."""
    dtype = np.dtype(dtype)
    if dtype == np.float64 and not jax.config.jax_enable_x64:
        return np.dtype(np.float32)
    if dtype not in (np.dtype(np.float32), np.dtype(np.float64),
                     np.dtype(jnp.bfloat16)):
        return np.dtype(np.float32)
    return dtype


def _state_to_host(st):
    return {f: (np.asarray(getattr(st, f))
                if getattr(st, f) is not None else None)
            for f in st._fields}


def _state_from_host(d):
    return SomfState(**{f: (jnp.asarray(v) if v is not None else None)
                        for f, v in d.items()})


class _PickleStateMixin:
    """Pickle device state as host numpy so estimators saved on one
    backend restore on another (replaces the reference's thread-pool
    exclusion on pickling, dict_fact.py:116-124)."""

    def __getstate__(self):
        state = dict(self.__dict__)
        st = state.get('_state')
        if st is not None:
            state['_state'] = ('__somf_state__', _state_to_host(st))
        state['mesh'] = None  # device meshes don't survive pickling
        cfg = state.get('_cfg')
        if cfg is not None and getattr(cfg, 'mesh', None) is not None:
            import dataclasses
            state['_cfg'] = dataclasses.replace(cfg, mesh=None)
        state['_offload_fns'] = None  # jitted callables don't pickle
        return state

    def __setstate__(self, state):
        st = state.get('_state')
        if isinstance(st, tuple) and st and st[0] == '__somf_state__':
            state['_state'] = _state_from_host(st[1])
        self.__dict__ = state
        # re-establish host placement for offloaded state (or drop the
        # flag when the restoring backend can't execute host placement)
        cfg = getattr(self, '_cfg', None)
        st = getattr(self, '_state', None)
        if cfg is not None and cfg.average_offload and st is not None:
            from ._step import _mem_sharding, offload_supported
            if offload_supported() and st.G_avg is not None:
                self._state = st._replace(G_avg=jax.device_put(
                    st.G_avg, _mem_sharding('pinned_host')))
            else:
                import dataclasses
                self._cfg = dataclasses.replace(cfg,
                                                average_offload=False)
                self.average_offload = False


class CodingMixin(TransformerMixin):
    """Shared transform/score over a fitted dictionary
    (dict_fact.py:23-124)."""

    def _set_coding_params(self, n_components,
                           code_alpha=1, code_l1_ratio=1, tol=1e-2,
                           max_iter=100, code_pos=False, random_state=None,
                           n_threads=1):
        self.n_components = n_components
        self.code_l1_ratio = code_l1_ratio
        self.code_alpha = code_alpha
        self.code_pos = code_pos
        self.random_state = random_state
        self.tol = tol
        self.max_iter = max_iter
        self.n_threads = n_threads  # accepted for API parity; XLA parallelises

    def _code_solver(self):
        cfg = getattr(self, '_cfg', None)
        if cfg is not None:
            return cfg.code_solver
        solver = getattr(self, 'code_solver', 'auto')
        if solver == 'auto':
            import jax as _jax
            return 'fista' if _jax.default_backend() != 'cpu' else 'cd'
        return solver

    def _transform_gram(self):
        """G to use at transform time: the maintained Gram iff exact."""
        if getattr(self, 'G_agg', None) == 'full' and hasattr(self, '_state') \
                and self._state.G is not None:
            return self._state.G
        return None

    def transform(self, X, batch_size=None):
        """Codes for rows of X on the current dictionary (b, k).

        ``batch_size`` (or ``self.transform_batch_size`` when set) chunks
        the rows to bound device memory on very large inputs."""
        check_is_fitted(self, 'components_')
        D = self._components_device()
        X = np.asarray(X)
        G = self._transform_gram()
        batch_size = batch_size or getattr(self, 'transform_batch_size',
                                           None)
        if batch_size is None or X.shape[0] <= batch_size:
            code = compute_code(D, G, jnp.asarray(X, D.dtype),
                                float(self.code_l1_ratio),
                                float(self.code_alpha),
                                bool(self.code_pos),
                                float(self.tol), int(self.max_iter),
                                solver=self._code_solver())
            return np.asarray(code)
        # allocate in the components dtype: the device solve runs in
        # D.dtype, so X.dtype (int / float64) would silently truncate
        # and diverge from the non-batched path
        out = np.empty((X.shape[0], self.n_components), np.dtype(D.dtype))
        for batch in gen_batches(X.shape[0], batch_size):
            out[batch] = np.asarray(compute_code(
                D, G, jnp.asarray(X[batch], D.dtype),
                float(self.code_l1_ratio), float(self.code_alpha),
                bool(self.code_pos), float(self.tol),
                int(self.max_iter), solver=self._code_solver()))
        return out

    def score(self, X):
        """Penalised objective on X (lower is better), dict_fact.py:94-114."""
        check_is_fitted(self, 'components_')
        D = self._components_device()
        X = jnp.asarray(np.asarray(X), D.dtype)
        G = self._transform_gram()
        return float(objective_value(D, G, X, float(self.code_l1_ratio),
                                     float(self.code_alpha),
                                     bool(self.code_pos), float(self.tol),
                                     int(self.max_iter),
                                     solver=self._code_solver()))

    def _components_device(self):
        if hasattr(self, '_state') and self._state is not None:
            D = self._state.D
            if getattr(getattr(self, '_cfg', None), 'windowed', False):
                # stored order -> logical feature order (drops the pad)
                D = jnp.take(D, jnp.asarray(self._feat_inv), axis=1)
            return D
        return jnp.asarray(self.components_)


class DictFact(_PickleStateMixin, CodingMixin, BaseEstimator):
    """Streaming matrix factorisation with stochastic subsampling (SOMF).

    Solves, over a stream of sample rows,
        min_{D in enet-ball^k, A}  1/2 ||X - A D||^2
            + code_alpha * (code_l1_ratio ||A||_1
                            + (1 - code_l1_ratio)/2 ||A||_2^2)
    touching only ``n_features / reduction`` random feature columns per
    step. Parameters, attributes and methods mirror the reference
    ``DictFact`` (dict_fact.py:127-721); see module docstring for the
    documented deviations.
    """

    def __init__(self,
                 reduction=1,
                 learning_rate=1,
                 sample_learning_rate=0.76,
                 Dx_agg='masked',
                 G_agg='masked',
                 optimizer='variational',
                 dict_init=None,
                 code_alpha=1,
                 code_l1_ratio=1,
                 comp_l1_ratio=0,
                 step_size=1,
                 tol=1e-2,
                 max_iter=100,
                 code_pos=False,
                 comp_pos=False,
                 random_state=None,
                 n_epochs=1,
                 n_components=10,
                 batch_size=10,
                 verbose=0,
                 callback=None,
                 n_threads=1,
                 rand_size=True,
                 replacement=True,
                 dtype=None,
                 mesh=None,
                 code_solver='auto',
                 average_offload=False,
                 subset_sampling='auto',
                 ):
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.sample_learning_rate = sample_learning_rate
        self.Dx_agg = Dx_agg
        self.G_agg = G_agg
        self.reduction = reduction
        self.dict_init = dict_init
        self._set_coding_params(n_components,
                                code_l1_ratio=code_l1_ratio,
                                code_alpha=code_alpha,
                                code_pos=code_pos,
                                random_state=random_state,
                                tol=tol, max_iter=max_iter,
                                n_threads=n_threads)
        self.comp_l1_ratio = comp_l1_ratio
        self.comp_pos = comp_pos
        self.optimizer = optimizer
        self.step_size = step_size
        self.n_epochs = n_epochs
        self.verbose = verbose
        self.callback = callback
        self.rand_size = rand_size
        self.replacement = replacement
        self.dtype = dtype
        self.mesh = mesh
        self.code_solver = code_solver
        self.average_offload = average_offload
        self.subset_sampling = subset_sampling

    # ------------------------------------------------------------------ #
    # state plumbing
    # ------------------------------------------------------------------ #

    def _make_config(self, n_features, dtype=None):
        reduction = float(self.reduction)
        if self.optimizer == 'sgd':
            reduction = 1.0
        len_subset = max(1, int(n_features / reduction))
        G_agg = self.G_agg
        Dx_agg = self.Dx_agg
        if self.optimizer == 'sgd':
            G_agg, Dx_agg = 'full', 'full'
        if dtype is None:
            dtype = getattr(self, '_dtype', np.float32)
        # VMEM-resident Pallas BCD kernel: TPU backends, f32. Under a
        # mesh the kernel call runs replicated inside shard_map
        # (_step.py::_bcd_kernel_call) - decided here so mid-run
        # set_params rebuilds stay consistent
        use_pallas = (jax.default_backend() not in ('cpu',)
                      and np.dtype(dtype) == np.float32)
        # Binomial subset sizes (sampler.pyx:44-47): emulated under jit
        # by a fixed-width window + traced validity count. Only
        # meaningful when there is actual subsampling.
        rand_size = bool(self.rand_size) and len_subset < n_features
        from ..ops.sampler import binomial_len_max
        len_max = (binomial_len_max(n_features, len_subset)
                   if rand_size else len_subset)
        code_solver = self.code_solver
        if code_solver == 'auto':
            # sequential coordinate loops are loop-overhead-bound on
            # accelerators; FISTA solves the same convex problem with
            # batched MXU matmuls. CPU keeps reference-exact CD.
            code_solver = ('fista' if jax.default_backend() != 'cpu'
                           else 'cd')
        # Windowed subsets (ops/sampler.py::draw_window): one fixed
        # random feature order per fit, subsets are circular windows of
        # it -> dynamic_slice instead of gathers (TPU gathers run at
        # ~1% of HBM bandwidth at these shapes). 'auto' engages it for
        # resident fits (fit(), or somf_scan driving); streaming callers
        # pay a per-batch ingestion permute, so they opt in explicitly.
        want = getattr(self, 'subset_sampling', 'auto')
        # 'window-ordered': the caller guarantees the arrival order of
        # feature columns is already a fixed random shuffle (e.g. a
        # pre-permuted unmask pipeline, input_data/fmri/rest.py), so
        # windows need no ingestion permute - only the mirror pad
        windowed = (want in ('window', 'window-ordered')
                    or (want == 'auto'
                        and getattr(self, '_resident_fit', False)))
        # feat-sharded meshes: windows compose with the feature axis via
        # shard-local reads + a (rows, width) psum and a shard-local
        # write-back chain (_step.py::_window_cols_feat /
        # _windowed_writeback_feat) — never a full-width collective. The
        # machinery needs every shard to hold at least one full window
        # (the stored width, padded up to a feat multiple in prepare,
        # split per device); pathological meshes (feat wider than
        # n_features/width) fall back to gather mode.
        n_feat = (1 if self.mesh is None
                  else self.mesh.shape.get('feat', 1))
        n_stored = n_features + len_max
        n_stored += (-n_stored) % n_feat
        mesh_ok = n_feat == 1 or n_stored // n_feat >= len_max
        windowed = (windowed and mesh_ok
                    and len_subset < n_features
                    and n_features >= 2 * len_max)
        return SomfConfig(
            n_components=int(self.n_components),
            len_subset=len_subset,
            reduction=reduction,
            Dx_agg=Dx_agg,
            G_agg=G_agg,
            optimizer=self.optimizer,
            learning_rate=float(self.learning_rate),
            sample_learning_rate=float(self.sample_learning_rate),
            step_size=float(self.step_size),
            code_alpha=float(self.code_alpha),
            code_l1_ratio=float(self.code_l1_ratio),
            comp_l1_ratio=float(self.comp_l1_ratio),
            code_pos=bool(self.code_pos),
            comp_pos=bool(self.comp_pos),
            tol=float(self.tol),
            max_iter=int(self.max_iter),
            replacement=bool(self.replacement),
            rand_size=rand_size,
            len_max=len_max,
            use_pallas=use_pallas,
            code_solver=code_solver,
            # on a mesh the host-offload machinery is replaced by dp
            # sharding of the per-sample statistics (parallel/mesh.py::
            # _spec_for_leaf): G_average_ is split over devices, which
            # is the same memory relief host offload exists for, without
            # host round trips — so the segmented-offload code paths are
            # disabled and the fit runs the resident step.
            average_offload=bool(self.average_offload)
            and self.mesh is None,
            windowed=windowed,
            n_features=int(n_features) if windowed else 0,
        )

    def prepare(self, n_samples=None, n_features=None, dtype=None, X=None):
        """Allocate all learner state (dict_fact.py:381-489)."""
        enable_compilation_cache()
        if X is not None:
            X = check_array(X, order='C', dtype=[np.float32, np.float64])
            if dtype is None:
                dtype = X.dtype
            if n_samples is None:
                n_samples = X.shape[0]
            if n_features is None:
                n_features = X.shape[1]
            elif n_features != X.shape[1]:
                raise ValueError('n_features and X do not match')
        else:
            if n_features is None or n_samples is None:
                raise ValueError('Either provide shape or data to prepare.')
            if dtype is None:
                dtype = np.float64
        if self.optimizer not in ('variational', 'sgd'):
            raise ValueError("optimizer should be 'variational' or 'sgd'")
        if self.dtype is not None:
            dtype = self.dtype
        dtype = _default_dtype(dtype)

        self.random_state = check_random_state(self.random_state)
        k = self.n_components

        # dictionary init: first k rows of X (dict_fact.py:459-461) or randn
        if X is None:
            D0 = self.random_state.randn(k, n_features)
        else:
            if X.shape[0] < k:
                raise ValueError('Need at least n_components rows to init')
            D0 = np.array(X[:k], dtype=np.float64, copy=True)
        if self.comp_pos:
            D0 = np.abs(D0)
        D0 = np.asarray(D0, dtype)
        D = enet_scale(jnp.asarray(D0), float(self.comp_l1_ratio), radius=1.0)

        cfg = self._make_config(n_features, dtype)
        self._cfg = cfg
        self._n_features = int(n_features)
        self._n_samples = int(n_samples)
        self._dtype = dtype

        sampler_seed = self.random_state.randint(MAX_INT)
        key = jax.random.PRNGKey(sampler_seed)
        key, box_key = jax.random.split(key)
        box, cursor = init_sampler_state(n_features, box_key)

        G = (D @ D.T).astype(dtype) if cfg.G_agg == 'full' else None

        # windowed subsets: store D/B in the fixed random feature order
        # (the box permutation) with a mirror pad of the window width so
        # circular windows are contiguous (_step.py::_subset_cols)
        width = cfg.len_max if cfg.rand_size else cfg.len_subset
        if cfg.windowed:
            if getattr(self, 'subset_sampling', 'auto') == 'window-ordered':
                # arrival order is already shuffled upstream: identity
                # permutation, zero-cost ingestion (mirror pad only)
                self._feat_perm = np.arange(n_features)
                self._feat_inv = self._feat_perm
                D = jnp.asarray(D, dtype)
            else:
                self._feat_perm = np.asarray(box)
                inv = np.empty(n_features, np.int64)
                inv[self._feat_perm] = np.arange(n_features)
                self._feat_inv = inv
                D = jnp.take(jnp.asarray(D, dtype),
                             jnp.asarray(self._feat_perm), axis=1)
            D = jnp.concatenate([D, D[:, :width]], axis=1)
            extra = self._windowed_extra_pad(n_features, width)
            if extra:
                # feat-sharded meshes: zero columns beyond the mirror pad
                # make the stored width an even feat multiple; windows
                # never read them and every full-width op is linear in
                # zero columns, so they stay exactly zero
                D = jnp.pad(D, ((0, 0), (0, extra)))
            B0 = jnp.zeros((k, n_features + width + extra), dtype)
        else:
            self._feat_perm = self._feat_inv = None
            B0 = jnp.zeros((k, n_features), dtype)

        self._offload_fns = None

        def _avg_alloc(shape):
            if cfg.average_offload:
                from ._step import offload_supported
                if not offload_supported():
                    raise ValueError(
                        'average_offload requires a backend with host '
                        'memory-placement support (TPU); this backend '
                        'cannot execute it')
                # host-RAM residency (the reference's np.memmap spill for
                # G_average_, dict_fact.py:431-439): allocate host-side -
                # a transient device jnp.zeros would OOM at exactly the
                # scales offload exists for
                return jax.device_put(
                    np.zeros(shape, dtype),
                    jax.sharding.SingleDeviceSharding(
                        jax.devices()[0], memory_kind='pinned_host'))
            return jnp.zeros(shape, dtype)

        Dx_avg = (jnp.zeros((n_samples, k), dtype)
                  if cfg.Dx_agg == 'average' else None)
        G_avg = (_avg_alloc((n_samples, k, k))
                 if cfg.G_agg == 'average' else None)

        self._state = SomfState(
            D=jnp.asarray(D, dtype),
            C=jnp.zeros((k, k), dtype),
            B=B0,
            G=G,
            comp_norm=jnp.zeros((k,), dtype),
            code=jnp.ones((n_samples, k), dtype),
            Dx_avg=Dx_avg,
            G_avg=G_avg,
            n_iter=jnp.zeros((), jnp.int32),
            sample_n_iter=jnp.zeros((n_samples,), jnp.int32),
            box=box,
            cursor=cursor,
            key=key,
        )
        if self.mesh is not None:
            # SPMD placement: D/B feature-sharded, per-sample state
            # replicated; the step function is unchanged (GSPMD inserts
            # the B/C psums; the Pallas BCD kernel runs replicated via
            # shard_map, _step.py::_bcd_kernel_call).
            from ..parallel import config_for_mesh, shard_state
            self._state = shard_state(self._state, self.mesh)
            self._cfg = config_for_mesh(self._cfg, self.mesh)
            self._mesh_feat = self.mesh.shape.get('feat', 1) > 1

        self.labels_ = np.arange(n_samples)
        if self.verbose:
            self.verbose_iter_ = np.linspace(
                0, n_samples * self.n_epochs, self.verbose).tolist()
        self.time_ = 0.0
        return self

    # sklearn-style trailing-underscore views over the state pytree ----- #

    @property
    def components_(self):
        return np.asarray(self._components_device())

    @property
    def code_(self):
        return np.asarray(self._state.code)

    @property
    def C_(self):
        return np.asarray(self._state.C)

    @property
    def B_(self):
        B = self._state.B
        if getattr(self._cfg, 'windowed', False):
            B = jnp.take(B, jnp.asarray(self._feat_inv), axis=1)
        return np.asarray(B)

    @property
    def G_(self):
        return np.asarray(self._state.G) if self._state.G is not None else None

    @property
    def Dx_average_(self):
        return (np.asarray(self._state.Dx_avg)
                if self._state.Dx_avg is not None else None)

    @property
    def G_average_(self):
        return (np.asarray(self._state.G_avg)
                if self._state.G_avg is not None else None)

    @property
    def n_iter_(self):
        return int(self._state.n_iter)

    @property
    def sample_n_iter_(self):
        return np.asarray(self._state.sample_n_iter)

    # ------------------------------------------------------------------ #
    # fitting
    # ------------------------------------------------------------------ #

    def fit(self, X, y=None):
        """Full factorisation: prepare + n_epochs x (partial_fit + shuffle)
        (dict_fact.py:286-311)."""
        X = check_array(X, order='C', dtype=[np.float32, np.float64])
        dict_init = X if self.dict_init is None else check_array(
            self.dict_init, dtype=X.dtype.type)
        # data stays device-resident for the whole fit -> the windowed
        # sampler's one-time ingestion permute amortises (_make_config)
        self._resident_fit = True
        try:
            self.prepare(n_samples=X.shape[0], X=dict_init, dtype=X.dtype)
        finally:
            self._resident_fit = False
        X_dev = self._ingest_features(jnp.asarray(X, self._dtype))
        for _ in range(self.n_epochs):
            self._partial_fit_device(X_dev, None, ingested=True)
            perm = self.shuffle()
            X_dev = apply_permutation(X_dev, jnp.asarray(perm))
        return self

    def _windowed_extra_pad(self, n_features, width):
        """Zero columns beyond the mirror pad so feat-sharded windowed
        storage splits evenly over the mesh's feature axis."""
        if self.mesh is None:
            return 0
        n_feat = self.mesh.shape.get('feat', 1)
        return (-(n_features + width)) % n_feat

    def _ingest_features(self, X_dev):
        """Windowed mode: reorder columns into the fixed feature order
        and append the mirror pad. Identity otherwise."""
        cfg = self._cfg
        if not getattr(cfg, 'windowed', False):
            return X_dev
        width = cfg.len_max if cfg.rand_size else cfg.len_subset
        if getattr(self, 'subset_sampling', 'auto') == 'window-ordered':
            Xp = X_dev          # arrival order is the window order
        else:
            Xp = jnp.take(X_dev, jnp.asarray(self._feat_perm), axis=1)
        out = jnp.concatenate([Xp, Xp[:, :width]], axis=1)
        extra = self._windowed_extra_pad(cfg.n_features, width)
        if extra:
            out = jnp.pad(out, ((0, 0), (0, extra)))
        return out

    def partial_fit(self, X, sample_indices=None):
        """Stream rows of X through the learner (dict_fact.py:313-337)."""
        X = check_array(X, dtype=[np.float32, np.float64], order='C')
        X_dev = jnp.asarray(X, self._dtype)
        self._partial_fit_device(X_dev, sample_indices)
        return self

    def _partial_fit_device(self, X_dev, sample_indices, ingested=False):
        if not ingested:
            X_dev = self._ingest_features(X_dev)
        return self._partial_fit_ingested(X_dev, sample_indices)

    def _step_fns(self):
        """(step, scan) jitted callables; offload mode pins the EMA
        leaves to host memory via out_shardings."""
        if not self._cfg.average_offload:
            return somf_step_jit, somf_scan
        if getattr(self, '_offload_fns', None) is None:
            from ._step import make_offload_scan, make_offload_step
            step = make_offload_step(self._state, self._cfg)
            # fused variant: segmented scan exchanging G_avg rows at
            # segment boundaries (host arrays can't ride scan carries)
            scan = make_offload_scan(self._state, self._cfg)
            self._offload_fns = (step, scan)
        return self._offload_fns

    def _partial_fit_ingested(self, X_dev, sample_indices):
        import time as _time
        t0 = _time.perf_counter()
        n = X_dev.shape[0]
        b = min(self.batch_size, n)
        cfg = self._cfg
        if sample_indices is None:
            idx = jnp.arange(n, dtype=jnp.int32)
        elif isinstance(sample_indices, slice):
            idx = jnp.arange(sample_indices.start, sample_indices.stop,
                             dtype=jnp.int32)
        else:
            idx = jnp.asarray(np.asarray(sample_indices), jnp.int32)

        if self.mesh is not None:
            from ..parallel import shard_batch, shard_batches, shard_indices

        interactive = bool(self.verbose) or (self.callback is not None)
        # the segmented offload scan maps each global sample row to one
        # local row, so it needs unique indices within the call;
        # duplicated indices (unusual) fall back to per-batch stepping
        if cfg.average_offload and not interactive:
            if sample_indices is None or isinstance(sample_indices,
                                                    slice):
                unique = True
            else:
                si = np.asarray(sample_indices)
                unique = len(np.unique(si)) == len(si)
            interactive = not unique
        n_full = n // b
        if interactive:
            for batch in gen_batches(n, b):
                if (self.verbose and getattr(self, 'verbose_iter_', None)
                        and self.n_iter_ >= self.verbose_iter_[0]):
                    print('Iteration %i' % self.n_iter_)
                    self.verbose_iter_ = self.verbose_iter_[1:]
                    self._callback()
                elif not self.verbose and self.callback is not None:
                    # with verbose=0 the reference never fires callbacks;
                    # here they fire every batch so checkpointing/scoring
                    # hooks work without a print schedule
                    self._callback()
                Xi, ii = X_dev[batch], idx[batch]
                if self.mesh is not None:
                    Xi = shard_batch(Xi, self.mesh, feat=self._mesh_feat)
                    ii = shard_indices(ii, self.mesh)
                step_fn, _ = self._step_fns()
                self._state = step_fn(self._state, Xi, ii, cfg)
        else:
            if n_full > 0 and cfg.average_offload:
                # segmented fused scan: G_avg rows for SEG batches are
                # exchanged with host RAM at segment boundaries; the
                # scan itself is all-device (see _step.py's
                # _offload_scan_body). SEG bounds the transient device
                # residency of the gathered (seg*b, k, k) block.
                k2 = (self.n_components ** 2
                      * np.dtype(self._dtype).itemsize)
                seg = max(1, int(OFFLOAD_SEG_BYTES // max(b * k2, 1)))
                # a segment larger than the call covers it exactly once
                seg = min(seg, n_full)
                _, scan_fn = self._step_fns()
                n_seg_full = n_full // seg
                for s in range(n_seg_full):
                    lo = s * seg * b
                    hi = lo + seg * b
                    Xs = X_dev[lo:hi].reshape(seg, b, -1)
                    ibs = idx[lo:hi].reshape(seg, b)
                    self._state = scan_fn(self._state, Xs, ibs, cfg)
                # leftover full batches run per-batch (one extra
                # compiled shape instead of a tail-segment scan)
                step_fn, _ = self._step_fns()
                for s in range(n_seg_full * seg, n_full):
                    lo = s * b
                    self._state = step_fn(self._state,
                                          X_dev[lo:lo + b],
                                          idx[lo:lo + b], cfg)
            elif n_full > 0:
                Xb = X_dev[:n_full * b].reshape(n_full, b, -1)
                ib = idx[:n_full * b].reshape(n_full, b)
                if self.mesh is not None:
                    Xb = shard_batches(Xb, self.mesh, feat=self._mesh_feat)
                    ib = shard_indices(ib, self.mesh)
                _, scan_fn = self._step_fns()
                self._state = scan_fn(self._state, Xb, ib, cfg)
            if n_full * b < n:
                Xi, ii = X_dev[n_full * b:], idx[n_full * b:]
                if self.mesh is not None:
                    Xi = shard_batch(Xi, self.mesh, feat=self._mesh_feat)
                    ii = shard_indices(ii, self.mesh)
                step_fn, _ = self._step_fns()
                self._state = step_fn(self._state, Xi, ii, cfg)
        self._state.D.block_until_ready()
        self.time_ += _time.perf_counter() - t0

    def _callback(self):
        if self.callback is not None:
            self.callback(self)

    def shuffle(self):
        """Co-shuffle per-sample state; return the permutation used
        (dict_fact.py:359-379)."""
        seed = self.random_state.randint(MAX_INT)
        perm = np.random.RandomState(seed).permutation(self._n_samples)
        perm_dev = jnp.asarray(perm)
        st = self._state

        def permute(arr):
            if arr is None:
                return None
            if getattr(arr.sharding, 'memory_kind', None) == 'pinned_host':
                from ._step import apply_permutation_host
                return apply_permutation_host(arr, perm_dev)
            out = apply_permutation(arr, perm_dev)
            # the gather's output sharding is compiler-chosen
            # (replicated); re-pin per-sample leaves to the dp axis so
            # G_avg stays split across devices between epochs
            if (self.mesh is not None
                    and out.shape[0] % self.mesh.shape.get('dp', 1) == 0):
                from jax.sharding import NamedSharding, PartitionSpec
                out = jax.device_put(
                    out, NamedSharding(self.mesh, PartitionSpec('dp')))
            return out

        code = permute(st.code)
        G_avg = permute(st.G_avg)
        Dx_avg = permute(st.Dx_avg)
        sni = apply_permutation(st.sample_n_iter, perm_dev)
        self._state = st._replace(code=code, G_avg=G_avg, Dx_avg=Dx_avg,
                                  sample_n_iter=sni)
        self.labels_ = self.labels_[perm]
        return perm

    def set_params(self, **params):
        """set_params with the mid-run upgrade hooks: G_agg='full'
        recomputes the Gram (dict_fact.py:339-357); switching an
        aggregator to 'average' lazily allocates the per-sample EMA
        state (the reference crashes on this path - its Dx_average_ is
        only allocated when prepare() already saw 'average')."""
        G_agg = params.pop('G_agg', None)
        if G_agg == 'full' and self.G_agg != 'full':
            if hasattr(self, '_state'):
                st = self._state
                Dl = st.D
                if getattr(self._cfg, 'windowed', False):
                    # exclude the mirror pad (the Gram is order-invariant)
                    Dl = Dl[:, :self._n_features]
                self._state = st._replace(G=Dl @ Dl.T)
            self.G_agg = 'full'
        elif G_agg is not None:
            self.G_agg = G_agg
        BaseEstimator.set_params(self, **params)
        if hasattr(self, '_state'):
            st = self._state
            k = self.n_components

            def _alloc(shape, host):
                # freshly allocated entries are exact zeros; the step's
                # unvisited->weight-1 rule makes their first post-switch
                # update unbiased (no counter games needed)
                z = np.zeros(shape, self._dtype)
                if host:
                    from ._step import _mem_sharding
                    return jax.device_put(z, _mem_sharding('pinned_host'))
                z = jnp.asarray(z)
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec
                    z = jax.device_put(
                        z, NamedSharding(self.mesh, PartitionSpec()))
                return z

            offload = bool(getattr(self._cfg, 'average_offload', False))
            if self.Dx_agg == 'average' and st.Dx_avg is None:
                st = st._replace(Dx_avg=_alloc((self._n_samples, k),
                                               host=False))
            if self.G_agg == 'average' and st.G_avg is None:
                st = st._replace(G_avg=_alloc((self._n_samples, k, k),
                                              host=offload))
            self._state = st
        self._offload_fns = None  # shapes/placements may have changed
        if hasattr(self, '_n_features'):
            old_cfg = getattr(self, '_cfg', None)
            new_cfg = self._make_config(self._n_features)
            if old_cfg is not None and hasattr(self, '_state'):
                new_cfg = self._migrate_layout(old_cfg, new_cfg)
            self._cfg = new_cfg
            if self.mesh is not None:
                # mirror prepare(): the mesh rides the config (shard_map
                # wrapping of the Pallas BCD call) and must survive
                # mid-run rebuilds
                from ..parallel import config_for_mesh
                self._cfg = config_for_mesh(self._cfg, self.mesh)
        return self

    def _migrate_layout(self, old_cfg, new_cfg):
        """Reconcile the live state pytree with a rebuilt config.

        The windowed layout (fixed feature order + mirror pad of the
        window width, prepare():404-426) is baked into the stored D/B
        arrays, but the logical state is width-invariant: the pad merely
        duplicates the head columns. When ``set_params`` changes
        ``reduction`` (so ``len_subset``/``len_max`` and hence the pad
        width change — exactly what ``fMRIDictFact(method='reducing
        ratio')`` does every epoch, reference fmri.py:531-535), the state
        is re-ingested here: strip the old pad, re-pad at the new width.
        If the new geometry no longer supports windows (e.g. the window
        would cover more than half the features), fall back to gather
        mode by restoring logical feature order."""
        import dataclasses
        if not old_cfg.windowed:
            # a live non-windowed state cannot become windowed mid-run
            # (no ingestion permute was applied to it)
            return dataclasses.replace(new_cfg, windowed=False,
                                       n_features=0)
        st = self._state
        n = self._n_features
        old_width = (old_cfg.len_max if old_cfg.rand_size
                     else old_cfg.len_subset)
        new_width = (new_cfg.len_max if new_cfg.rand_size
                     else new_cfg.len_subset)
        # the original fit opted into windows; keep them whenever the
        # new geometry allows (same conditions as _make_config)
        mesh_ok = (self.mesh is None
                   or self.mesh.shape.get('feat', 1) == 1)
        fits = (mesh_ok and new_cfg.len_subset < n
                and n >= 2 * new_width)
        if fits and new_width == old_width:
            return dataclasses.replace(new_cfg, windowed=True,
                                       n_features=n)
        D_log = st.D[:, :n]     # stored feature order, pad stripped
        B_log = st.B[:, :n]
        if fits:
            D = jnp.concatenate([D_log, D_log[:, :new_width]], axis=1)
            B = jnp.concatenate([B_log, B_log[:, :new_width]], axis=1)
            self._state = st._replace(D=D, B=B)
            return dataclasses.replace(new_cfg, windowed=True,
                                       n_features=n)
        import warnings
        warnings.warn('set_params made the subset window wider than the '
                      'windowed layout supports; falling back to gather '
                      'subset sampling for the rest of this fit')
        if self._feat_perm is not None and \
                not np.array_equal(self._feat_perm,
                                   np.arange(len(self._feat_perm))):
            inv = jnp.asarray(self._feat_inv)
            D_log = jnp.take(D_log, inv, axis=1)
            B_log = jnp.take(B_log, inv, axis=1)
        self._feat_perm = self._feat_inv = None
        self._state = st._replace(D=D_log, B=B_log)
        return dataclasses.replace(new_cfg, windowed=False, n_features=0)


class Coder(CodingMixin, BaseEstimator):
    """Fixed-dictionary encoder (dict_fact.py:724-745)."""

    def __init__(self, dictionary,
                 code_alpha=1, code_l1_ratio=1, tol=1e-2, max_iter=100,
                 code_pos=False, random_state=None, n_threads=1):
        self._set_coding_params(dictionary.shape[0],
                                code_l1_ratio=code_l1_ratio,
                                code_alpha=code_alpha,
                                code_pos=code_pos,
                                random_state=random_state,
                                tol=tol, max_iter=max_iter,
                                n_threads=n_threads)
        self.components_ = np.asarray(dictionary)

    def fit(self, X=None, y=None):
        return self
