"""RecsysDictFact: masked online matrix factorization for sparse ratings.

TPU-native re-design of ``modl/decomposition/recsys.py`` +
``recsys_fast.pyx``. The reference iterates CSR rows in Python/Cython;
here every batch of rows is packed on the host into fixed-width padded
support tensors (indices padded with ``n_features`` and dropped/zero-filled
by XLA's OOB gather/scatter semantics, widths quantised to powers of two
to bound recompiles) and one jitted step performs:

- vmapped per-row masked ridge solves
  ``(D_s D_s^T + alpha/reduction I) c = D_s x_s`` (recsys.py:168-180)
  as a batched Cholesky on the MXU,
- the order-dependent per-feature EMA of B with weights
  ``w_B = min(1, w n_iter / feature_n_iter)`` (recsys.py:182-185) in
  closed form over the whole batch (sequential semantics preserved:
  per-column ranks + suffix decay products via dense cumulative ops,
  ``_b_ema_update``),
- the C EMA and a *masked full-width* block coordinate descent dictionary
  update over the union of supports (recsys.py:187-213): the union of a
  1/sparsity-sized batch covers O(n_features) columns, so full-width
  masked GEMMs on the MXU replace the reference's gather + BLAS ger.

``predict`` (recsys_fast.pyx:10-38) is a gathered dot over the stored
entries; ``compute_biases``/``rmse`` keep their host numpy form.
"""
from functools import lru_cache, partial
from math import ceil, log

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax
from sklearn.base import BaseEstimator
from sklearn.utils import check_array, check_random_state, gen_batches

from ..ops.precision import precise
from ..ops.weights import batch_weight
from ..utils.system import enable_compilation_cache

__all__ = ["RecsysDictFact", "compute_biases", "rmse"]


def _next_pow2(x):
    p = 1
    while p < x:
        p *= 2
    return p


def _pad_rows_window(X, rows_w, n_features, dtype):
    """Pack a (W, b) window of row ids into (W, b, P) padded tensors
    with one shared power-of-two width."""
    W, b = rows_w.shape
    flat = rows_w.reshape(-1)
    lens = X.indptr[flat + 1] - X.indptr[flat]
    P = _next_pow2(max(int(lens.max()), 1))
    idx, val, lens32, _ = _pad_rows(X, flat, n_features, dtype, width=P)
    return (idx.reshape(W, b, P), val.reshape(W, b, P),
            lens32.reshape(W, b), P)


def _pad_rows(X, rows, n_features, dtype, width=None):
    """Pack CSR rows into (b, P) padded (indices, values); pad index ==
    n_features (dropped by XLA gather-fill / scatter-drop).

    Uses the native C++ packer (modl_tpu/native/csr_pack.cpp) when built;
    falls back to a per-row numpy loop."""
    starts = X.indptr[rows]
    ends = X.indptr[rows + 1]
    lens = ends - starts
    P = width if width is not None else _next_pow2(max(int(lens.max()), 1))
    b = len(rows)

    from ..native import pack_rows as _native_pack
    packed = _native_pack(X.indptr, X.indices, X.data, rows, P,
                          n_features, dtype)
    if packed is not None:
        idx, val, lens32 = packed
        return idx, val, lens32, P

    idx = np.full((b, P), n_features, dtype=np.int32)
    val = np.zeros((b, P), dtype=dtype)
    for i in range(b):
        L = min(int(lens[i]), P)  # truncate like the native packer
        idx[i, :L] = X.indices[starts[i]:starts[i] + L]
        val[i, :L] = X.data[starts[i]:starts[i] + L]
    return idx, val, np.minimum(lens, P).astype(np.int32), P


# device-resident padded-CSR budget (bytes of idx+val) PER DEVICE:
# below this the whole training matrix is packed once and batches
# gather on device; above it (power-law data where the global max row
# length would inflate the pad width) fit falls back to adaptive
# per-window host packing. Under a dp mesh the packed rows are sharded
# over the devices, so the aggregate budget scales with the mesh.
RESIDENT_BUDGET = 512 * 1024 * 1024


def _pad_all_rows(X, n_features, dtype, n_dp=1):
    """Pack every CSR row once at one shared power-of-two width.

    Returns ``(idx_all, val_all, lens_all, P)`` as device arrays, or
    ``None`` when the padded size exceeds ``n_dp * RESIDENT_BUDGET``
    (then the caller streams host-packed windows instead). With
    ``n_dp > 1`` the row count is padded to a multiple of ``n_dp``
    (empty rows: pad index, zero value, zero length) so the arrays
    split evenly over a dp mesh axis, and the arrays are returned as
    host numpy for the caller to ``device_put`` with a sharding."""
    n_samples = X.shape[0]
    max_len = int(np.diff(X.indptr).max()) if X.nnz else 1
    P = _next_pow2(max(max_len, 1))
    itemsize = np.dtype(dtype).itemsize
    # budget the PADDED row count (rows are padded to a multiple of n_dp
    # below, so the stored size is what must fit the per-device budget)
    n_stored = n_samples + (-n_samples) % n_dp
    if n_stored * P * (4 + itemsize) > n_dp * RESIDENT_BUDGET:
        return None
    rows = np.arange(n_samples)
    idx, val, lens32, _ = _pad_rows(X, rows, n_features, dtype, width=P)
    if n_dp > 1:
        n_pad = (-n_samples) % n_dp
        if n_pad:
            idx = np.concatenate(
                [idx, np.full((n_pad, P), n_features, np.int32)])
            val = np.concatenate([val, np.zeros((n_pad, P), dtype)])
            lens32 = np.concatenate([lens32, np.zeros((n_pad,), np.int32)])
        return idx, val, lens32, P
    return (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(lens32), P)


def _check_contiguous_dp_shards(arr, mesh):
    """Verify the layout invariant _make_resident_gather relies on:
    under ``NamedSharding(mesh, P('dp'))`` each dp-axis position ``i``
    holds the contiguous global rows [i * n_local, (i + 1) * n_local).
    Cheap (host-side metadata only); raises instead of letting the
    psum gather silently return all-zero rows."""
    n_local = arr.shape[0] // mesh.shape['dp']
    axis = list(mesh.axis_names).index('dp')
    dev = np.moveaxis(mesh.devices, axis, 0).reshape(mesh.shape['dp'], -1)
    dp_pos = {d: i for i in range(dev.shape[0]) for d in dev[i]}
    for device, index in arr.sharding.devices_indices_map(arr.shape).items():
        start = index[0].start or 0
        want = dp_pos[device]
        if start != want * n_local:
            raise AssertionError(
                'dp-sharded resident rows are not contiguous in dp-axis '
                'order (device %r holds rows from %d, expected %d); the '
                'resident psum gather would corrupt batches'
                % (device, start, want * n_local))


def _make_resident_gather(mesh, shard_batch_out):
    """Batch reassembly from dp-sharded resident rows (dataset
    sharding — the TPU-native counterpart of the reference's
    shared-memory CSR: each device stores 1/n_dp of the padded rows,
    so capacity scales with the mesh).

    Each requested global row id lives on exactly one device; every
    device contributes its local hits (zeros elsewhere) and a ``psum``
    reassembles the batch EXACTLY (adding zeros is exact in floating
    point — the gather introduces zero numerical deviation; any f32
    drift of a mesh fit comes from GSPMD's reordered reductions in the
    downstream sharded contractions, identically to the pre-dataset-
    sharding mesh path, and vanishes at f64 where the trajectory tests
    pin 1e-9). With ``shard_batch_out`` the reassembled batch is then
    split over dp along its row axis so the downstream vmapped ridge
    solves keep fanning out across the mesh."""
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map
    n_dp = mesh.shape['dp']

    def gather(idx_all, val_all, lens_all, rows):
        # Layout invariant: NamedSharding(P('dp')) over an evenly
        # divisible leading axis places equal CONTIGUOUS row shards in
        # dp-axis-index order, so device d holds global rows
        # [d * n_local, (d + 1) * n_local). fit() verifies this against
        # the actual devices_indices_map right after the device_put
        # (_check_contiguous_dp_shards) — a silent break would otherwise
        # return all-zero rows from this gather.
        d = lax.axis_index('dp')
        n_local = idx_all.shape[0]
        loc = rows - d * n_local
        hit = (loc >= 0) & (loc < n_local)
        locc = jnp.clip(loc, 0, n_local - 1)
        gi = jnp.where(hit[..., None],
                       jnp.take(idx_all, locc, axis=0), 0)
        gv = jnp.where(hit[..., None],
                       jnp.take(val_all, locc, axis=0), 0)
        gl = jnp.where(hit, jnp.take(lens_all, locc, axis=0), 0)
        gi = lax.psum(gi, 'dp')
        gv = lax.psum(gv, 'dp')
        gl = lax.psum(gl, 'dp')
        if shard_batch_out:
            b = gl.shape[-1]
            bl = b // n_dp
            axis = gl.ndim - 1
            gi = lax.dynamic_slice_in_dim(gi, d * bl, bl, axis=axis)
            gv = lax.dynamic_slice_in_dim(gv, d * bl, bl, axis=axis)
            gl = lax.dynamic_slice_in_dim(gl, d * bl, bl, axis=axis)
        return gi, gv, gl

    def make(rows_ndim):
        # rows is (b,) for single batches, (W, b) for windows
        lead = [None] * (rows_ndim - 1)
        batch = 'dp' if shard_batch_out else None
        return shard_map(
            gather, mesh=mesh,
            in_specs=(P('dp'), P('dp'), P('dp'), P()),
            out_specs=(P(*lead, batch, None), P(*lead, batch, None),
                       P(*lead, batch)))
    return make


@lru_cache(maxsize=8)
def _resident_steps_mesh(mesh, batch_size, n_dp):
    """Jitted mesh variants of the resident window/batch steps: the
    packed rows stay dp-sharded and batches are reassembled by the
    shard_map gather. The batch axis is re-split over dp when the batch
    size divides the mesh (keeping the ridge-solve fan-out); odd tails
    run with replicated batch tensors."""
    shard_out = (batch_size % n_dp == 0)
    gather_w = _make_resident_gather(mesh, shard_out)(2)

    @partial(jax.jit, static_argnames=("alpha", "learning_rate",
                                       "use_pallas"))
    @precise
    def window_resident(D, C, B, comp_norm, feature_n_iter, n_iter,
                        code, idx_all, val_all, lens_all, rows_w,
                        orders_w, alpha, learning_rate, use_pallas=False):
        idx_w, val_w, lens_w = gather_w(idx_all, val_all, lens_all,
                                        rows_w)
        return _recsys_window(D, C, B, comp_norm, feature_n_iter,
                              n_iter, code, rows_w, idx_w, val_w,
                              lens_w, orders_w, alpha, learning_rate,
                              use_pallas=use_pallas)

    @partial(jax.jit, static_argnames=("alpha", "learning_rate",
                                       "use_pallas"))
    @precise
    def batch_resident(D, C, B, comp_norm, feature_n_iter, n_iter, code,
                       idx_all, val_all, lens_all, rows, order, alpha,
                       learning_rate, use_pallas=False):
        # rows.shape is static at trace time; odd epoch tails fall back
        # to a replicated batch axis
        gather_b = _make_resident_gather(
            mesh, rows.shape[0] % n_dp == 0)(1)
        idx, val, lens = gather_b(idx_all, val_all, lens_all, rows)
        code_b = _masked_ridge_codes(D, idx, val, lens, alpha)
        code = code.at[rows].set(code_b)
        D, C, B, comp_norm, feature_n_iter, n_iter = _recsys_batch_step(
            D, C, B, comp_norm, feature_n_iter, n_iter, code_b, idx,
            val, lens, order, learning_rate, use_pallas=use_pallas)
        return D, C, B, comp_norm, feature_n_iter, n_iter, code

    return window_resident, batch_resident


def _pallas_backend_ok():
    """Whether the backend compiles Mosaic kernels (tests monkeypatch
    this to exercise the kernel paths in interpreter mode on CPU)."""
    return jax.default_backend() not in ('cpu',)


def _union_bcd_kernel_call(use_pallas, Dm, grad, C, comp_norm, order):
    """Invoke the VMEM-resident union-BCD kernel, mesh-aware.

    ``use_pallas`` is True (single-device) or the ``jax.sharding.Mesh``
    of an SPMD fit. GSPMD has no partitioning rule for the pallas
    custom call, so under a mesh the call is wrapped in ``shard_map``
    with fully-replicated specs, exactly like the SOMF step's
    ``_step.py::_bcd_kernel_call``: the dictionary update is replicated
    compute in the dp decomposition (the reference's analog is every
    thread seeing the full dictionary, recsys.py:187-213), and any
    sharded operands are all-gathered at entry (k x n over ICI)."""
    from ..ops import bcd_pallas
    kw = dict(comp_pos=False, l1_ratio=0.0)
    if use_pallas is True:
        return bcd_pallas.bcd_update(Dm, grad, C, comp_norm, order, **kw)
    from jax.sharding import PartitionSpec as P

    def run(Dm, grad, C, cn, order):
        return bcd_pallas.bcd_update(Dm, grad, C, cn, order, **kw)

    return jax.shard_map(run, mesh=use_pallas, in_specs=(P(),) * 5,
                         out_specs=(P(), P()), check_vma=False)(
        Dm, grad, C, comp_norm, order)


# B-EMA evaluation strategy: 'dense' computes the per-entry ranks and
# suffix decay products as cumulative ops over a dense (b, n) scatter
# of the batch (two VPU cumsum/cumprod passes — the dense scatter
# already exists for the final GEMM, so this adds no asymptotic
# memory); 'sort' is the original (col, row) lexicographic sort +
# segmented associative scan over the padded entries. Identical math,
# identical serial semantics, different (both non-serial) association
# order — parity vs the serial numpy oracle is pinned for BOTH in
# tests/test_recsys_parity.py. TPU sorts are multi-pass bitonic and
# measured ~2x the dense formulation at ML-10M shapes
# (benchmarks/recsys_trace.py --bema). Read at trace time: flip only
# before the first jitted step (the A/B harness does).
BEMA_MODE = 'dense'


def _b_ema_entries(B, idx, val, lens):
    """Flatten the padded batch to per-entry (row, col, val, valid)
    vectors; pad/invalid entries route to the dump column ``n + 1``."""
    n = B.shape[1]
    b, P = idx.shape
    rows_e = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None],
                              (b, P)).reshape(-1)
    cols_e = idx.reshape(-1).astype(jnp.int32)          # pad index == n
    vals_e = val.reshape(-1)
    valid_e = (jnp.arange(P, dtype=jnp.int32)[None, :]
               < lens[:, None]).reshape(-1)
    cols_key = jnp.where(valid_e, cols_e, jnp.int32(n + 1))
    return rows_e, cols_e, vals_e, valid_e, cols_key


def _b_ema_dense(B, feature_n_iter, code_b, idx, val, lens, w, n_iter_new):
    """Order-dependent B EMA via dense cumulative ops (``BEMA_MODE ==
    'dense'``, the default — see the flag's comment).

    The serial semantics (reference recsys.py:182-185: row j's weight
    uses the post-increment visit count, later rows decay earlier
    contributions) only couple entries within a column, in row order —
    exactly a per-column prefix/suffix problem. On the dense (b, n)
    scatter the per-entry rank is an exclusive cumsum of the occupancy
    down the rows, and the exclusive suffix decay product is a reversed
    cumprod (absent entries contribute exact-noop factors of 1.0).
    """
    k, n = B.shape
    b, _ = idx.shape
    dtype = B.dtype
    rows_e, _, _, _, cols_key = _b_ema_entries(B, idx, val, lens)

    occ = jnp.zeros((b, n + 2), dtype).at[rows_e, cols_key].set(1.0)
    xv = jnp.zeros((b, n + 2), dtype).at[rows_e, cols_key].set(
        val.reshape(-1))
    # Hillis-Steele log-shift passes, NOT jnp.cumsum/cumprod (XLA lowers
    # the cumulative primitives on TPU via reduce_window — O(b^2 n)
    # reads, measured ~0.5 ms/batch each at ML-10M shapes) and NOT
    # lax.associative_scan (its odd-length recursive slicing blew the
    # 1-core compile past 15 min at these shapes): ceil(log2(b))
    # unrolled pad+op passes over the (b, n) plane compile flat and
    # stream ~2 planes/pass
    def _prefix_sum(x):                    # inclusive, axis 0
        shift = 1
        while shift < x.shape[0]:
            x = x + jnp.pad(x, ((shift, 0), (0, 0)))[:x.shape[0]]
            shift *= 2
        return x

    def _suffix_prod(x):                   # inclusive, axis 0
        shift = 1
        while shift < x.shape[0]:
            x = x * jnp.pad(x, ((0, shift), (0, 0)),
                            constant_values=1.0)[shift:]
            shift *= 2
        return x

    csum = _prefix_sum(occ)
    rank = csum - occ                      # exclusive: earlier rows only
    fni_ext = jnp.concatenate(
        [feature_n_iter, jnp.zeros((2,), feature_n_iter.dtype)])
    count = fni_ext[None, :].astype(dtype) + rank + 1.0
    w_rc = jnp.minimum(1.0, w * n_iter_new.astype(dtype)
                       / jnp.maximum(count, 1.0)) * occ
    q = 1.0 - w_rc
    sfx = _suffix_prod(q)                  # inclusive suffix
    sfx_excl = jnp.concatenate(
        [sfx[1:], jnp.ones((1, n + 2), dtype)], axis=0)
    B = B * sfx[0, :n][None, :] + code_b.T @ (w_rc * xv * sfx_excl)[:, :n]
    feature_n_iter = feature_n_iter + csum[-1, :n].astype(
        feature_n_iter.dtype)
    return B, feature_n_iter


def _b_ema_sort(B, feature_n_iter, code_b, idx, val, lens, w, n_iter_new):
    """Order-dependent B EMA via (col, row) sort + segmented scan
    (``BEMA_MODE == 'sort'`` — kept for the A/B and as the reference
    formulation the dense path is tested against):

        B[:, c] <- B[:, c] * prod_j q_j
                   + sum_j (w_j code_j x_j) * prod_{l > j} q_l,
        q_j = 1 - w_j,

    with j running over the column's batch entries in row order. The
    per-entry ranks come from one (col, row) lexicographic sort, the
    suffix products from a segmented associative scan, and the final
    update is a single (k, b) x (b, n) MXU GEMM plus a per-column
    scale — no sequential scan (exactness pinned by
    tests/test_recsys_parity.py against the serial numpy oracle).
    """
    k, n = B.shape
    b, _ = idx.shape
    dtype = B.dtype
    rows_e, _, vals_e, valid_e, cols_key = _b_ema_entries(
        B, idx, val, lens)

    # sort by (col, row): each column's entries land contiguous, in row
    # order — exactly the serial visit order
    c_s, r_s, v_s, valid_s = lax.sort(
        (cols_key, rows_e, vals_e, valid_e.astype(jnp.int32)), num_keys=2)
    valid_s = valid_s.astype(bool)
    m = c_s.shape[0]
    pos = jnp.arange(m, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), c_s[1:] != c_s[:-1]])
    start_pos = lax.cummax(jnp.where(is_start, pos, 0))
    rank = pos - start_pos                              # row-order rank

    # post-increment visit count -> per-entry EMA weight
    fni_ext = jnp.concatenate(
        [feature_n_iter, jnp.zeros((2,), feature_n_iter.dtype)])
    count = jnp.take(fni_ext, c_s) + rank + 1
    w_e = jnp.minimum(1.0, w * n_iter_new.astype(dtype)
                      / jnp.maximum(count, 1).astype(dtype))
    w_e = jnp.where(valid_s, w_e, 0.0).astype(dtype)
    q = 1.0 - w_e

    # exclusive suffix product of q within each column segment
    # (segmented scan over the reversed array; flags mark segment heads
    # of the reversed order = segment ends of the original)
    is_end = jnp.concatenate([c_s[1:] != c_s[:-1],
                              jnp.ones((1,), bool)])
    qr, fr = q[::-1], is_end[::-1]

    def comb(a, bb):
        va, fa = a
        vb, fb = bb
        return jnp.where(fb, vb, va * vb), fa | fb

    incl_r, _ = lax.associative_scan(comb, (qr, fr))
    excl_r = jnp.where(fr, jnp.asarray(1.0, dtype),
                       jnp.concatenate([jnp.ones((1,), dtype),
                                        incl_r[:-1]]))
    S = excl_r[::-1]                                    # (m,)

    # per-column total decay (full product = S * q at the rank-0 entry)
    colscale = jnp.ones((n + 2,), dtype).at[
        jnp.where(is_start, c_s, jnp.int32(n + 1))].set(
        jnp.where(is_start, S * q, 1.0))
    # per-entry contributions -> dense (b, n) -> one MXU GEMM
    contrib = jnp.where(valid_s, w_e * v_s * S, 0.0)
    M = jnp.zeros((b, n + 2), dtype).at[r_s, c_s].add(contrib)
    B = B * colscale[None, :n] + code_b.T @ M[:, :n]
    feature_n_iter = feature_n_iter + jnp.zeros(
        (n + 2,), feature_n_iter.dtype).at[cols_key].add(
        valid_e.astype(feature_n_iter.dtype))[:n]
    return B, feature_n_iter


def _b_ema_update(B, feature_n_iter, code_b, idx, val, lens, w, n_iter_new):
    impl = _b_ema_dense if BEMA_MODE == 'dense' else _b_ema_sort
    return impl(B, feature_n_iter, code_b, idx, val, lens, w, n_iter_new)


@partial(jax.jit, static_argnames=("alpha",))
@precise
def _masked_ridge_codes(D, idx, val, lens, alpha):
    """Vmapped masked ridge solves; rows with empty support -> zero code.

    D (k, n); idx/val (b, P) padded; lens (b,). recsys.py:168-180.
    """
    k, n = D.shape
    # gather support columns as ROWS of D^T: a column gather of the
    # row-major (k, n) dictionary touches ~k/8 separate HBM tiles per
    # entry (measured ~7x the useful bytes at recsys shapes), while a
    # row gather of the transposed (n, k) layout reads one
    # tile-contiguous run per entry; the 2 MB transpose per batch is
    # noise next to the saved gather traffic
    Dt = D.T                                           # (n, k)
    Dg = jnp.take(Dt, idx, axis=0, fill_value=0.0)     # (b, P, k)
    Dx = jnp.einsum('bpk,bp->bk', Dg, val)
    G = jnp.einsum('bpk,bpq->bkq', Dg, Dg)
    lens_f = jnp.maximum(lens, 1).astype(D.dtype)
    reduction = n / lens_f
    ridge = alpha / reduction
    eye = jnp.eye(k, dtype=D.dtype)
    G = G + ridge[:, None, None] * eye
    # SPD solve via Cholesky (LU is unsupported for f64 on TPU and slower)
    chol = jax.vmap(lambda M: jax.scipy.linalg.cholesky(M, lower=True))(G)
    code = jax.vmap(
        lambda c, d: jax.scipy.linalg.cho_solve((c, True), d))(chol, Dx)
    return jnp.where((lens > 0)[:, None], code, 0.0)


@partial(jax.jit, static_argnames=("learning_rate", "use_pallas"))
@precise
def _recsys_batch_step(D, C, B, comp_norm, feature_n_iter, n_iter, code_b,
                       idx, val, lens, order, learning_rate,
                       use_pallas=False):
    """One batch update after the codes are solved. Returns new state.

    The reference walks batch rows sequentially because its per-feature
    B EMA is order-dependent (recsys.py:157-185): row j's weight
    ``w_B = min(1, w n_iter / fni_c)`` uses the visit count *after* its
    own increment, and later rows touching the same column decay
    earlier rows' contributions. Here the identical serial semantics
    are evaluated in closed form over all batch entries at once
    (``_b_ema_update``: dense cumulative ops by default, the sort +
    segmented-scan formulation behind ``BEMA_MODE`` — both pinned
    against the serial numpy oracle by tests/test_recsys_parity.py).

    C EMA + masked full-width BCD on the union of supports follow
    (recsys.py:159-213); on TPU/f32 the BCD runs in the VMEM-resident
    Pallas kernel (``use_pallas``, decided by the estimator: n fits the
    kernel budget at recsys widths).
    """
    k, n = D.shape
    b, P = idx.shape
    dtype = D.dtype
    n_iter_new = n_iter + b
    w = jnp.asarray(batch_weight(n_iter_new, b, learning_rate, 0.0,
                                 dtype=dtype), dtype)

    B, feature_n_iter = _b_ema_update(B, feature_n_iter, code_b, idx,
                                      val, lens, w, n_iter_new)

    # --- C EMA over the batch codes (recsys.py:159-160) ---
    C = C * (1.0 - w) + (w / b) * (code_b.T @ code_b)

    # --- union-of-supports mask + masked full-width BCD ---
    mask_all = jnp.arange(P)[None, :] < lens[:, None]
    union = jnp.zeros((n,), bool).at[idx.reshape(-1)].max(
        mask_all.reshape(-1), mode='drop')
    union_f = union.astype(dtype)

    Dm = D * union_f[None, :]

    if use_pallas:
        # masked arrays keep every product confined to union columns;
        # the kernel's budget bookkeeping (cn + ||D_k||^2 at visit time)
        # is exactly the lax path's comp_norm accounting. The
        # delayed-update kernel takes the (masked) gradient directly
        # and reconstructs residual rows from Dm itself — the column
        # mask commutes with the C @ D contraction, so no residual
        # GEMM is needed here either. ``use_pallas`` carries the mesh
        # of an SPMD fit (shard_map-wrapped call, _union_bcd_kernel_call).
        D_new, comp_norm = _union_bcd_kernel_call(
            use_pallas, Dm, B * union_f[None, :], C, comp_norm, order)
        D = jnp.where(union[None, :], D_new, D)
        return D, C, B, comp_norm, feature_n_iter, n_iter_new

    R = (B - C @ D) * union_f[None, :]

    norms0 = jnp.sum(Dm * Dm, axis=1)
    comp_norm = comp_norm + norms0

    def bcd_body(j, carry):
        D, R, cn = carry
        kk = order[j]
        Ck = C[kk]
        Ckk = C[kk, kk]
        Dk = D[kk] * union_f
        R = R + jnp.outer(Ck, Dk)
        Dk_new = jnp.where(Ckk > 1e-20,
                           R[kk] / jnp.where(Ckk > 1e-20, Ckk, 1.0), Dk)
        norm = jnp.sqrt(jnp.sum(Dk_new * Dk_new))
        lim = jnp.sqrt(jnp.maximum(cn[kk], 0.0))
        scale = jnp.where(norm > lim, lim / jnp.maximum(norm, 1e-30), 1.0)
        Dk_new = Dk_new * scale
        R = R - jnp.outer(Ck, Dk_new)
        # write back only the union columns; others keep their values
        D = D.at[kk].set(jnp.where(union, Dk_new, D[kk]))
        return D, R, cn

    D, R, comp_norm = lax.fori_loop(0, k, bcd_body, (D, R, comp_norm))
    norms1 = jnp.sum((D * union_f[None, :]) ** 2, axis=1)
    comp_norm = comp_norm - norms1
    return D, C, B, comp_norm, feature_n_iter, n_iter_new


@partial(jax.jit, static_argnames=("alpha", "learning_rate", "use_pallas"))
@precise
def _recsys_window(D, C, B, comp_norm, feature_n_iter, n_iter, code,
                   rows_w, idx_w, val_w, lens_w, orders_w, alpha,
                   learning_rate, use_pallas=False):
    """Scan the batch step over a window of pre-packed minibatches.

    One host->device transfer and one dispatch cover ``W`` batches —
    essential when the host link has high per-transfer latency. Shapes:
    rows_w (W, b), idx_w/val_w (W, b, P), lens_w (W, b), orders_w (W, k).
    """
    def body(carry, inp):
        D, C, B, cn, fni, n_it, code = carry
        rows_b, idx_b, val_b, lens_b, order_b = inp
        code_b = _masked_ridge_codes(D, idx_b, val_b, lens_b, alpha)
        code = code.at[rows_b].set(code_b)
        D, C, B, cn, fni, n_it = _recsys_batch_step(
            D, C, B, cn, fni, n_it, code_b, idx_b, val_b, lens_b,
            order_b, learning_rate, use_pallas=use_pallas)
        return (D, C, B, cn, fni, n_it, code), None

    carry = (D, C, B, comp_norm, feature_n_iter, n_iter, code)
    carry, _ = lax.scan(body, carry,
                        (rows_w, idx_w, val_w, lens_w, orders_w))
    return carry


@partial(jax.jit, static_argnames=("alpha", "learning_rate", "use_pallas"))
@precise
def _recsys_window_resident(D, C, B, comp_norm, feature_n_iter, n_iter,
                            code, idx_all, val_all, lens_all, rows_w,
                            orders_w, alpha, learning_rate,
                            use_pallas=False):
    """Window scan over device-resident padded rows: the (W, b, P) batch
    tensors are gathered from the one-time-packed (n, P) arrays on
    device, so an epoch moves only row ids over the host link."""
    idx_w = jnp.take(idx_all, rows_w, axis=0)
    val_w = jnp.take(val_all, rows_w, axis=0)
    lens_w = jnp.take(lens_all, rows_w, axis=0)
    return _recsys_window(D, C, B, comp_norm, feature_n_iter, n_iter,
                          code, rows_w, idx_w, val_w, lens_w, orders_w,
                          alpha, learning_rate, use_pallas=use_pallas)


@partial(jax.jit, static_argnames=("alpha", "learning_rate", "use_pallas"))
@precise
def _recsys_batch_resident(D, C, B, comp_norm, feature_n_iter, n_iter,
                           code, idx_all, val_all, lens_all, rows, order,
                           alpha, learning_rate, use_pallas=False):
    """Single-batch step against device-resident padded rows (the
    odd-size epoch tail; at most two compiled shapes per fit)."""
    idx = jnp.take(idx_all, rows, axis=0)
    val = jnp.take(val_all, rows, axis=0)
    lens = jnp.take(lens_all, rows, axis=0)
    code_b = _masked_ridge_codes(D, idx, val, lens, alpha)
    code = code.at[rows].set(code_b)
    D, C, B, comp_norm, feature_n_iter, n_iter = _recsys_batch_step(
        D, C, B, comp_norm, feature_n_iter, n_iter, code_b, idx, val,
        lens, order, learning_rate, use_pallas=use_pallas)
    return D, C, B, comp_norm, feature_n_iter, n_iter, code


@jax.jit
@precise
def _predict_entries(code, D, row_idx, col_idx):
    """out[e] = code[row[e]] . D[:, col[e]] for stored entries."""
    P = jnp.take(code, row_idx, axis=0)           # (e, k)
    Q = jnp.take(D, col_idx, axis=1).T            # (e, k)
    return jnp.sum(P * Q, axis=1)


class RecsysDictFact(BaseEstimator):
    """Masked matrix-factorization estimator (API of recsys.py:16-265).

    Parameters and attributes mirror the reference: ``alpha`` (ridge),
    ``beta`` (bias shrinkage), ``n_components``, ``learning_rate``,
    ``batch_size`` (None -> ceil(1/sparsity)), ``detrend``, ``crop``,
    ``components_``, ``code_``.

    ``mesh`` (TPU-native extension): a ``jax.sharding.Mesh`` with a
    ``dp`` axis. Two things shard over ``dp``: (1) the device-resident
    packed ratings — each device stores 1/n_dp of the padded CSR rows
    (dataset sharding; resident capacity scales with the mesh, budget
    ``n_dp * RESIDENT_BUDGET``) and minibatches are reassembled inside
    the step by an exact one-hot psum gather; (2) the padded minibatch
    rows and the vmapped masked ridge solves over them. The
    B/C/dictionary statistics run replicated — their per-row EMA is
    order-dependent across the whole batch (the reference's serial
    semantics, recsys.py:157-185), so they cannot shard without
    changing the trajectory. SPMD is a layout change, not an algorithm
    change: the sharded trajectory equals the single-device one up to
    GSPMD's reordered f32 reductions (pinned at 1e-9 under the f64
    test suite, tests/test_parallel.py).
    """

    def __init__(self, alpha=1.0, beta=.0, n_components=30,
                 learning_rate=1., batch_size=1, dict_init=None,
                 l1_ratio=0, n_epochs=1, random_state=None, verbose=0,
                 detrend=False, crop=None, callback=None, mesh=None):
        self.callback = callback
        self.verbose = verbose
        self.random_state = random_state
        self.n_epochs = n_epochs
        self.l1_ratio = l1_ratio
        self.dict_init = dict_init
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.n_components = n_components
        self.alpha = alpha
        self.beta = beta
        self.detrend = detrend
        self.crop = crop
        self.mesh = mesh

    def fit(self, X, y=None):
        enable_compilation_cache()
        if self.mesh is not None and 'dp' not in self.mesh.shape:
            raise ValueError(
                "RecsysDictFact(mesh=...) requires a mesh with a 'dp' "
                "axis (got axes %r): the dataset and the batch ridge "
                "solves shard over dp" % (tuple(self.mesh.axis_names),))
        if not sp.issparse(X):
            X = sp.csr_matrix(X)
        X = check_array(X, accept_sparse='csr',
                        dtype=[np.float32, np.float64], copy=True)
        dtype = X.dtype if jax.config.jax_enable_x64 else np.float32
        n_samples, n_features = X.shape
        self._n_features = n_features
        self.random_state = check_random_state(self.random_state)

        if self.detrend:
            self.row_mean_, self.col_mean_ = compute_biases(
                X, beta=self.beta, inplace=False)
            for i in range(n_samples):
                X.data[X.indptr[i]:X.indptr[i + 1]] -= self.row_mean_[i]
            X.data -= self.col_mean_.take(X.indices, mode='clip')

        D0 = self.random_state.randn(self.n_components, n_features)
        D0 /= np.sqrt(np.sum(D0 ** 2, axis=1))[:, np.newaxis]
        D = jnp.asarray(D0, dtype)

        code = self._refit_device(D, X, dtype)

        self.feature_freq_ = np.bincount(X.indices, minlength=n_features) \
            / n_samples
        feature_n_iter = jnp.zeros((n_features,), jnp.int32)

        sparsity = X.nnz / n_samples / n_features
        if self.batch_size is None:
            batch_size = int(ceil(1. / sparsity))
        else:
            batch_size = self.batch_size

        comp_norm = jnp.zeros((self.n_components,), dtype)
        C = jnp.zeros((self.n_components, self.n_components), dtype)
        B = jnp.zeros((self.n_components, n_features), dtype)
        n_iter = jnp.zeros((), jnp.int32)

        if self.verbose:
            log_lim = log(n_samples * self.n_epochs / batch_size, 10)
            self.verbose_iter_ = ((np.logspace(0, log_lim, self.verbose,
                                               base=10) - 1)
                                  * batch_size).tolist()

        # SPMD placement (mesh): learner state replicated, padded batch
        # rows sharded over dp so the vmapped ridge solves fan out.
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            mesh = self.mesh
            n_dp = mesh.shape.get('dp', 1)

            def rep(x):
                return jax.device_put(x, NamedSharding(mesh, P()))

            def _dp_axis(x, axis):
                spec = [None] * x.ndim
                if x.shape[axis] % n_dp == 0:
                    spec[axis] = 'dp'
                return jax.device_put(np.asarray(x),
                                      NamedSharding(mesh, P(*spec)))

            def dp_w(x):      # (W, b, ...) window stacks: rows = axis 1
                return _dp_axis(x, 1)

            def dp_b(x):      # (b, ...) single batches: rows = axis 0
                return _dp_axis(x, 0)

            D, C, B = rep(D), rep(C), rep(B)
            comp_norm, feature_n_iter = rep(comp_norm), rep(feature_n_iter)
            n_iter, code = rep(n_iter), rep(code)
        else:
            rep = dp_w = dp_b = jnp.asarray

        self._D, self._C, self._B = D, C, B
        self._code = code
        alpha = float(self.alpha)
        lr = float(self.learning_rate)

        # VMEM-resident Pallas kernel for the union-BCD (TPU, f32, the
        # full feature width fits the kernel's budget at recsys scales).
        # Mesh fits keep the kernel too: the call is shard_map-wrapped
        # with replicated specs (_union_bcd_kernel_call), exactly like
        # the SOMF step's _step.py::_bcd_kernel_call — ``use_pallas``
        # then carries the (hashable) mesh through the jitted steps.
        from ..ops import bcd_pallas
        use_pallas = (_pallas_backend_ok()
                      and np.dtype(dtype) == np.float32
                      and bcd_pallas.supported(self.n_components,
                                               n_features, np.float32,
                                               0.0))
        if use_pallas and self.mesh is not None:
            use_pallas = self.mesh

        interactive = bool(self.verbose) or (self.callback is not None)
        window = 1 if interactive else 32

        # Pack the whole matrix once and gather batches on device when
        # the padded size is moderate (uniform-ish row lengths): epochs
        # then move only row ids over the host link and compile at most
        # three shapes. Power-law data (global max row length >> median)
        # keeps the adaptive per-window host packing below. Under a
        # mesh the packed rows are SHARDED over dp (dataset sharding:
        # each device stores 1/n_dp of the padded CSR, so resident
        # capacity scales with the mesh) and batches are reassembled
        # inside the step by an exact one-hot psum gather
        # (_make_resident_gather); the trajectory matches the
        # single-device fit up to GSPMD's f32 reduction reordering
        # (1e-9 at f64, tests/test_parallel.py).
        window_resident_fn = _recsys_window_resident
        batch_resident_fn = _recsys_batch_resident
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            resident = _pad_all_rows(X, n_features, dtype, n_dp=n_dp)
            if resident is not None:
                idx_all, val_all, lens_all, P_res = resident
                row_shard = NamedSharding(self.mesh, P('dp'))
                resident = (jax.device_put(idx_all, row_shard),
                            jax.device_put(val_all, row_shard),
                            jax.device_put(lens_all, row_shard), P_res)
                _check_contiguous_dp_shards(resident[0], self.mesh)
                window_resident_fn, batch_resident_fn = \
                    _resident_steps_mesh(self.mesh, batch_size, n_dp)
        else:
            resident = _pad_all_rows(X, n_features, dtype)
        self._resident_spec = (getattr(resident[0].sharding, 'spec', ())
                               if resident is not None else None)

        for _ in range(self.n_epochs):
            permutation = self.random_state.permutation(n_samples)
            batches = list(gen_batches(n_samples, batch_size))
            # group full-size batches into windows; odd-size tails run
            # one-by-one (different static shape)
            pos = 0
            while pos < len(batches):
                group = [bt for bt in batches[pos:pos + window]
                         if bt.stop - bt.start == batch_size]
                group = group if len(group) == window else []
                if group and not interactive:
                    rows_w = np.stack([permutation[bt] for bt in group])
                    orders_w = np.stack(
                        [self.random_state.permutation(self.n_components)
                         for _ in group])
                    if resident is not None:
                        idx_all, val_all, lens_all, _ = resident
                        (D, C, B, comp_norm, feature_n_iter, n_iter,
                         code) = window_resident_fn(
                            D, C, B, comp_norm, feature_n_iter, n_iter,
                            code, idx_all, val_all, lens_all,
                            jnp.asarray(rows_w), jnp.asarray(orders_w),
                            alpha, lr, use_pallas=use_pallas)
                    else:
                        idx_w, val_w, lens_w, P = _pad_rows_window(
                            X, rows_w, n_features, dtype)
                        (D, C, B, comp_norm, feature_n_iter, n_iter,
                         code) = _recsys_window(
                            D, C, B, comp_norm, feature_n_iter, n_iter,
                            code, dp_w(rows_w), dp_w(idx_w),
                            dp_w(val_w), dp_w(lens_w),
                            jnp.asarray(orders_w), alpha, lr,
                            use_pallas=use_pallas)
                    pos += window
                    continue
                batch = batches[pos]
                pos += 1
                rows = permutation[batch]
                if self.verbose and getattr(self, 'verbose_iter_', None) \
                        and int(n_iter) >= self.verbose_iter_[0]:
                    print('Iteration %i' % int(n_iter))
                    self.verbose_iter_ = self.verbose_iter_[1:]
                    self._callback()
                elif not self.verbose and self.callback is not None:
                    self._callback()  # hooks work without a print schedule
                order = jnp.asarray(
                    self.random_state.permutation(self.n_components))
                if resident is not None:
                    idx_all, val_all, lens_all, _ = resident
                    (D, C, B, comp_norm, feature_n_iter, n_iter,
                     code) = batch_resident_fn(
                        D, C, B, comp_norm, feature_n_iter, n_iter, code,
                        idx_all, val_all, lens_all, jnp.asarray(rows),
                        order, alpha, lr, use_pallas=use_pallas)
                else:
                    idx, val, lens, P = _pad_rows(X, rows, n_features,
                                                  dtype)
                    idx_d = dp_b(idx)
                    val_d = dp_b(val)
                    lens_d = dp_b(lens)
                    code_b = _masked_ridge_codes(D, idx_d, val_d, lens_d,
                                                 alpha)
                    code = code.at[jnp.asarray(rows)].set(code_b)
                    D, C, B, comp_norm, feature_n_iter, n_iter = \
                        _recsys_batch_step(
                            D, C, B, comp_norm, feature_n_iter, n_iter,
                            code_b, idx_d, val_d, lens_d, order, lr,
                            use_pallas=use_pallas)
                self._D, self._C, self._B = D, C, B
                self._code = code
            self._D, self._C, self._B = D, C, B
            self._code = code
        code = self._refit_device(D, X, dtype)
        self._D, self._code = D, code
        self.n_iter_ = int(n_iter)
        return self

    def _refit_device(self, D, X, dtype, chunk=2048):
        """Recompute all codes with the current dictionary
        (recsys.py:254-265). One shared pad width across chunks keeps
        the number of compiled programs at <= 2 (full + tail chunk)."""
        n_samples, n_features = X.shape
        out = np.zeros((n_samples, self.n_components), dtype)
        alpha = float(self.alpha)
        max_len = int(np.diff(X.indptr).max()) if X.nnz else 1
        width = _next_pow2(max(max_len, 1))
        for batch in gen_batches(n_samples, chunk):
            rows = np.arange(batch.start, batch.stop)
            idx, val, lens, P = _pad_rows(X, rows, n_features, dtype,
                                          width=width)
            code_b = _masked_ridge_codes(D, jnp.asarray(idx),
                                         jnp.asarray(val),
                                         jnp.asarray(lens), alpha)
            out[batch] = np.asarray(code_b)
        return jnp.asarray(out)

    def _callback(self):
        if self.callback is not None:
            self.callback(self)

    # pickling: device arrays -> host numpy (cross-backend restore) ----- #

    _DEVICE_FIELDS = ('_D', '_C', '_B', '_code')

    def __getstate__(self):
        state = dict(self.__dict__)
        for f in self._DEVICE_FIELDS:
            if f in state and state[f] is not None:
                state[f] = ('__np__', np.asarray(state[f]))
        return state

    def __setstate__(self, state):
        for f in self._DEVICE_FIELDS:
            v = state.get(f)
            if isinstance(v, tuple) and v and v[0] == '__np__':
                state[f] = jnp.asarray(v[1])
        self.__dict__ = state

    # sklearn-style views ------------------------------------------------ #

    @property
    def components_(self):
        return np.asarray(self._D)

    @property
    def code_(self):
        return np.asarray(self._code)

    @property
    def C_(self):
        return np.asarray(self._C)

    @property
    def B_(self):
        return np.asarray(self._B)

    def predict(self, X):
        """Predicted values at the stored entries of X (recsys.py:215-244)."""
        if not sp.issparse(X):
            X = sp.csr_matrix(X)
        X = check_array(X, accept_sparse='csr')
        n_samples = X.shape[0]
        row_idx = np.repeat(np.arange(n_samples),
                            np.diff(X.indptr)).astype(np.int32)
        col_idx = X.indices.astype(np.int32)
        out = np.array(_predict_entries(self._code, self._D,
                                        jnp.asarray(row_idx),
                                        jnp.asarray(col_idx)),
                       dtype=np.float64)

        if self.detrend:
            out += self.row_mean_.take(row_idx)
            out += self.col_mean_.take(col_idx, mode='clip')

        if self.crop is not None:
            out[out > self.crop[1]] = self.crop[1]
            out[out < self.crop[0]] = self.crop[0]

        return sp.csr_matrix((out, X.indices, X.indptr), shape=X.shape)

    def score(self, X):
        """RMSE at the stored entries (recsys.py:246-252)."""
        if not sp.issparse(X):
            X = sp.csr_matrix(X)
        X = check_array(X, accept_sparse='csr')
        X_pred = self.predict(X)
        return rmse(X, X_pred)


def compute_biases(X, beta=0, inplace=False):
    """Row/column detrending biases of a CSR rating matrix.

    Functional contract of the reference ``compute_biases``
    (recsys.py:268-306): two alternating rounds of damped row-mean then
    column-mean removal; ``beta`` shrinks row means toward the global
    mean and damps column means. Implemented as flat segment sums over
    the COO triplets (``np.bincount`` on the row/column ids of every
    stored entry) — one vectorised pass per round instead of the
    reference's per-row Python loop.
    """
    if not inplace:
        X = X.copy()
    X = sp.csr_matrix(X)
    n_rows, n_cols = X.shape
    vals = X.data
    rows = np.repeat(np.arange(n_rows), np.diff(X.indptr))
    cols = X.indices

    cnt_r = np.maximum(np.bincount(rows, minlength=n_rows), 1)
    cnt_c = np.maximum(np.bincount(cols, minlength=n_cols), 1)
    global_mean = vals.mean() if X.nnz else 0.0

    bias_r = np.zeros(n_rows)
    bias_c = np.zeros(n_cols)
    for _ in range(2):
        w_r = ((np.bincount(rows, weights=vals, minlength=n_rows)
                + global_mean * beta) / (cnt_r + beta))
        vals -= w_r[rows]
        w_c = (np.bincount(cols, weights=vals, minlength=n_cols)
               / (cnt_c + beta))
        vals -= w_c[cols]
        bias_r += w_r
        bias_c += w_c
    return bias_r, bias_c


def rmse(X_true, X_pred):
    """Root mean squared error between two same-pattern sparse matrices."""
    X_true = check_array(X_true, accept_sparse='csr')
    X_pred = check_array(X_pred, accept_sparse='csr')
    return np.sqrt(np.mean((X_true.data - X_pred.data) ** 2))
