"""Native C++ CSR packer: build, bind, and match the numpy fallback."""
import numpy as np
import pytest
import scipy.sparse as sp

from modl_tpu.native import get_lib, pack_rows


def _numpy_pack(X, rows, P, pad_index, dtype):
    b = len(rows)
    starts = X.indptr[rows]
    lens = X.indptr[rows + 1] - starts
    idx = np.full((b, P), pad_index, dtype=np.int32)
    val = np.zeros((b, P), dtype=dtype)
    for i in range(b):
        L = lens[i]
        idx[i, :L] = X.indices[starts[i]:starts[i] + L]
        val[i, :L] = X.data[starts[i]:starts[i] + L]
    return idx, val, lens.astype(np.int32)


@pytest.mark.skipif(get_lib() is None,
                    reason="native toolchain unavailable")
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_pack_rows_matches_numpy(dtype):
    rng = np.random.RandomState(0)
    X = sp.random(50, 40, density=0.2, random_state=0,
                  format='csr').astype(dtype)
    rows = rng.permutation(50)[:16]
    P = 16
    got = pack_rows(X.indptr, X.indices, X.data, rows, P, 40, dtype)
    assert got is not None
    idx, val, lens = got
    eidx, eval_, elens = _numpy_pack(X, rows, P, 40, dtype)
    np.testing.assert_array_equal(idx, eidx)
    np.testing.assert_array_equal(val, eval_)
    np.testing.assert_array_equal(lens, elens)


@pytest.mark.skipif(get_lib() is None,
                    reason="native toolchain unavailable")
def test_pack_rows_empty_rows():
    X = sp.csr_matrix(np.zeros((5, 8)))
    got = pack_rows(X.indptr, X.indices, X.data, np.arange(5), 4, 8,
                    np.float64)
    idx, val, lens = got
    assert np.all(idx == 8)
    assert np.all(val == 0)
    assert np.all(lens == 0)
