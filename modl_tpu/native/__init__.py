"""ctypes bindings for the native host-side input-pipeline kernels.

The shared library is built on demand with g++ (``make native`` or lazily
at first use) and cached next to the sources. Every entry point has a
pure-numpy fallback, so the package works without a toolchain.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'csr_pack.cpp')
_SO = os.path.join(_HERE, '_csr_pack.so')

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    subprocess.run(
        ['g++', '-O3', '-march=native', '-shared', '-fPIC', _SRC,
         '-o', _SO],
        check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            f32p = ctypes.POINTER(ctypes.c_float)
            f64p = ctypes.POINTER(ctypes.c_double)
            lib.pack_rows_f32.restype = ctypes.c_int64
            lib.pack_rows_f32.argtypes = [
                i64p, i32p, f32p, i64p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, i32p, f32p, i32p]
            lib.pack_rows_f64.restype = ctypes.c_int64
            lib.pack_rows_f64.argtypes = [
                i64p, i32p, f64p, i64p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, i32p, f64p, i32p]
            lib.row_lengths.restype = None
            lib.row_lengths.argtypes = [i64p, i64p, ctypes.c_int64, i64p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def pack_rows(indptr, indices, data, rows, P, pad_index, dtype):
    """Native CSR row packing; returns (idx, val, lens) or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    dtype = np.dtype(dtype)
    if dtype not in (np.dtype(np.float32), np.dtype(np.float64)):
        return None
    n_rows = len(rows)
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, dtype)
    rows = np.ascontiguousarray(rows, np.int64)
    out_idx = np.empty((n_rows, P), np.int32)
    out_val = np.empty((n_rows, P), dtype)
    out_lens = np.empty((n_rows,), np.int32)

    def ptr(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    fn = lib.pack_rows_f32 if dtype == np.float32 else lib.pack_rows_f64
    val_ct = ctypes.c_float if dtype == np.float32 else ctypes.c_double
    fn(ptr(indptr, ctypes.c_int64), ptr(indices, ctypes.c_int32),
       ptr(data, val_ct), ptr(rows, ctypes.c_int64),
       ctypes.c_int64(n_rows), ctypes.c_int64(P),
       ctypes.c_int32(pad_index),
       ptr(out_idx, ctypes.c_int32), ptr(out_val, val_ct),
       ptr(out_lens, ctypes.c_int32))
    return out_idx, out_val, out_lens
