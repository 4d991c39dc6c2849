// Host-side native kernels for the TPU input pipeline.
//
// The reference's compiled layer (Cython/C) served two roles: numeric
// kernels (reimplemented as XLA/jnp programs on the device) and data
// marshalling (recsys_fast.pyx CSR iteration, image_fast.pyx patch
// masks). This file is the TPU-native equivalent of the marshalling
// role: packing sparse CSR rows into fixed-width padded tensors that
// feed the device (see modl_tpu/decomposition/recsys.py::_pad_rows).
// At MovieLens-10M scale the Python per-row loop dominates host time;
// this is a single pass of memcpys.
//
// Built as a plain shared library, bound via ctypes (no pybind11).

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Pack selected CSR rows into (n_rows, P) padded index/value arrays.
//   indptr   : CSR row pointer, int64[n_samples+1]
//   indices  : CSR column indices, int32[nnz]
//   data     : CSR values, float32[nnz]
//   rows     : row ids to pack, int64[n_rows]
//   pad_index: fill value for out_idx (n_features; dropped by XLA)
//   out_idx  : int32[n_rows * P]   (pre-allocated)
//   out_val  : float32[n_rows * P] (pre-allocated, zero-filled by callee)
//   out_lens : int32[n_rows]
// Returns the maximum row length seen (for width checking).
int64_t pack_rows_f32(const int64_t* indptr, const int32_t* indices,
                      const float* data, const int64_t* rows,
                      int64_t n_rows, int64_t P, int32_t pad_index,
                      int32_t* out_idx, float* out_val,
                      int32_t* out_lens) {
    int64_t max_len = 0;
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t r = rows[i];
        const int64_t start = indptr[r];
        int64_t len = indptr[r + 1] - start;
        if (len > max_len) max_len = len;
        const int64_t use = std::min(len, P);
        int32_t* idx_row = out_idx + i * P;
        float* val_row = out_val + i * P;
        std::memcpy(idx_row, indices + start, use * sizeof(int32_t));
        std::memcpy(val_row, data + start, use * sizeof(float));
        for (int64_t j = use; j < P; ++j) {
            idx_row[j] = pad_index;
            val_row[j] = 0.0f;
        }
        out_lens[i] = static_cast<int32_t>(use);
    }
    return max_len;
}

int64_t pack_rows_f64(const int64_t* indptr, const int32_t* indices,
                      const double* data, const int64_t* rows,
                      int64_t n_rows, int64_t P, int32_t pad_index,
                      int32_t* out_idx, double* out_val,
                      int32_t* out_lens) {
    int64_t max_len = 0;
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t r = rows[i];
        const int64_t start = indptr[r];
        int64_t len = indptr[r + 1] - start;
        if (len > max_len) max_len = len;
        const int64_t use = std::min(len, P);
        int32_t* idx_row = out_idx + i * P;
        double* val_row = out_val + i * P;
        std::memcpy(idx_row, indices + start, use * sizeof(int32_t));
        std::memcpy(val_row, data + start, use * sizeof(double));
        for (int64_t j = use; j < P; ++j) {
            idx_row[j] = pad_index;
            val_row[j] = 0.0;
        }
        out_lens[i] = static_cast<int32_t>(use);
    }
    return max_len;
}

// Row lengths for a set of rows (used to size the padded width).
void row_lengths(const int64_t* indptr, const int64_t* rows,
                 int64_t n_rows, int64_t* out_lens) {
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t r = rows[i];
        out_lens[i] = indptr[r + 1] - indptr[r];
    }
}

}  // extern "C"
