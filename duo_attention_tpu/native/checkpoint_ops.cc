// Native checkpoint layout engine.
//
// The hot, CPU-bound part of checkpoint conversion (models/convert.py) is
// re-laying-out projection matrices: HF stores [out_features, in_features];
// the TPU param pytree wants [in_features, out_features], with the
// DuoAttention KV-head permutation (reference: duo_attn/patch/utils.py:6-45)
// folded into the output-channel order. For an 8B checkpoint this is ~16 GB
// of strided traffic; numpy does it single-threaded. This library does a
// blocked, multithreaded transpose with an optional fused column gather,
// reading straight out of the safetensors mmap (zero copies before the
// write into the destination buffer).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment):
//   ct_transpose_gather(src, dst, rows, cols, elem_size, perm, perm_len,
//                       col_perm, col_perm_len, nthreads)
//     src: [rows, cols] row-major, element size 2/4/8 bytes
//     dst: [cols, rows] row-major;
//     dst[c, r] = src[perm ? perm[r] : r, col_perm ? col_perm[c] : c]
//     perm: optional int64 permutation over src rows (the out-channel /
//           head permutation for q/k/v projections), perm_len == rows when
//           present, else pass nullptr/0.
//     col_perm: optional int64 permutation over src cols (the in-channel
//           permutation for the o projection), col_perm_len == cols when
//           present, else nullptr/0.
//   ct_memcpy_mt(src, dst, nbytes, nthreads): parallel memcpy for
//     non-transposed tensors (embeddings, norms).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

constexpr int kBlock = 64;  // cache-blocked tile edge (elements)

template <typename T>
void transpose_gather_range(const T* src, T* dst, int64_t rows, int64_t cols,
                            const int64_t* perm, const int64_t* col_perm,
                            int64_t col_begin, int64_t col_end) {
  // dst is [cols, rows]; we own dst rows [col_begin, col_end).
  for (int64_t cb = col_begin; cb < col_end; cb += kBlock) {
    int64_t ce = std::min<int64_t>(cb + kBlock, col_end);
    for (int64_t rb = 0; rb < rows; rb += kBlock) {
      int64_t re = std::min<int64_t>(rb + kBlock, rows);
      for (int64_t r = rb; r < re; ++r) {
        const T* s = src + (perm ? perm[r] : r) * cols;
        for (int64_t c = cb; c < ce; ++c) {
          dst[c * rows + r] = s[col_perm ? col_perm[c] : c];
        }
      }
    }
  }
}

template <typename T>
void transpose_gather(const T* src, T* dst, int64_t rows, int64_t cols,
                      const int64_t* perm, const int64_t* col_perm,
                      int nthreads) {
  nthreads = std::max(1, nthreads);
  if (nthreads == 1 || cols < 2 * kBlock) {
    transpose_gather_range<T>(src, dst, rows, cols, perm, col_perm, 0, cols);
    return;
  }
  std::vector<std::thread> workers;
  int64_t per = (cols + nthreads - 1) / nthreads;
  // round shard edges to the block size so tiles never straddle threads
  per = (per + kBlock - 1) / kBlock * kBlock;
  for (int t = 0; t < nthreads; ++t) {
    int64_t b = t * per;
    int64_t e = std::min<int64_t>(b + per, cols);
    if (b >= e) break;
    workers.emplace_back(transpose_gather_range<T>, src, dst, rows, cols,
                         perm, col_perm, b, e);
  }
  for (auto& w : workers) w.join();
}

}  // namespace

extern "C" {

int ct_transpose_gather(const void* src, void* dst, int64_t rows,
                        int64_t cols, int elem_size, const int64_t* perm,
                        int64_t perm_len, const int64_t* col_perm,
                        int64_t col_perm_len, int nthreads) {
  if (perm && perm_len != rows) return -1;
  if (col_perm && col_perm_len != cols) return -1;
  switch (elem_size) {
    case 2:
      transpose_gather<uint16_t>(static_cast<const uint16_t*>(src),
                                 static_cast<uint16_t*>(dst), rows, cols,
                                 perm, col_perm, nthreads);
      return 0;
    case 4:
      transpose_gather<uint32_t>(static_cast<const uint32_t*>(src),
                                 static_cast<uint32_t*>(dst), rows, cols,
                                 perm, col_perm, nthreads);
      return 0;
    case 8:
      transpose_gather<uint64_t>(static_cast<const uint64_t*>(src),
                                 static_cast<uint64_t*>(dst), rows, cols,
                                 perm, col_perm, nthreads);
      return 0;
    default:
      return -2;
  }
}

int ct_memcpy_mt(const void* src, void* dst, int64_t nbytes, int nthreads) {
  nthreads = std::max(1, nthreads);
  if (nthreads == 1 || nbytes < (8 << 20)) {
    std::memcpy(dst, src, static_cast<size_t>(nbytes));
    return 0;
  }
  std::vector<std::thread> workers;
  int64_t per = (nbytes + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t b = t * per;
    int64_t e = std::min<int64_t>(b + per, nbytes);
    if (b >= e) break;
    workers.emplace_back([=] {
      std::memcpy(static_cast<char*>(dst) + b,
                  static_cast<const char*>(src) + b,
                  static_cast<size_t>(e - b));
    });
  }
  for (auto& w : workers) w.join();
  return 0;
}

}  // extern "C"
