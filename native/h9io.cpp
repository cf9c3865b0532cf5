// h9io: native host-side data-plumbing kernels for hybrid9-tpu.
//
// C++ implementations of the host-side hot paths that surround the TPU
// compute graph — the analog of the reference's compiled-Fortran ingest
// code (SOURCE/INIT.f90:492-600 box-average regrid of 30-arc-sec soil
// fields; SOURCE/READ_NET_CDF_*.f90 hyperslab gathers).  Exposed with a
// plain C ABI and loaded from Python via ctypes (hybrid9_tpu/io/native.py);
// every entry point has a NumPy fallback so the build is optional.
//
// Build: make -C native   (produces libh9io.so)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run fn(i) for i in [0, n) across hardware threads.
template <typename F>
void parallel_for(int64_t n, F fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nthreads = hw ? static_cast<int64_t>(hw) : 2;
  if (nthreads > n) nthreads = n > 0 ? n : 1;
  if (nthreads <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (int64_t t = 0; t < nthreads; ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto &th : pool) th.join();
}

}  // namespace

extern "C" {

// Box-average a fine grid [ny*f, nx*f] down to [ny, nx], ignoring NaNs
// (missing soil).  The vector form of the 60x60 -> 0.5 degree average at
// INIT.f90:579-600.  Cells with no valid fine samples produce NaN.
void h9_box_average(const double *fine, int64_t ny, int64_t nx,
                    int64_t factor, double *coarse) {
  parallel_for(ny, [&](int64_t cy) {
    for (int64_t cx = 0; cx < nx; ++cx) {
      double sum = 0.0;
      int64_t count = 0;
      for (int64_t fy = cy * factor; fy < (cy + 1) * factor; ++fy) {
        const double *row = fine + fy * (nx * factor);
        for (int64_t fx = cx * factor; fx < (cx + 1) * factor; ++fx) {
          double v = row[fx];
          if (!std::isnan(v)) {
            sum += v;
            ++count;
          }
        }
      }
      coarse[cy * nx + cx] =
          count ? sum / static_cast<double>(count)
                : std::nan("");
    }
  });
}

// Gather flat-indexed cells from a [size] field into a packed [n] array,
// filling [n, n_padded) with `fill` — the land-cell pack
// (hybrid9_tpu/grids/grid.py) as float32 for the device.
void h9_pack_gather_f32(const float *src, const int64_t *idx, int64_t n,
                        int64_t n_padded, float fill, float *dst) {
  parallel_for(n, [&](int64_t i) { dst[i] = src[idx[i]]; });
  for (int64_t i = n; i < n_padded; ++i) dst[i] = fill;
}

void h9_pack_gather_f64(const double *src, const int64_t *idx, int64_t n,
                        int64_t n_padded, double fill, double *dst) {
  parallel_for(n, [&](int64_t i) { dst[i] = src[idx[i]]; });
  for (int64_t i = n; i < n_padded; ++i) dst[i] = fill;
}

// Scatter a packed [n] array back onto a [size] flat field pre-filled by
// the caller (the output-side inverse; WRITE_NET_CDF_3DR's NaN fill,
// WRITE_NET_CDF_3DR.f90:186-197).
void h9_scatter_f32(const float *packed, const int64_t *idx, int64_t n,
                    float *dst) {
  parallel_for(n, [&](int64_t i) { dst[idx[i]] = packed[i]; });
}

void h9_scatter_f64(const double *packed, const int64_t *idx, int64_t n,
                    double *dst) {
  parallel_for(n, [&](int64_t i) { dst[idx[i]] = packed[i]; });
}

// Convert a [t, ny, nx] daily forcing brick to packed [t, n] float32 in
// one pass (gather + narrowing), the layout transform between NetCDF
// bricks (READ_NET_CDF_3DR.f90:95-97) and the device-ready block.
void h9_pack_forcing_block(const float *brick, int64_t t, int64_t size,
                           const int64_t *idx, int64_t n,
                           int64_t n_padded, float *dst) {
  parallel_for(t, [&](int64_t ti) {
    const float *src = brick + ti * size;
    float *out = dst + ti * n_padded;
    for (int64_t i = 0; i < n; ++i) out[i] = src[idx[i]];
    for (int64_t i = n; i < n_padded; ++i) out[i] = 0.0f;
  });
}

int h9_abi_version(void) { return 1; }

}  // extern "C"
