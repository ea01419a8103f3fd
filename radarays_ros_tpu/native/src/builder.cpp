// Native host-side scene builder for radarays_ros_tpu.
//
// The TPU compute path lives in XLA; the host-side runtime work that the
// reference delegates to native code (rmagine/Embree BVH builds,
// CMakeLists.txt:29-36) is done here in C++: Morton ordering of triangle
// centroids (the basis of the chunk/AABB acceleration structure consumed by
// the culled MXU and Pallas tracers) and fast binary mesh parsing helpers.
//
// Exposed as a plain C ABI consumed via ctypes (native/builder.py).
//
// Build: make -C radarays_ros_tpu/native

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

inline uint64_t spread_bits_3(uint64_t x) {
  x &= 0x3FF;
  x = (x | (x << 16)) & 0x030000FF;
  x = (x | (x << 8)) & 0x0300F00F;
  x = (x | (x << 4)) & 0x030C30C3;
  x = (x | (x << 2)) & 0x09249249;
  return x;
}

inline uint64_t morton3(uint32_t x, uint32_t y, uint32_t z) {
  return spread_bits_3(x) | (spread_bits_3(y) << 1) | (spread_bits_3(z) << 2);
}

}  // namespace

extern "C" {

// Argsort of N 3-D points by 30-bit Morton code of their quantized
// coordinates. centers: row-major (N, 3) float32; out: (N,) int64 order.
void rr_morton_order(const float* centers, int64_t n, int64_t* out) {
  if (n <= 0) return;
  float lo[3] = {centers[0], centers[1], centers[2]};
  float hi[3] = {centers[0], centers[1], centers[2]};
  for (int64_t i = 0; i < n; ++i) {
    for (int k = 0; k < 3; ++k) {
      const float v = centers[i * 3 + k];
      lo[k] = std::min(lo[k], v);
      hi[k] = std::max(hi[k], v);
    }
  }
  float inv[3];
  for (int k = 0; k < 3; ++k) {
    const float ext = hi[k] - lo[k];
    inv[k] = ext > 1e-12f ? 1023.0f / ext : 0.0f;
  }

  std::vector<uint64_t> codes(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    uint32_t q[3];
    for (int k = 0; k < 3; ++k) {
      float v = (centers[i * 3 + k] - lo[k]) * inv[k];
      v = std::max(0.0f, std::min(1023.0f, v));
      q[k] = static_cast<uint32_t>(v);
    }
    codes[static_cast<size_t>(i)] = morton3(q[0], q[1], q[2]);
  }

  std::vector<int64_t> order(static_cast<size_t>(n));
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return codes[static_cast<size_t>(a)] < codes[static_cast<size_t>(b)];
  });
  std::memcpy(out, order.data(), sizeof(int64_t) * static_cast<size_t>(n));
}

// Axis-aligned bounding boxes of fixed-size triangle chunks.
// verts: (C * chunk, 3, 3) float32; writes lo/hi as (C, 3) float32.
void rr_chunk_aabbs(const float* verts, int64_t n_chunks, int64_t chunk,
                    float* lo_out, float* hi_out) {
  for (int64_t c = 0; c < n_chunks; ++c) {
    float lo[3] = {INFINITY, INFINITY, INFINITY};
    float hi[3] = {-INFINITY, -INFINITY, -INFINITY};
    const float* base = verts + c * chunk * 9;
    for (int64_t t = 0; t < chunk * 3; ++t) {
      for (int k = 0; k < 3; ++k) {
        const float v = base[t * 3 + k];
        lo[k] = std::min(lo[k], v);
        hi[k] = std::max(hi[k], v);
      }
    }
    for (int k = 0; k < 3; ++k) {
      lo_out[c * 3 + k] = lo[k];
      hi_out[c * 3 + k] = hi[k];
    }
  }
}

}  // extern "C"
