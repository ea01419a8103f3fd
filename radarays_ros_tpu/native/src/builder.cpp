// Native host-side scene builder for radarays_ros_tpu.
//
// The TPU compute path lives in XLA; the host-side runtime work that the
// reference delegates to native code (rmagine/Embree BVH builds,
// CMakeLists.txt:29-36) is done here in C++: median-split leaf ordering of
// triangle centroids (the chunk/AABB acceleration structure consumed by the
// culled MXU and Pallas tracers) and fast binary mesh parsing helpers.
//
// Exposed as a plain C ABI consumed via ctypes (native/builder.py).
//
// Build: make -C radarays_ros_tpu/native

#include <algorithm>
#include <cmath>
#include <array>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Version of the TABLE-CONTENT semantics of this builder (median-split
// tie-breaking, plane layout, bf16 split scheme, ...). Bump on any change
// that alters produced bytes: it is folded into the on-disk scene-cache
// key (geom/cache.py:scene_cache_key), so stale cached tables are never
// served after a builder change. Keep in sync with the fallback constant
// in native/builder.py.
int64_t rr_builder_version(void) { return 1; }

// Top-down longest-axis median split into leaves of exactly chunk_size
// triangles (the permutation geom/scene.py:_median_split_order computes in
// NumPy; C++ nth_element is ~10x faster at 1M triangles). Requires
// n % chunk_size == 0 (callers pad first); split points are snapped to
// chunk_size multiples so every leaf is exactly full. Recursion is an
// explicit stack; sub-ranges partition [out, out+n) in place.
void rr_median_split_order(const float* centers, int64_t n,
                           int64_t chunk_size, int64_t* out) {
  if (n <= 0) return;
  std::iota(out, out + n, int64_t{0});
  struct Range { int64_t lo, hi; };
  std::vector<Range> stack;
  stack.push_back({0, n});
  while (!stack.empty()) {
    const Range r = stack.back();
    stack.pop_back();
    const int64_t len = r.hi - r.lo;
    if (len <= chunk_size) continue;
    float mn[3], mx[3];
    for (int k = 0; k < 3; ++k) {
      mn[k] = centers[out[r.lo] * 3 + k];
      mx[k] = mn[k];
    }
    for (int64_t i = r.lo + 1; i < r.hi; ++i) {
      const float* c = centers + out[i] * 3;
      for (int k = 0; k < 3; ++k) {
        mn[k] = std::min(mn[k], c[k]);
        mx[k] = std::max(mx[k], c[k]);
      }
    }
    int ax = 0;
    float best = mx[0] - mn[0];
    for (int k = 1; k < 3; ++k) {
      if (mx[k] - mn[k] > best) {
        best = mx[k] - mn[k];
        ax = k;
      }
    }
    int64_t half = ((len / 2) / chunk_size) * chunk_size;
    if (half == 0) half = chunk_size;
    std::nth_element(out + r.lo, out + r.lo + half, out + r.hi,
                     [&](int64_t a, int64_t b) {
                       return centers[a * 3 + ax] < centers[b * 3 + ax];
                     });
    stack.push_back({r.lo, r.lo + half});
    stack.push_back({r.lo + half, r.hi});
  }
}

// SAH-scored variant of rr_median_split_order (same leaf contract; the
// C++ counterpart of geom/scene.py:_median_split_order_sah and written
// to match it BIT-FOR-BIT: stable sorts, f32 prefix/suffix AABB scans,
// f32 surface areas with the same association, f64 cost, first-minimum
// tie-breaks). At every node all 3 axes x all chunk_size-snapped split
// positions are scored with SA(left)*n_left + SA(right)*n_right where
// the child AABBs come from prefix/suffix min/max scans of the
// per-TRIANGLE AABBs (tri_lo/tri_hi, (n, 3) f32 each), so the score
// reflects the real chunk AABBs the Pallas sweep will slab-test.
// Classic presorted full-sweep build, O(n log n): one stable sort per
// axis at the root; every node carries its triangle set sorted by all 3
// axes as contiguous ranges of three index arrays, and children inherit
// each sorted order by a stable flag-partition (O(m) per axis per node).
void rr_sah_split_order(const float* centers, const float* tri_lo,
                        const float* tri_hi, int64_t n, int64_t chunk_size,
                        int64_t* out) {
  if (n <= 0) return;
  std::vector<int64_t> A[3];
  for (int ax = 0; ax < 3; ++ax) {
    A[ax].resize(n);
    std::iota(A[ax].begin(), A[ax].end(), int64_t{0});
    std::stable_sort(A[ax].begin(), A[ax].end(), [&](int64_t a, int64_t b) {
      return centers[a * 3 + ax] < centers[b * 3 + ax];
    });
  }
  struct Range { int64_t lo, hi; };
  std::vector<Range> stack;
  stack.push_back({0, n});
  // reusable scratch (nodes are fully processed before the next pops)
  std::vector<float> pl(6 * n);  // prefix (left-child) AABB min/max
  std::vector<float> sf(6 * n);  // suffix (right-child) AABB min/max
  std::vector<uint8_t> flag(n, 0);
  std::vector<int64_t> tl, tr;
  tl.reserve(n);
  tr.reserve(n);
  while (!stack.empty()) {
    const Range r = stack.back();
    stack.pop_back();
    const int64_t m = r.hi - r.lo;
    if (m <= chunk_size) continue;
    const int64_t n_pos = m / chunk_size - 1;
    double best_cost = 0.0;
    int64_t best_h = -1;
    int best_ax = 0;
    for (int ax = 0; ax < 3; ++ax) {
      const int64_t* ids = A[ax].data() + r.lo;
      for (int64_t i = 0; i < m; ++i) {         // prefix scans (f32)
        const float* lo3 = tri_lo + ids[i] * 3;
        const float* hi3 = tri_hi + ids[i] * 3;
        for (int k = 0; k < 3; ++k) {
          pl[i * 6 + k] = i ? std::min(pl[(i - 1) * 6 + k], lo3[k]) : lo3[k];
          pl[i * 6 + 3 + k] =
              i ? std::max(pl[(i - 1) * 6 + 3 + k], hi3[k]) : hi3[k];
        }
      }
      for (int64_t i = m - 1; i >= 0; --i) {    // suffix scans (f32)
        const float* lo3 = tri_lo + ids[i] * 3;
        const float* hi3 = tri_hi + ids[i] * 3;
        for (int k = 0; k < 3; ++k) {
          sf[i * 6 + k] = i < m - 1
              ? std::min(sf[(i + 1) * 6 + k], lo3[k]) : lo3[k];
          sf[i * 6 + 3 + k] = i < m - 1
              ? std::max(sf[(i + 1) * 6 + 3 + k], hi3[k]) : hi3[k];
        }
      }
      int64_t ax_h = -1;
      double ax_cost = 0.0;
      for (int64_t p = 1; p <= n_pos; ++p) {    // snapped split positions
        const int64_t h = p * chunk_size;
        const float* L = &pl[(h - 1) * 6];
        const float* R = &sf[h * 6];
        const float dl0 = L[3] - L[0], dl1 = L[4] - L[1], dl2 = L[5] - L[2];
        const float dr0 = R[3] - R[0], dr1 = R[4] - R[1], dr2 = R[5] - R[2];
        const float sa_l = dl0 * dl1 + dl1 * dl2 + dl2 * dl0;
        const float sa_r = dr0 * dr1 + dr1 * dr2 + dr2 * dr0;
        const double cost = static_cast<double>(sa_l) * static_cast<double>(h)
            + static_cast<double>(sa_r) * static_cast<double>(m - h);
        if (ax_h < 0 || cost < ax_cost) {       // first minimum (np.argmin)
          ax_cost = cost;
          ax_h = h;
        }
      }
      if (best_h < 0 || ax_cost < best_cost) {  // strict <: first axis wins
        best_cost = ax_cost;
        best_h = ax_h;
        best_ax = ax;
      }
    }
    // flag the left set (first best_h ids in the winning axis order), then
    // stable-partition all three axis ranges by the flag
    for (int64_t i = 0; i < best_h; ++i) flag[A[best_ax][r.lo + i]] = 1;
    for (int ax = 0; ax < 3; ++ax) {
      tl.clear();
      tr.clear();
      for (int64_t i = r.lo; i < r.hi; ++i) {
        const int64_t id = A[ax][i];
        (flag[id] ? tl : tr).push_back(id);
      }
      std::copy(tl.begin(), tl.end(), A[ax].begin() + r.lo);
      std::copy(tr.begin(), tr.end(), A[ax].begin() + r.lo + best_h);
    }
    for (int64_t i = 0; i < best_h; ++i) flag[A[best_ax][r.lo + i]] = 0;
    stack.push_back({r.lo + best_h, r.hi});
    stack.push_back({r.lo, r.lo + best_h});
  }
  // leaves now lie left-to-right as ranges of the axis-0 array, matching
  // the Python DFS emission order
  std::copy(A[0].begin(), A[0].end(), out);
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

// Plane-equation coefficients for the MXU tracer (geom/scene.py
// _triangle_planes): per triangle, a unit support plane [n | -n.v0] and
// three unit edge planes oriented inward, interleaved as 4 rows of
// planes_o (N*4, 4) / planes_d (N*4, 3), plus the unit geometric normal
// (N, 3). verts: (N, 3, 3) float32 row-major.
void rr_triangle_planes(const float* verts, int64_t n, float* normals_out,
                        float* planes_o_out, float* planes_d_out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const float* v = verts + i * 9;
    const float* v0 = v;
    const float* v1 = v + 3;
    const float* v2 = v + 6;
    float e1[3], e2[3], nrm[3];
    for (int k = 0; k < 3; ++k) {
      e1[k] = v1[k] - v0[k];
      e2[k] = v2[k] - v0[k];
    }
    nrm[0] = e1[1] * e2[2] - e1[2] * e2[1];
    nrm[1] = e1[2] * e2[0] - e1[0] * e2[2];
    nrm[2] = e1[0] * e2[1] - e1[1] * e2[0];
    float len = std::sqrt(nrm[0] * nrm[0] + nrm[1] * nrm[1] + nrm[2] * nrm[2]);
    const float inv_len = len > 1e-30f ? 1.0f / len : 0.0f;
    for (int k = 0; k < 3; ++k) nrm[k] *= inv_len;
    std::memcpy(normals_out + i * 3, nrm, 3 * sizeof(float));

    // row 0: support plane
    float* po = planes_o_out + i * 16;
    float* pd = planes_d_out + i * 12;
    float off0 = -(nrm[0] * v0[0] + nrm[1] * v0[1] + nrm[2] * v0[2]);
    po[0] = nrm[0]; po[1] = nrm[1]; po[2] = nrm[2]; po[3] = off0;
    pd[0] = nrm[0]; pd[1] = nrm[1]; pd[2] = nrm[2];

    // rows 1..3: edge planes m_k = normalize(n x (b - a)), offset -m.a
    const float* edges[3][2] = {{v0, v1}, {v1, v2}, {v2, v0}};
    for (int e = 0; e < 3; ++e) {
      const float* a = edges[e][0];
      const float* b = edges[e][1];
      float ab[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
      float m[3];
      m[0] = nrm[1] * ab[2] - nrm[2] * ab[1];
      m[1] = nrm[2] * ab[0] - nrm[0] * ab[2];
      m[2] = nrm[0] * ab[1] - nrm[1] * ab[0];
      float ml = std::sqrt(m[0] * m[0] + m[1] * m[1] + m[2] * m[2]);
      const float inv_ml = ml > 1e-30f ? 1.0f / ml : 0.0f;
      for (int k = 0; k < 3; ++k) m[k] *= inv_ml;
      const float off = -(m[0] * a[0] + m[1] * a[1] + m[2] * a[2]);
      float* por = po + (e + 1) * 4;
      float* pdr = pd + (e + 1) * 3;
      por[0] = m[0]; por[1] = m[1]; por[2] = m[2]; por[3] = off;
      pdr[0] = m[0]; pdr[1] = m[1]; pdr[2] = m[2];
    }
  }
}

// Pallas sweep-kernel intersection table (geom/scene.py:_sweep_table_fused):
// planes_o (4T, 4) -> out (40, 5T) bf16 (uint16 bit patterns) row-major,
// chunk-major [so | sd | e0 | e1 | e2] column groups (so/sd columns use
// rows 0-23), SPLIT-EXACT layout: every coefficient is split into 3
// bf16-exact parts laid out along the contraction axis per the (i, j)
// pair table, so bf16 STORAGE is lossless and ONE DEFAULT-precision MXU
// pass computes the f32-exact contraction (see the Python docstring for
// the full derivation and the slot map). Work is blocked per chunk:
// each thread fills a cache-resident local slab, then copies contiguous
// per-row spans into the global tables — the round-3 per-triangle
// scatter touched 40 distant cache lines per triangle and ran 20x
// slower than memory bandwidth.

static inline uint16_t rr_bf16_bits(float x) {
  // round-to-nearest-even f32 -> bf16 bit pattern
  uint32_t bits;
  std::memcpy(&bits, &x, 4);
  return static_cast<uint16_t>((bits + 0x7FFFu + ((bits >> 16) & 1u)) >> 16);
}

static inline float rr_bf16_round(float x) {
  // round-to-nearest-even truncation of an f32 to bf16, as f32
  const uint32_t out = static_cast<uint32_t>(rr_bf16_bits(x)) << 16;
  float r;
  std::memcpy(&r, &out, 4);
  return r;
}

static inline void rr_bf16_part_bits(float x, uint16_t p[3]) {
  // three bf16-exact split parts of x, as bf16 bit patterns
  // (x == p0 + p1 + p2 exactly for finite x; p2 is itself bf16-exact)
  const float p0 = rr_bf16_round(x);
  const float r = x - p0;
  const float p1 = rr_bf16_round(r);
  p[0] = rr_bf16_bits(p0);
  p[1] = rr_bf16_bits(p1);
  p[2] = rr_bf16_bits(r - p1);
}

// table-side part index per slot within a 6-slot coefficient group
// (mirrors _SPLIT_PAIRS in geom/scene.py: (0,0),(0,1),(1,0),(0,2),(1,1),
// (2,0) -> i = first of each pair)
static const int RR_SPLIT_I[6] = {0, 0, 1, 0, 1, 2};

void rr_sweep_table_fused(const float* planes_o, int64_t n_tris,
                          int64_t chunk_size, uint16_t* out) {
  // out: (40, 5T) row-major, chunk-major [so | sd | e0 | e1 | e2] column
  // groups; so/sd columns use rows 0-23 (rows 24-39 zero)
  const int64_t T = n_tris, tc = chunk_size, C = T / tc;
  const int64_t W = 5 * T;
  const int K = 40;  // geom/scene.py:SWEEP_K
#pragma omp parallel
  {
    std::vector<uint16_t> loc(K * 5 * tc);
#pragma omp for schedule(static)
    for (int64_t cidx = 0; cidx < C; ++cidx) {
      std::fill(loc.begin(), loc.end(), 0);
      for (int64_t jt = 0; jt < tc; ++jt) {
        const int64_t j = cidx * tc + jt;
        const float* p = planes_o + j * 16;    // 4 plane rows x [m, c]
        const float n[3] = {p[0], p[1], p[2]};
        const float ct = p[3];
        uint16_t np3[3][3];                    // n_c split parts
        for (int c = 0; c < 3; ++c) rr_bf16_part_bits(n[c], np3[c]);
        uint16_t ctp[3];
        rr_bf16_part_bits(ct, ctp);
        // so column (rows 0-17 = n_c^i vs o parts, 18-20 = ct parts
        // vs 1), sd column (rows 0-17 = n_c^i vs d parts)
        for (int c = 0; c < 3; ++c) {
          for (int s = 0; s < 6; ++s) {
            loc[(c * 6 + s) * 5 * tc + jt] = np3[c][RR_SPLIT_I[s]];
            loc[(c * 6 + s) * 5 * tc + tc + jt] = np3[c][RR_SPLIT_I[s]];
          }
        }
        for (int s = 0; s < 3; ++s) loc[(18 + s) * 5 * tc + jt] = ctp[s];
        // edge columns (rows 0-17 = B_k,c^i vs d, 18-35 = A_k,c^i
        // vs o x d)
        for (int k = 0; k < 3; ++k) {
          const float* m = p + 4 * (k + 1);
          const float B[3] = {m[3] * n[0] - ct * m[0],    // c_k n - c m_k
                              m[3] * n[1] - ct * m[1],
                              m[3] * n[2] - ct * m[2]};
          const float A[3] = {m[1] * n[2] - m[2] * n[1],  // m_k x n
                              m[2] * n[0] - m[0] * n[2],
                              m[0] * n[1] - m[1] * n[0]};
          for (int c = 0; c < 3; ++c) {
            uint16_t Bp[3], Ap[3];
            rr_bf16_part_bits(B[c], Bp);
            rr_bf16_part_bits(A[c], Ap);
            for (int s = 0; s < 6; ++s) {
              loc[(c * 6 + s) * 5 * tc + (2 + k) * tc + jt] =
                  Bp[RR_SPLIT_I[s]];
              loc[(18 + c * 6 + s) * 5 * tc + (2 + k) * tc + jt] =
                  Ap[RR_SPLIT_I[s]];
            }
          }
        }
      }
      for (int r = 0; r < K; ++r)
        std::memcpy(out + r * W + cidx * 5 * tc, &loc[r * 5 * tc],
                    sizeof(uint16_t) * 5 * tc);
    }
  }
}

// Packed (48, T) bf16 winner-fetch table (geom/scene.py:_tri_fetch_table):
// 16 semantic rows [v0, e1, e2, normal, obj_id_f32, aux=0, 0, 0] as three
// bf16-exact part blocks (rows 0-15 / 16-31 / 32-47). Blocked by triangle
// tiles so each row write is a contiguous span.
void rr_tri_table(const float* verts, const float* normals,
                  const int32_t* obj_ids, int64_t n_tris, uint16_t* out) {
  const int64_t T = n_tris, BT = 4096;
  const int64_t n_blocks = (T + BT - 1) / BT;
#pragma omp parallel
  {
    std::vector<uint16_t> loc(48 * BT);
#pragma omp for schedule(static)
    for (int64_t blk = 0; blk < n_blocks; ++blk) {
      const int64_t t0 = blk * BT, t1 = std::min(T, t0 + BT);
      const int64_t w = t1 - t0;
      std::fill(loc.begin(), loc.end(), 0);
      for (int64_t t = t0; t < t1; ++t) {
        const float* v = verts + t * 9;
        float rows16[16];
        for (int c = 0; c < 3; ++c) {
          rows16[c] = v[c];                    // v0
          rows16[3 + c] = v[3 + c] - v[c];     // e1
          rows16[6 + c] = v[6 + c] - v[c];     // e2
          rows16[9 + c] = normals[t * 3 + c];
        }
        const int32_t oid = obj_ids[t];
        rows16[12] = (oid >= 0 && oid < (1 << 24))
                         ? static_cast<float>(oid) : -1.0f;
        rows16[13] = 0.0f;  // aux slot (baked later if used)
        rows16[14] = 0.0f;
        rows16[15] = 0.0f;
        const int64_t jt = t - t0;
        for (int r = 0; r < 16; ++r) {
          uint16_t parts[3];
          rr_bf16_part_bits(rows16[r], parts);
          loc[r * BT + jt] = parts[0];
          loc[(16 + r) * BT + jt] = parts[1];
          loc[(32 + r) * BT + jt] = parts[2];
        }
      }
      for (int r = 0; r < 48; ++r)
        std::memcpy(out + r * T + t0, &loc[r * BT], sizeof(uint16_t) * w);
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------- OBJ parse
//
// Wavefront OBJ triangle loader (v/f/o/g statements; polygon faces are
// fan-triangulated; negative indices resolved; usemtl/vn/vt ignored). The
// Python fallback parses line-by-line (geom/mesh.py:_load_obj) which is the
// data-loading bottleneck for large scenes; this is its native counterpart
// (rmagine's role in radar_simulator.cpp:149).
//
// Two-call protocol:
//   rr_obj_count(path, &n_tris, &n_objects, &names_len) -> 0 on success
//   rr_obj_parse(path, verts_out[(T,3,3) f32], obj_ids_out[(T,) i32],
//                names_out[names_len bytes, '\n'-joined]) -> 0 on success

#include <cstdio>
#include <string>

namespace {

struct ObjScan {
  std::vector<std::array<float, 3>> verts;
  std::vector<int64_t> tri_vertex_idx;  // 3 per triangle
  std::vector<int32_t> tri_obj;
  std::vector<std::string> names;

  bool parse(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::string line;
    line.reserve(256);
    int32_t cur_obj = -1;
    char buf[1 << 16];
    std::string carry;
    auto handle_line = [&](const std::string& ln) {
      const char* s = ln.c_str();
      while (*s == ' ' || *s == '\t') ++s;
      if (s[0] == 'v' && (s[1] == ' ' || s[1] == '\t')) {
        float x = 0, y = 0, z = 0;
        if (std::sscanf(s + 1, "%f %f %f", &x, &y, &z) == 3)
          verts.push_back({x, y, z});
      } else if ((s[0] == 'o' || s[0] == 'g') && (s[1] == ' ' || s[1] == '\t')) {
        const char* n = s + 2;
        while (*n == ' ' || *n == '\t') ++n;
        std::string name(n);
        while (!name.empty() && (name.back() == '\r' || name.back() == '\n' ||
                                 name.back() == ' '))
          name.pop_back();
        names.push_back(name.empty() ? "object" : name);
        cur_obj = static_cast<int32_t>(names.size()) - 1;
      } else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
        if (cur_obj < 0) {  // faces before any o/g statement
          names.push_back("default");
          cur_obj = 0;
        }
        // collect vertex indices (first slash-field of each face token)
        int64_t idx[64];
        int n_idx = 0;
        const char* p = s + 1;
        while (*p && n_idx < 64) {
          while (*p == ' ' || *p == '\t') ++p;
          if (!*p || *p == '\r' || *p == '\n') break;
          long v = std::strtol(p, const_cast<char**>(&p), 10);
          if (v == 0) break;
          idx[n_idx++] = v < 0 ? static_cast<int64_t>(verts.size()) + v
                               : v - 1;
          while (*p && *p != ' ' && *p != '\t') ++p;  // skip /vt/vn part
        }
        for (int k = 2; k < n_idx; ++k) {  // fan triangulation
          tri_vertex_idx.push_back(idx[0]);
          tri_vertex_idx.push_back(idx[k - 1]);
          tri_vertex_idx.push_back(idx[k]);
          tri_obj.push_back(cur_obj);
        }
      }
    };
    size_t got;
    while ((got = std::fread(buf, 1, sizeof(buf), f)) > 0) {
      size_t start = 0;
      for (size_t i = 0; i < got; ++i) {
        if (buf[i] == '\n') {
          carry.append(buf + start, i - start);
          handle_line(carry);
          carry.clear();
          start = i + 1;
        }
      }
      carry.append(buf + start, got - start);
    }
    if (!carry.empty()) handle_line(carry);
    std::fclose(f);
    return true;
  }
};

}  // namespace

extern "C" {

int rr_obj_count(const char* path, int64_t* n_tris, int64_t* n_objects,
                 int64_t* names_len) {
  ObjScan scan;
  if (!scan.parse(path)) return 1;
  *n_tris = static_cast<int64_t>(scan.tri_obj.size());
  *n_objects = static_cast<int64_t>(scan.names.size());
  int64_t len = 0;
  for (const auto& n : scan.names) len += static_cast<int64_t>(n.size()) + 1;
  *names_len = len;
  return 0;
}

int rr_obj_parse(const char* path, float* verts_out, int32_t* obj_ids_out,
                 char* names_out, int64_t tris_cap, int64_t names_cap) {
  ObjScan scan;
  if (!scan.parse(path)) return 1;
  const int64_t T = static_cast<int64_t>(scan.tri_obj.size());
  // the output buffers were sized by a separate rr_obj_count call; if the
  // file grew between the two calls, writing T triangles would overrun them
  if (T > tris_cap) return 3;
  int64_t names_len = 0;
  for (const auto& n : scan.names) names_len += static_cast<int64_t>(n.size()) + 1;
  if (names_len > names_cap) return 3;
  for (int64_t t = 0; t < T; ++t) {
    for (int k = 0; k < 3; ++k) {
      const int64_t vi = scan.tri_vertex_idx[t * 3 + k];
      if (vi < 0 || vi >= static_cast<int64_t>(scan.verts.size())) return 2;
      const auto& v = scan.verts[static_cast<size_t>(vi)];
      verts_out[(t * 3 + k) * 3 + 0] = v[0];
      verts_out[(t * 3 + k) * 3 + 1] = v[1];
      verts_out[(t * 3 + k) * 3 + 2] = v[2];
    }
    obj_ids_out[t] = scan.tri_obj[static_cast<size_t>(t)];
  }
  char* out = names_out;
  for (const auto& n : scan.names) {
    std::memcpy(out, n.data(), n.size());
    out += n.size();
    *out++ = '\n';
  }
  return 0;
}

}  // extern "C"
