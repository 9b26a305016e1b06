// Native data-pipeline kernels for se3et_tpu.
//
// TPU-native equivalent of the reference's C++ extensions
// (geotransformer/extensions/cpu/{grid_subsampling,radius_neighbors}): the
// host-side irregular geometry ops that feed fixed-shape tensors to the
// device.  Exposed through a plain C ABI and loaded from Python via ctypes
// (no pybind11 dependency).
//
// - se3et_grid_subsample: voxel-grid subsampling keeping, per voxel, the
//   point closest to the voxel centroid (grid_subsampling_cpu.cpp:39-70
//   semantics), returning kept-point INDICES so callers carry normals etc.
// - se3et_radius_search: fixed-width radius neighbor lists sorted by
//   distance, sentinel-padded with ns (radius_neighbors_cpu.cpp:29-91
//   semantics).  Implemented with a uniform spatial hash grid (cell = radius)
//   instead of a KD-tree: O(N) build, O(27 cells) per query, and
//   trivially parallel.
// - se3et_knn: k-nearest-neighbors via the same grid with ring expansion
//   (used for normal estimation).
// - se3et_cpuid_signature: LIVE host CPU identity (CPUID leaves 1, 7.0, 7.1,
//   brand string).  /proc/cpuinfo is populated at BOOT, so after a VM live
//   migration it describes the OLD host while CPUID describes the new one —
//   exactly the divergence that poisons XLA:CPU AOT persistent caches
//   (entries carry LLVM getHostCPUFeatures-derived target features; loading
//   one compiled on a different microarch SIGABRTs).  Cache dirs are keyed
//   by this signature (tests/conftest.py, __graft_entry__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct CellKey {
  int32_t x, y, z;
  bool operator==(const CellKey& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};

struct CellKeyHash {
  size_t operator()(const CellKey& k) const {
    // large-prime mixing; fine for up to ~1e7 cells
    return static_cast<size_t>(k.x) * 73856093u ^
           static_cast<size_t>(k.y) * 19349669u ^
           static_cast<size_t>(k.z) * 83492791u;
  }
};

struct HashGrid {
  float cell;
  std::unordered_map<CellKey, std::vector<int32_t>, CellKeyHash> cells;

  void build(const float* pts, int n, float cell_size) {
    cell = cell_size;
    cells.reserve(static_cast<size_t>(n));
    for (int i = 0; i < n; ++i) {
      CellKey k{static_cast<int32_t>(std::floor(pts[3 * i + 0] / cell)),
                static_cast<int32_t>(std::floor(pts[3 * i + 1] / cell)),
                static_cast<int32_t>(std::floor(pts[3 * i + 2] / cell))};
      cells[k].push_back(i);
    }
  }
};

inline float sq_dist(const float* a, const float* b) {
  float dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
  return dx * dx + dy * dy + dz * dz;
}

}  // namespace

extern "C" {

// Voxel-grid subsample one cloud; writes kept-point indices (ordered by voxel
// key hash-map iteration replaced with deterministic voxel-key order).
// Returns the number of kept points (<= n).
int se3et_grid_subsample(const float* points, int n, float voxel,
                         int64_t* out_indices) {
  if (n <= 0) return 0;
  float mn[3] = {points[0], points[1], points[2]};
  for (int i = 1; i < n; ++i)
    for (int d = 0; d < 3; ++d) mn[d] = std::min(mn[d], points[3 * i + d]);
  for (int d = 0; d < 3; ++d) mn[d] = std::floor(mn[d] / voxel) * voxel;

  struct Acc {
    double sum[3] = {0, 0, 0};
    int count = 0;
    int best = -1;
    double best_d = 1e30;
  };
  // key -> accumulator; deterministic output via sorted keys
  std::unordered_map<int64_t, Acc> acc;
  acc.reserve(static_cast<size_t>(n));
  std::vector<int64_t> keys(n);

  // voxel extents for linear key
  int64_t nx = 0, ny = 0;
  {
    float mx[3] = {points[0], points[1], points[2]};
    for (int i = 1; i < n; ++i)
      for (int d = 0; d < 3; ++d) mx[d] = std::max(mx[d], points[3 * i + d]);
    nx = static_cast<int64_t>(std::floor((mx[0] - mn[0]) / voxel)) + 1;
    ny = static_cast<int64_t>(std::floor((mx[1] - mn[1]) / voxel)) + 1;
  }
  for (int i = 0; i < n; ++i) {
    int64_t ix = static_cast<int64_t>(std::floor((points[3 * i] - mn[0]) / voxel));
    int64_t iy =
        static_cast<int64_t>(std::floor((points[3 * i + 1] - mn[1]) / voxel));
    int64_t iz =
        static_cast<int64_t>(std::floor((points[3 * i + 2] - mn[2]) / voxel));
    int64_t key = ix + nx * iy + nx * ny * iz;
    keys[i] = key;
    Acc& a = acc[key];
    for (int d = 0; d < 3; ++d) a.sum[d] += points[3 * i + d];
    a.count += 1;
  }
  // second pass: closest to centroid (double precision so exact ties — e.g.
  // both points of a 2-point voxel — resolve deterministically to the lower
  // index, matching the numpy reference)
  for (int i = 0; i < n; ++i) {
    Acc& a = acc[keys[i]];
    double c[3] = {a.sum[0] / a.count, a.sum[1] / a.count, a.sum[2] / a.count};
    double dx = points[3 * i] - c[0];
    double dy = points[3 * i + 1] - c[1];
    double dz = points[3 * i + 2] - c[2];
    double d = dx * dx + dy * dy + dz * dz;
    if (d < a.best_d) {
      a.best_d = d;
      a.best = i;
    }
  }
  std::vector<int64_t> uniq;
  uniq.reserve(acc.size());
  for (auto& kv : acc) uniq.push_back(kv.first);
  std::sort(uniq.begin(), uniq.end());
  int m = 0;
  for (int64_t key : uniq) out_indices[m++] = acc[key].best;
  return m;
}

// Radius search: out is (nq, limit) int64, sentinel = ns, sorted by distance.
void se3et_radius_search(const float* q_points, int nq, const float* s_points,
                         int ns, float radius, int limit, int64_t* out) {
  for (int64_t i = 0; i < static_cast<int64_t>(nq) * limit; ++i) out[i] = ns;
  if (ns <= 0 || nq <= 0 || limit <= 0) return;
  HashGrid grid;
  grid.build(s_points, ns, radius);
  const float r2 = radius * radius;

#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int qi = 0; qi < nq; ++qi) {
    const float* q = &q_points[3 * qi];
    int32_t cx = static_cast<int32_t>(std::floor(q[0] / radius));
    int32_t cy = static_cast<int32_t>(std::floor(q[1] / radius));
    int32_t cz = static_cast<int32_t>(std::floor(q[2] / radius));
    std::vector<std::pair<float, int32_t>> found;
    found.reserve(64);
    for (int32_t dx = -1; dx <= 1; ++dx)
      for (int32_t dy = -1; dy <= 1; ++dy)
        for (int32_t dz = -1; dz <= 1; ++dz) {
          auto it = grid.cells.find(CellKey{cx + dx, cy + dy, cz + dz});
          if (it == grid.cells.end()) continue;
          for (int32_t si : it->second) {
            float d2 = sq_dist(q, &s_points[3 * si]);
            if (d2 <= r2) found.emplace_back(d2, si);
          }
        }
    int k = std::min<int>(limit, static_cast<int>(found.size()));
    std::partial_sort(found.begin(), found.begin() + k, found.end());
    for (int j = 0; j < k; ++j) out[static_cast<int64_t>(qi) * limit + j] = found[j].second;
  }
}

// k-nearest neighbors with ring expansion; out (nq, k) int64 (always filled
// when ns >= k).
void se3et_knn(const float* q_points, int nq, const float* s_points, int ns,
               int k, float cell_hint, int64_t* out) {
  if (ns <= 0 || nq <= 0 || k <= 0) return;
  float cell = cell_hint > 0 ? cell_hint : 0.05f;
  HashGrid grid;
  grid.build(s_points, ns, cell);

#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int qi = 0; qi < nq; ++qi) {
    const float* q = &q_points[3 * qi];
    int32_t cx = static_cast<int32_t>(std::floor(q[0] / cell));
    int32_t cy = static_cast<int32_t>(std::floor(q[1] / cell));
    int32_t cz = static_cast<int32_t>(std::floor(q[2] / cell));
    std::vector<std::pair<float, int32_t>> found;
    int ring = 1;
    while (true) {
      found.clear();
      for (int32_t dx = -ring; dx <= ring; ++dx)
        for (int32_t dy = -ring; dy <= ring; ++dy)
          for (int32_t dz = -ring; dz <= ring; ++dz) {
            auto it = grid.cells.find(CellKey{cx + dx, cy + dy, cz + dz});
            if (it == grid.cells.end()) continue;
            for (int32_t si : it->second)
              found.emplace_back(sq_dist(q, &s_points[3 * si]), si);
          }
      // enough candidates AND the k-th candidate is within the guaranteed
      // complete radius (ring * cell)?
      if (static_cast<int>(found.size()) >= k) {
        std::partial_sort(found.begin(), found.begin() + k, found.end());
        float guaranteed = static_cast<float>(ring) * cell;
        if (found[k - 1].first <= guaranteed * guaranteed ||
            static_cast<int>(found.size()) == ns)
          break;
      } else if (static_cast<int>(found.size()) == ns) {
        std::sort(found.begin(), found.end());
        break;
      }
      ++ring;
      if (ring > 64) {  // degenerate spread; brute force fallback
        found.clear();
        for (int32_t si = 0; si < ns; ++si)
          found.emplace_back(sq_dist(q, &s_points[3 * si]), si);
        std::partial_sort(found.begin(),
                          found.begin() + std::min<int>(k, ns), found.end());
        break;
      }
    }
    int kk = std::min<int>(k, static_cast<int>(found.size()));
    for (int j = 0; j < kk; ++j) out[static_cast<int64_t>(qi) * k + j] = found[j].second;
    for (int j = kk; j < k; ++j) out[static_cast<int64_t>(qi) * k + j] = ns;
  }
}

int se3et_cpuid_signature(char* out, int cap) {
  // hex dump of CPUID leaf 1 EAX (family/model/stepping), leaf 7 subleaf 0
  // EBX/ECX/EDX + subleaf 1 EAX (AVX512*, AMX, avx512bf16), and the brand
  // string.  Returns the number of bytes written (excluding NUL), or -1.
#if defined(__x86_64__) || defined(__i386__)
  unsigned a, b, c, d;
  char buf[160];
  int off = 0;
  __asm__ volatile("cpuid" : "=a"(a), "=b"(b), "=c"(c), "=d"(d)
                   : "a"(1u), "c"(0u));
  off += std::snprintf(buf + off, sizeof(buf) - off, "%08x:", a);
  __asm__ volatile("cpuid" : "=a"(a), "=b"(b), "=c"(c), "=d"(d)
                   : "a"(7u), "c"(0u));
  off += std::snprintf(buf + off, sizeof(buf) - off, "%08x%08x%08x:", b, c, d);
  __asm__ volatile("cpuid" : "=a"(a), "=b"(b), "=c"(c), "=d"(d)
                   : "a"(7u), "c"(1u));
  off += std::snprintf(buf + off, sizeof(buf) - off, "%08x:", a);
  unsigned brand[12];
  for (unsigned i = 0; i < 3; ++i) {
    __asm__ volatile("cpuid"
                     : "=a"(brand[4 * i]), "=b"(brand[4 * i + 1]),
                       "=c"(brand[4 * i + 2]), "=d"(brand[4 * i + 3])
                     : "a"(0x80000002u + i), "c"(0u));
  }
  char name[49];
  std::memcpy(name, brand, 48);
  name[48] = '\0';
  off += std::snprintf(buf + off, sizeof(buf) - off, "%s", name);
  if (off >= cap) return -1;
  std::memcpy(out, buf, off + 1);
  return off;
#else
  (void)out;
  (void)cap;
  return -1;
#endif
}

}  // extern "C"
