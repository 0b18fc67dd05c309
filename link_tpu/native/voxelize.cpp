// Hard voxelization, single pass over points.
//
// Native twin of the reference's numba kernel
// (detection/det3d/ops/point_cloud/point_cloud_ops.py:8-57): each voxel
// keeps the first `max_points` points in point order, and only the first
// `max_voxels` voxels (by appearance) are kept. Instead of the
// reference's dense coor->voxelidx grid (1440*1440*41 ints = 332 MB, one
// cache miss per point), the coord->voxel map is an open-addressing hash
// table sized ~4x max_voxels (a few MB, cache-resident).
//
// The output rows are emitted SORTED by (z, y, x) — the pack-key order
// the device-side sparse engine requires (sparse/coords.py) — with the
// argsort and the big (V, max_points, F) permutation done here rather
// than in NumPy (lexsort + fancy-index measured 130 ms/frame at det
// scale, VERDICT round-2 next #7).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {
std::vector<int64_t> g_keys;     // hash slots: voxel key, -1 empty
std::vector<int32_t> g_vals;     // hash slots: voxel id
std::vector<float> g_voxels;     // scratch voxels, appearance order
std::vector<int32_t> g_coords;   // scratch coords (z, y, x)
std::vector<int32_t> g_nppv;
std::vector<int32_t> g_perm;
}  // namespace

extern "C" int64_t voxelize(
    const float* points, int64_t n, int64_t f,
    const float* voxel_size,   // (3,) x, y, z
    const float* pc_range,     // (6,) xmin..zmax
    const int32_t* grid,       // (3,) nx, ny, nz
    int64_t max_points, int64_t max_voxels,
    float* out_voxels,         // (max_voxels, max_points, f)
    int32_t* out_coords,       // (max_voxels, 3) z, y, x
    int32_t* out_nppv) {       // (max_voxels,)
  const int64_t nx = grid[0], ny = grid[1];
  int64_t cap = 4;
  while (cap < 4 * max_voxels) cap <<= 1;
  const int64_t mask = cap - 1;
  g_keys.assign(cap, -1);
  g_vals.resize(cap);
  const int64_t row = max_points * f;
  g_voxels.assign(max_voxels * row, 0.0f);
  g_coords.resize(max_voxels * 3);
  g_nppv.assign(max_voxels, 0);

  int64_t n_vox = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = points + i * f;
    int64_t c[3];
    bool ok = true;
    for (int a = 0; a < 3; ++a) {
      float v = (p[a] - pc_range[a]) / voxel_size[a];
      int64_t ci = (int64_t)std::floor(v);
      if (ci < 0 || ci >= grid[a]) { ok = false; break; }
      c[a] = ci;
    }
    if (!ok) continue;
    const int64_t key = (c[2] * ny + c[1]) * nx + c[0];
    uint64_t h = (uint64_t)key * 0x9E3779B97F4A7C15ull;
    int64_t slot = (int64_t)(h >> 32) & mask;
    int32_t vid = -1;
    while (true) {
      int64_t k = g_keys[slot];
      if (k == key) { vid = g_vals[slot]; break; }
      if (k == -1) {
        if (n_vox < max_voxels) {
          vid = (int32_t)n_vox++;
          g_keys[slot] = key;
          g_vals[slot] = vid;
          g_coords[vid * 3 + 0] = (int32_t)c[2];
          g_coords[vid * 3 + 1] = (int32_t)c[1];
          g_coords[vid * 3 + 2] = (int32_t)c[0];
        }
        break;
      }
      slot = (slot + 1) & mask;
    }
    if (vid < 0) continue;
    const int32_t k = g_nppv[vid];
    if (k < max_points) {
      std::memcpy(g_voxels.data() + (int64_t)vid * row + k * f, p,
                  f * sizeof(float));
      g_nppv[vid] = k + 1;
    }
  }

  // emit sorted by (z, y, x): coords are the (z-major) key order
  g_perm.resize(n_vox);
  std::iota(g_perm.begin(), g_perm.end(), 0);
  const int32_t* co = g_coords.data();
  std::sort(g_perm.begin(), g_perm.end(), [co, nx, ny](int32_t a, int32_t b) {
    const int64_t ka = ((int64_t)co[a * 3] * ny + co[a * 3 + 1]) * nx
                       + co[a * 3 + 2];
    const int64_t kb = ((int64_t)co[b * 3] * ny + co[b * 3 + 1]) * nx
                       + co[b * 3 + 2];
    return ka < kb;
  });
  for (int64_t o = 0; o < n_vox; ++o) {
    const int32_t v = g_perm[o];
    std::memcpy(out_voxels + o * row, g_voxels.data() + (int64_t)v * row,
                row * sizeof(float));
    std::memcpy(out_coords + o * 3, g_coords.data() + v * 3,
                3 * sizeof(int32_t));
    out_nppv[o] = g_nppv[v];
  }
  return n_vox;
}
