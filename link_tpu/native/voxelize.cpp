// Hard voxelization, dense-grid single pass.
//
// Native twin of the reference's numba kernel
// (detection/det3d/ops/point_cloud/point_cloud_ops.py:8-57): voxels are
// emitted in FIRST-APPEARANCE order, each voxel keeps the first
// `max_points` points in point order, and only the first `max_voxels`
// voxels are kept. The dense coor->voxel grid is allocated lazily and
// kept across calls; only the touched cells are reset afterwards, so the
// per-call cost is O(points + voxels), not O(grid).
//
// Replaces the ~1 s/frame vectorized-NumPy group-by for serving latency
// (VERDICT round-2 next #7).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

static std::vector<int32_t> g_grid;   // dense (z, y, x) -> voxel id, -1 empty
static int64_t g_grid_size = -1;

extern "C" int64_t voxelize(
    const float* points, int64_t n, int64_t f,
    const float* voxel_size,   // (3,) x, y, z
    const float* pc_range,     // (6,) xmin..zmax
    const int32_t* grid,       // (3,) nx, ny, nz
    int64_t max_points, int64_t max_voxels,
    float* out_voxels,         // (max_voxels, max_points, f), zero-filled
    int32_t* out_coords,       // (max_voxels, 3) z, y, x
    int32_t* out_nppv) {       // (max_voxels,)
  const int64_t nx = grid[0], ny = grid[1], nz = grid[2];
  const int64_t cells = nx * ny * nz;
  if (g_grid_size != cells) {
    g_grid.assign(cells, -1);
    g_grid_size = cells;
  }
  int32_t* cell = g_grid.data();

  int64_t n_vox = 0;
  std::vector<int64_t> touched;
  touched.reserve(1 << 16);

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
    int32_t vid = cell[key];
    if (vid < 0) {
      if (n_vox >= max_voxels) continue;
      vid = (int32_t)n_vox++;
      cell[key] = vid;
      touched.push_back(key);
      out_coords[vid * 3 + 0] = (int32_t)c[2];
      out_coords[vid * 3 + 1] = (int32_t)c[1];
      out_coords[vid * 3 + 2] = (int32_t)c[0];
      out_nppv[vid] = 0;
    }
    const int32_t k = out_nppv[vid];
    if (k < max_points) {
      std::memcpy(out_voxels + ((int64_t)vid * max_points + k) * f, p,
                  f * sizeof(float));
      out_nppv[vid] = k + 1;
    }
  }
  for (int64_t key : touched) cell[key] = -1;
  return n_vox;
}
