// Mesh -> occupancy-grid voxelizer (native replacement for the reference's
// closed prebuilt `binvox` binary, /root/reference/utils/binvox; flags
// documented in /root/reference/utils/README.md:1-31).
//
// Implements the equivalent of `binvox -cb -e [-d N]`:
//   * unit-cube centering (-cb): the mesh's bounding box is centered in a
//     cube of side max-extent and scaled into [0,1]^3
//   * exact surface voxelization (-e): conservative triangle/box overlap
//     (Akenine-Moller separating-axis test) marks every voxel a triangle
//     touches
//   * optional solid fill: exterior flood fill (6-connected BFS from the
//     boundary) and inversion, matching binvox's carving intent for
//     watertight meshes
//
// Exposed as a C ABI for ctypes (no pybind11 in this image):
//   voxelize_mesh(verts[n*3], n_verts, tris[m*3], n_tris, dim, solid, out)
//     out: dim^3 bytes, x-major (x*dim*dim + y*dim + z), 0/1
//
// Build: g++ -O3 -shared -fPIC -o libvoxelizer.so voxelizer.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 sub(const Vec3& a, const Vec3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float dot(const Vec3& a, const Vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

inline void minmax(float a, float b, float c, float& mn, float& mx) {
  mn = std::min(a, std::min(b, c));
  mx = std::max(a, std::max(b, c));
}

// Separating-axis triangle/axis-aligned-box overlap (Akenine-Moller).
// Box centered at origin with half-extents h; triangle vertices v0,v1,v2
// already translated relative to the box center.
bool tri_box_overlap(const Vec3& h, Vec3 v0, Vec3 v1, Vec3 v2) {
  const Vec3 e0 = sub(v1, v0), e1 = sub(v2, v1), e2 = sub(v0, v2);

  auto axis_test = [&](float a1, float a2, float pA, float pB, float hA, float hB) {
    const float p_min = std::min(pA, pB), p_max = std::max(pA, pB);
    const float rad = hA * std::fabs(a1) + hB * std::fabs(a2);
    return !(p_min > rad || p_max < -rad);
  };

  // 9 cross-product axes
  // a00..a02 (edge e0)
  if (!axis_test(e0.z, e0.y, v0.y * e0.z - v0.z * e0.y, v2.y * e0.z - v2.z * e0.y, h.y, h.z)) return false;
  if (!axis_test(e0.z, e0.x, -(v0.x * e0.z - v0.z * e0.x), -(v2.x * e0.z - v2.z * e0.x), h.x, h.z)) return false;
  // NOTE: for edge e0 the projections of v0 and v1 coincide, so the Z-axis
  // pair must include v2 (canonical AXISTEST_Z12)
  if (!axis_test(e0.y, e0.x, v1.x * e0.y - v1.y * e0.x, v2.x * e0.y - v2.y * e0.x, h.x, h.y)) return false;
  // edge e1
  if (!axis_test(e1.z, e1.y, v0.y * e1.z - v0.z * e1.y, v2.y * e1.z - v2.z * e1.y, h.y, h.z)) return false;
  if (!axis_test(e1.z, e1.x, -(v0.x * e1.z - v0.z * e1.x), -(v2.x * e1.z - v2.z * e1.x), h.x, h.z)) return false;
  // for edge e1, v1/v2 projections coincide -> pair with v0 (AXISTEST_Z0)
  if (!axis_test(e1.y, e1.x, v0.x * e1.y - v0.y * e1.x, v1.x * e1.y - v1.y * e1.x, h.x, h.y)) return false;
  // edge e2
  if (!axis_test(e2.z, e2.y, v0.y * e2.z - v0.z * e2.y, v1.y * e2.z - v1.z * e2.y, h.y, h.z)) return false;
  if (!axis_test(e2.z, e2.x, -(v0.x * e2.z - v0.z * e2.x), -(v1.x * e2.z - v1.z * e2.x), h.x, h.z)) return false;
  if (!axis_test(e2.y, e2.x, v1.x * e2.y - v1.y * e2.x, v2.x * e2.y - v2.y * e2.x, h.x, h.y)) return false;

  // box face normals
  float mn, mx;
  minmax(v0.x, v1.x, v2.x, mn, mx);
  if (mn > h.x || mx < -h.x) return false;
  minmax(v0.y, v1.y, v2.y, mn, mx);
  if (mn > h.y || mx < -h.y) return false;
  minmax(v0.z, v1.z, v2.z, mn, mx);
  if (mn > h.z || mx < -h.z) return false;

  // (triangle-plane vs box handled by plane_box_overlap at the call site)
  return true;
}

// plane/box overlap (cleaner standalone; used instead of the inline mess above)
bool plane_box_overlap(const Vec3& n, float d, const Vec3& h) {
  Vec3 vmin, vmax;
  vmin.x = n.x > 0 ? -h.x : h.x;
  vmax.x = n.x > 0 ? h.x : -h.x;
  vmin.y = n.y > 0 ? -h.y : h.y;
  vmax.y = n.y > 0 ? h.y : -h.y;
  vmin.z = n.z > 0 ? -h.z : h.z;
  vmax.z = n.z > 0 ? h.z : -h.z;
  if (dot(n, vmin) + d > 0) return false;
  return dot(n, vmax) + d >= 0;
}

inline size_t vox_index(int x, int y, int z, int dim) {
  // binvox layout: index = x*wxh + z*width + y (utils/binvox_rw.py:187), but
  // we emit the fix_coords (x, y, z) dense layout used across the codebase.
  return (static_cast<size_t>(x) * dim + y) * dim + z;
}

}  // namespace

extern "C" {

// Returns the number of occupied voxels; -1 on bad arguments.
long voxelize_mesh(const float* verts, long n_verts, const int* tris,
                   long n_tris, int dim, int solid, unsigned char* out) {
  if (dim <= 0 || n_verts <= 0 || n_tris <= 0) return -1;
  const size_t total = static_cast<size_t>(dim) * dim * dim;
  std::memset(out, 0, total);

  // bounding box -> unit cube (-cb semantics: uniform scale by max extent)
  float mn[3] = {verts[0], verts[1], verts[2]};
  float mx[3] = {verts[0], verts[1], verts[2]};
  for (long i = 0; i < n_verts; ++i) {
    for (int c = 0; c < 3; ++c) {
      mn[c] = std::min(mn[c], verts[i * 3 + c]);
      mx[c] = std::max(mx[c], verts[i * 3 + c]);
    }
  }
  float extent = std::max(mx[0] - mn[0], std::max(mx[1] - mn[1], mx[2] - mn[2]));
  if (extent <= 0) extent = 1.0f;
  float offset[3];
  for (int c = 0; c < 3; ++c) {
    const float pad = (extent - (mx[c] - mn[c])) * 0.5f;
    offset[c] = mn[c] - pad;
  }
  const float scale = static_cast<float>(dim) / extent;

  const Vec3 half = {0.5f, 0.5f, 0.5f};

  for (long t = 0; t < n_tris; ++t) {
    Vec3 v[3];
    float tmn[3] = {1e30f, 1e30f, 1e30f}, tmx[3] = {-1e30f, -1e30f, -1e30f};
    for (int k = 0; k < 3; ++k) {
      const int vi = tris[t * 3 + k];
      if (vi < 0 || vi >= n_verts) return -1;
      const float p[3] = {
          (verts[vi * 3 + 0] - offset[0]) * scale,
          (verts[vi * 3 + 1] - offset[1]) * scale,
          (verts[vi * 3 + 2] - offset[2]) * scale,
      };
      v[k] = {p[0], p[1], p[2]};
      for (int c = 0; c < 3; ++c) {
        tmn[c] = std::min(tmn[c], p[c]);
        tmx[c] = std::max(tmx[c], p[c]);
      }
    }
    int lo[3], hi[3];
    for (int c = 0; c < 3; ++c) {
      // clamp both ends into the grid: a face lying exactly on the far
      // boundary (coordinate == dim) must still rasterize into voxel dim-1
      lo[c] = std::min(dim - 1, std::max(0, static_cast<int>(std::floor(tmn[c]))));
      hi[c] = std::min(dim - 1, std::max(0, static_cast<int>(std::floor(tmx[c]))));
    }
    for (int x = lo[0]; x <= hi[0]; ++x)
      for (int y = lo[1]; y <= hi[1]; ++y)
        for (int z = lo[2]; z <= hi[2]; ++z) {
          const Vec3 center = {x + 0.5f, y + 0.5f, z + 0.5f};
          Vec3 a = sub(v[0], center), b = sub(v[1], center), c3 = sub(v[2], center);
          // full SAT: 9 edge axes + 3 face axes + plane
          const Vec3 e0 = sub(b, a), e1 = sub(c3, b);
          const Vec3 nrm = cross(e0, e1);
          const float d = -dot(nrm, a);
          if (!plane_box_overlap(nrm, d, half)) continue;
          if (!tri_box_overlap(half, a, b, c3)) continue;
          out[vox_index(x, y, z, dim)] = 1;
        }
  }

  if (solid) {
    // exterior flood fill over empty voxels (6-connected), then invert
    std::vector<uint8_t> outside(total, 0);
    std::vector<int> stack;
    stack.reserve(total / 8);
    auto push = [&](int x, int y, int z) {
      const size_t i = vox_index(x, y, z, dim);
      if (!outside[i] && !out[i]) {
        outside[i] = 1;
        stack.push_back(static_cast<int>(i));
      }
    };
    for (int a = 0; a < dim; ++a)
      for (int b = 0; b < dim; ++b) {
        push(0, a, b);
        push(dim - 1, a, b);
        push(a, 0, b);
        push(a, dim - 1, b);
        push(a, b, 0);
        push(a, b, dim - 1);
      }
    while (!stack.empty()) {
      const int i = stack.back();
      stack.pop_back();
      const int z = i % dim, y = (i / dim) % dim, x = i / (dim * dim);
      if (x > 0) push(x - 1, y, z);
      if (x < dim - 1) push(x + 1, y, z);
      if (y > 0) push(x, y - 1, z);
      if (y < dim - 1) push(x, y + 1, z);
      if (z > 0) push(x, y, z - 1);
      if (z < dim - 1) push(x, y, z + 1);
    }
    for (size_t i = 0; i < total; ++i)
      if (!outside[i]) out[i] = 1;
  }

  long count = 0;
  for (size_t i = 0; i < total; ++i) count += out[i];
  return count;
}

}  // extern "C"
