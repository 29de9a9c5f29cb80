// Native CPU voxel-traversal ray renderer (Amanatides-Woo DDA).
//
// The framework's native-runtime counterpart of the reference's dvr
// CUDA/C++ extension (tools/ray_iou/lib/dvr/dvr.cu render_forward_cuda_kernel
// semantics): per ray, march voxel-by-voxel; the first voxel with
// occupancy > 0.5 yields the hit, recorded as that voxel's exit distance and
// (x, y, z) index; a miss returns the exit distance / last voxel of the
// traversal; a ray that never enters the grid leaves its outputs zeroed.
//
// Used as the fast host-side oracle for the JAX/TPU marchers
// (ops/ray_march.py, ops/ray_march_fast.py) and as a CPU fallback renderer.
// Built on demand by occnet_tpu/native/__init__.py with g++ and loaded via
// ctypes (plain C ABI, no framework dependencies).

#include <cmath>
#include <cstdint>

namespace {
constexpr double kBig = 1e30;
}

extern "C" {

// occ: X*Y*Z floats (x-major: occ[(x*Y + y)*Z + z]), >0.5 = occupied.
// origins/dirs: n_rays * 3 floats, voxel units (dirs need not be unit).
// dist_out: n_rays floats (voxel units along the normalised direction).
// coord_out: n_rays * 3 int32 (x, y, z).
// hit_out: n_rays uint8.
void dvr_render_forward(const float* occ, int X, int Y, int Z,
                        const float* origins, const float* dirs, int n_rays,
                        int max_steps, float* dist_out, int32_t* coord_out,
                        uint8_t* hit_out) {
  const int sizes[3] = {X, Y, Z};
#pragma omp parallel for schedule(static)
  for (int r = 0; r < n_rays; ++r) {
    double o[3] = {origins[r * 3], origins[r * 3 + 1], origins[r * 3 + 2]};
    double d[3] = {dirs[r * 3], dirs[r * 3 + 1], dirs[r * 3 + 2]};
    double norm = std::sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
    if (norm < 1e-12) norm = 1e-12;
    for (double& v : d) v /= norm;

    int v[3], step[3];
    double tmax[3], tdelta[3];
    for (int a = 0; a < 3; ++a) {
      v[a] = static_cast<int>(std::floor(o[a]));
      step[a] = d[a] >= 0 ? 1 : -1;
      double next_boundary = v[a] + (step[a] > 0 ? 1 : 0);
      tmax[a] = d[a] != 0 ? (next_boundary - o[a]) / d[a] : kBig;
      tdelta[a] = d[a] != 0 ? step[a] / d[a] : kBig;
    }

    bool was_inside = false, hit = false;
    double hit_d = 0.0, last_d = 0.0;
    int hit_v[3] = {0, 0, 0}, last_v[3] = {0, 0, 0};
    bool any_last = false;

    for (int s = 0; s < max_steps; ++s) {
      bool inside = v[0] >= 0 && v[0] < X && v[1] >= 0 && v[1] < Y &&
                    v[2] >= 0 && v[2] < Z;
      if (was_inside && !inside) break;
      was_inside = was_inside || inside;

      // axis selection with the reference kernel's tie-breaking
      int axis;
      if (tmax[0] < tmax[1]) {
        axis = tmax[0] < tmax[2] ? 0 : 2;
      } else {
        axis = tmax[1] < tmax[2] ? 1 : 2;
      }
      double exit_d = tmax[axis];

      if (inside) {
        bool occupied =
            occ[(static_cast<int64_t>(v[0]) * Y + v[1]) * Z + v[2]] > 0.5f;
        if (occupied && !hit) {
          hit = true;
          hit_d = exit_d;
          hit_v[0] = v[0]; hit_v[1] = v[1]; hit_v[2] = v[2];
        }
        last_d = exit_d;
        last_v[0] = v[0]; last_v[1] = v[1]; last_v[2] = v[2];
        any_last = true;
      }

      v[axis] += step[axis];
      tmax[axis] += tdelta[axis];
    }

    if (hit) {
      dist_out[r] = static_cast<float>(hit_d);
      coord_out[r * 3] = hit_v[0];
      coord_out[r * 3 + 1] = hit_v[1];
      coord_out[r * 3 + 2] = hit_v[2];
      hit_out[r] = 1;
    } else if (any_last) {
      dist_out[r] = static_cast<float>(last_d);
      coord_out[r * 3] = last_v[0];
      coord_out[r * 3 + 1] = last_v[1];
      coord_out[r * 3 + 2] = last_v[2];
      hit_out[r] = 0;
    } else {
      dist_out[r] = 0.0f;
      coord_out[r * 3] = coord_out[r * 3 + 1] = coord_out[r * 3 + 2] = 0;
      hit_out[r] = 0;
    }
  }
}

}  // extern "C"
