// Furthest point sampling on the host -- the collate-time query seeder.
//
// Bit-identical to data/collate.py::fps_numpy (which is itself bit-identical
// to the device loop in ops/fps.py): start at row 0, f32 (x-c)^2 component
// sums in ((dx2+dy2)+dz2) order, elementwise running min, first-max argmax
// over dist + mask_bias (0 for valid rows, -inf for padding rows).
//
// The numpy version costs ~1.3 s/scene at 200k voxels x 100 queries (it
// re-materializes three (N,3) temporaries per iteration); this loop is
// memory-resident and OpenMP-parallel, ~20 ms (benchmarks/profile_collate.py).
// Replaces the role of the reference's pointnet2 FPS CUDA kernel
// (third_party/pointnet2/_ext_src/src/sampling_gpu.cu) on the host side.
//
// Built with -ffp-contract=off (see native/__init__.py): FMA contraction
// would change f32 rounding vs numpy and break seed bit-identity.

#include <cmath>
#include <cstdint>
#include <limits>

extern "C" {

// xyz: (n, 3) f32; valid: (n,) uint8; out_idx: (k,) int32. Returns 0.
int furthest_point_sample(const float* xyz, int n, const uint8_t* valid,
                          int k, float* dist_buf, int* out_idx) {
    if (n <= 0 || k <= 0) return 1;
    const float inf = std::numeric_limits<float>::infinity();
    for (int j = 0; j < n; ++j) dist_buf[j] = inf;
    out_idx[0] = 0;
    for (int i = 1; i < k; ++i) {
        const float* c = xyz + 3L * out_idx[i - 1];
        const float cx = c[0], cy = c[1], cz = c[2];
        float best = -inf;
        int best_j = 0;
#pragma omp parallel
        {
            float tbest = -inf;
            int tbest_j = n;  // sentinel: larger than any real index
#pragma omp for schedule(static) nowait
            for (int j = 0; j < n; ++j) {
                const float dx = xyz[3L * j] - cx;
                const float dy = xyz[3L * j + 1] - cy;
                const float dz = xyz[3L * j + 2] - cz;
                const float d = (dx * dx + dy * dy) + dz * dz;
                const float m = dist_buf[j] < d ? dist_buf[j] : d;
                dist_buf[j] = m;
                const float v = valid[j] ? m : -inf;
                // strict > keeps the FIRST maximum (numpy argmax semantics)
                if (v > tbest) { tbest = v; tbest_j = j; }
            }
#pragma omp critical
            {
                if (tbest > best || (tbest == best && tbest_j < best_j)) {
                    best = tbest;
                    best_j = tbest_j;
                }
            }
        }
        out_idx[i] = best_j < n ? best_j : 0;
    }
    return 0;
}

}  // extern "C"
