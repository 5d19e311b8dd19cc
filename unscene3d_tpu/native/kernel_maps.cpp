// Flat open-addressing hash map for kernel-map construction -- the hot
// host-side path of the sparse-conv engine (TPU-native replacement for
// MinkowskiEngine's CoordinateManager kernel-map queries). Equivalent output
// to the numpy searchsorted path in unscene3d_tpu/ops/kernel_maps.py.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kCoordBits = 18;
constexpr int64_t kCoordOffset = 1LL << (kCoordBits - 1);
constexpr uint64_t kEmpty = ~0ULL;

inline uint64_t ravel(int b, int x, int y, int z) {
    const uint64_t ux = static_cast<uint64_t>(x + kCoordOffset);
    const uint64_t uy = static_cast<uint64_t>(y + kCoordOffset);
    const uint64_t uz = static_cast<uint64_t>(z + kCoordOffset);
    return (static_cast<uint64_t>(b) << (3 * kCoordBits)) |
           (ux << (2 * kCoordBits)) | (uy << kCoordBits) | uz;
}

inline uint64_t mix(uint64_t k) {
    k ^= k >> 33;
    k *= 0xff51afd7ed558ccdULL;
    k ^= k >> 33;
    k *= 0xc4ceb9fe1a85ec53ULL;
    k ^= k >> 33;
    return k;
}

struct FlatMap {
    std::vector<uint64_t> keys;
    std::vector<int32_t> vals;
    uint64_t mask;
    explicit FlatMap(int n) {
        uint64_t cap = 16;
        while (cap < static_cast<uint64_t>(n) * 2) cap <<= 1;
        keys.assign(cap, kEmpty);
        vals.assign(cap, -1);
        mask = cap - 1;
    }
    void insert(uint64_t k, int32_t v) {
        uint64_t i = mix(k) & mask;
        while (keys[i] != kEmpty) {
            if (keys[i] == k) return;  // keep first occurrence
            i = (i + 1) & mask;
        }
        keys[i] = k;
        vals[i] = v;
    }
    int32_t find(uint64_t k) const {
        uint64_t i = mix(k) & mask;
        while (keys[i] != kEmpty) {
            if (keys[i] == k) return vals[i];
            i = (i + 1) & mask;
        }
        return -1;
    }
};

}  // namespace

extern "C" {

// coords: (n, 4) int32 [b,x,y,z]; offsets: (k, 3) int32.
// out_idx: (k, n) int32; out_valid: (k, n) uint8. Returns 0 on success.
int build_neighbor_map(const int* coords, int n,
                       const int* offsets, int k,
                       int* out_idx, uint8_t* out_valid) {
    FlatMap map(n > 0 ? n : 1);
    for (int i = 0; i < n; ++i) {
        const int* c = coords + 4L * i;
        map.insert(ravel(c[0], c[1], c[2], c[3]), i);
    }
    for (int o = 0; o < k; ++o) {
        const int dx = offsets[3 * o], dy = offsets[3 * o + 1], dz = offsets[3 * o + 2];
        int* row_idx = out_idx + static_cast<long>(o) * n;
        uint8_t* row_valid = out_valid + static_cast<long>(o) * n;
        for (int i = 0; i < n; ++i) {
            const int* c = coords + 4L * i;
            const int32_t j = map.find(ravel(c[0], c[1] + dx, c[2] + dy, c[3] + dz));
            row_idx[i] = j >= 0 ? j : 0;
            row_valid[i] = j >= 0;
        }
    }
    return 0;
}

}  // extern "C"
