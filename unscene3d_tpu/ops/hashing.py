"""Coordinate hashing & deterministic voxel quantization (host-side, numpy).

Replaces `MinkowskiEngine.utils.sparse_quantize` (used by the reference at
datasets/utils.py:270 and pseudo_masks/datasets/voxelizer.py:109-148) with a
deterministic sorted-hash implementation. The reference relies on ME's
unordered-hash unique map; downstream code only depends on the
(unique_map, inverse_map) pair being mutually consistent, which ours is --
ours is additionally deterministic (first occurrence in sorted-key order).
"""

from __future__ import annotations

import numpy as np

# 18 bits per spatial dim (coords in [-2^17, 2^17)), 8 bits batch.
_COORD_BITS = 18
_COORD_OFFSET = 1 << (_COORD_BITS - 1)
_COORD_MASK = (1 << _COORD_BITS) - 1


def ravel_hash(coords: np.ndarray) -> np.ndarray:
    """Pack integer coords into unique int64 keys.

    coords: (N, 3) spatial or (N, 4) batched ``[b, x, y, z]`` int array.
    Spatial range must fit in [-2^17, 2^17); batch index in [0, 256).
    """
    coords = np.asarray(coords, dtype=np.int64)
    if coords.ndim != 2 or coords.shape[1] not in (3, 4):
        raise ValueError(f"coords must be (N,3) or (N,4), got {coords.shape}")
    spatial = coords[:, -3:]
    if spatial.size and (spatial.min() < -_COORD_OFFSET or spatial.max() >= _COORD_OFFSET):
        raise OverflowError("coordinates out of hashable range [-2^17, 2^17)")
    x = (spatial[:, 0] + _COORD_OFFSET) & _COORD_MASK
    y = (spatial[:, 1] + _COORD_OFFSET) & _COORD_MASK
    z = (spatial[:, 2] + _COORD_OFFSET) & _COORD_MASK
    key = (x << (2 * _COORD_BITS)) | (y << _COORD_BITS) | z
    if coords.shape[1] == 4:
        b = coords[:, 0]
        if b.size and (b.min() < 0 or b.max() >= 256):
            raise OverflowError("batch index out of range [0, 256)")
        key = key | (b << (3 * _COORD_BITS))
    return key


def sparse_quantize(
    float_coords: np.ndarray, voxel_size: float = 1.0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize float coords to a voxel grid and deduplicate.

    Mirrors the reference collation path (datasets/utils.py:265-275):
    ``coords = floor(xyz / voxel_size)`` then unique.

    Returns:
      voxel_coords: (M, 3) int32 unique voxel coords.
      unique_map:   (M,) indices into the input selecting one representative
                    point per voxel (first occurrence in sorted-key order).
      inverse_map:  (N,) index of each input point's voxel in voxel_coords.
    """
    coords = np.floor(np.asarray(float_coords) / voxel_size).astype(np.int64)
    keys = ravel_hash(coords)
    _, unique_map, inverse_map = np.unique(keys, return_index=True, return_inverse=True)
    return coords[unique_map].astype(np.int32), unique_map, inverse_map.astype(np.int64)


class CoordHashTable:
    """Sorted-key lookup table over a set of integer coordinates.

    Host-side stand-in for MinkowskiEngine's CoordinateManager hash map.
    Query cost is O(log N) via searchsorted on presorted keys (vectorized).
    """

    def __init__(self, coords: np.ndarray):
        self.n = len(coords)
        keys = ravel_hash(coords)
        self.order = np.argsort(keys, kind="stable").astype(np.int64)
        self.sorted_keys = keys[self.order]

    def lookup(self, coords: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Return (index, found) for each query coordinate.

        index is the row in the original coords array (undefined where
        found == False).
        """
        return self.lookup_keys(ravel_hash(coords))

    def lookup_keys(self, qk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Lookup by precomputed ravel_hash keys (key fields are disjoint bit
        ranges, so neighbors can be enumerated with pure key arithmetic)."""
        qk = qk.reshape(-1)
        if self.n == 0:
            return np.zeros(len(qk), dtype=np.int64), np.zeros(len(qk), dtype=bool)
        pos = np.searchsorted(self.sorted_keys, qk)
        pos_clipped = np.minimum(pos, self.n - 1)
        found = self.sorted_keys[pos_clipped] == qk
        idx = self.order[pos_clipped]
        return idx, found
