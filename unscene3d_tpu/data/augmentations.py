"""Geometric + color augmentations (host-side numpy).

Equivalent pipeline to the reference's train-time augmentations
(datasets/freemask_semseg.py:334-406 + datasets/semseg.py:651-707 +
conf/augmentation yamls): recenter + random shift, axis flips, two-scale
elastic distortion, random z rotation / slight xy tilts / uniform scale,
color jitter, color normalization and color drop.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.interpolate
import scipy.ndimage


def elastic_distortion(coords: np.ndarray, granularity: float, magnitude: float,
                       rng: np.random.RandomState) -> np.ndarray:
    """Standard sparse-conv elastic distortion (reference semseg.py:651-688):
    blurred Gaussian noise grid, trilinearly interpolated displacement."""
    blurs = [
        np.ones((3, 1, 1, 1), np.float32) / 3,
        np.ones((1, 3, 1, 1), np.float32) / 3,
        np.ones((1, 1, 3, 1), np.float32) / 3,
    ]
    coords_min = coords.min(0)
    noise_dim = ((coords - coords_min).max(0) // granularity).astype(int) + 3
    noise = rng.randn(*noise_dim, 3).astype(np.float32)
    for _ in range(2):
        for blur in blurs:
            noise = scipy.ndimage.convolve(noise, blur, mode="constant", cval=0)
    ax = [
        np.linspace(d_min, d_max, d)
        for d_min, d_max, d in zip(
            coords_min - granularity,
            coords_min + granularity * (noise_dim - 2),
            noise_dim,
        )
    ]
    interp = scipy.interpolate.RegularGridInterpolator(
        ax, noise, bounds_error=False, fill_value=0
    )
    return coords + interp(coords) * magnitude


def rotation_matrix(rng: np.random.RandomState, max_z=2 * np.pi,
                    max_xy=np.pi / 64) -> np.ndarray:
    """Random rotation: full range about z, slight tilts about x/y (matching
    the reference's volumentations config)."""
    az = rng.uniform(0, max_z)
    ax = rng.uniform(-max_xy, max_xy)
    ay = rng.uniform(-max_xy, max_xy)
    cz, sz = np.cos(az), np.sin(az)
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    return rz @ ry @ rx


@dataclasses.dataclass
class TrainAugmentation:
    """Applies the reference's train pipeline to a scene dict in place."""

    flip_p: float = 0.5
    elastic_p: float = 0.95
    elastic_params: tuple = ((0.2, 0.4), (0.8, 1.6))
    rotate: bool = True
    scale_range: tuple = (0.9, 1.1)
    color_jitter_std: float = 0.05
    color_drop_p: float = 0.0
    color_mean: tuple = (0.47793125906962, 0.4303257521323044, 0.3749598901421883)
    color_std: tuple = (0.2834475483823543, 0.27566157565723015, 0.27018971370874995)

    def __call__(self, scene: dict, rng: np.random.RandomState) -> dict:
        coords = np.asarray(scene["xyz"], np.float64).copy()
        colors = np.asarray(scene["colors"], np.float64).copy()

        orig_max = coords.max(0)
        coords -= coords.mean(0)
        coords += rng.uniform(coords.min(0), coords.max(0)) / 2

        for i in (0, 1):  # axis flips (reference :349-352)
            if rng.rand() < self.flip_p:
                coords[:, i] = orig_max[i] - coords[:, i]

        if rng.rand() < self.elastic_p:
            for granularity, magnitude in self.elastic_params:
                coords = elastic_distortion(coords, granularity, magnitude, rng)

        if self.rotate:
            coords = coords @ rotation_matrix(rng).T
        coords = coords * rng.uniform(*self.scale_range)

        # color jitter (unit-scale colors in [0,1])
        colors = colors + rng.normal(0, self.color_jitter_std, colors.shape)
        colors = colors.clip(0, 1)
        if rng.rand() < self.color_drop_p:
            colors[:] = 1.0

        out = dict(scene)
        out["xyz"] = coords.astype(np.float32)
        out["colors"] = colors.astype(np.float32)
        out["features"] = normalize_color(colors, self.color_mean, self.color_std)
        return out


def normalize_color(colors01: np.ndarray, mean, std) -> np.ndarray:
    """albumentations.Normalize semantics on unit-scale colors."""
    return ((colors01 - np.asarray(mean)) / np.asarray(std)).astype(np.float32)


@dataclasses.dataclass
class RandomCuboid:
    """Random cuboid crop keeping a minimum fraction of points (reference
    datasets/random_cuboid.py:17): sample an axis-aligned XY crop whose size
    is a random fraction of the scene extent, retry until enough points (and
    optionally enough instance points) survive."""

    min_points: int = 30000
    crop_length: float = 6.0
    max_tries: int = 10

    def __call__(self, xyz: np.ndarray, rng: np.random.RandomState,
                 must_keep: np.ndarray | None = None) -> np.ndarray:
        """Returns a bool keep-mask over points."""
        for _ in range(self.max_tries):
            center = xyz[rng.randint(len(xyz))][:2]
            half = self.crop_length / 2
            keep = (np.abs(xyz[:, 0] - center[0]) < half) & \
                   (np.abs(xyz[:, 1] - center[1]) < half)
            if keep.sum() >= min(self.min_points, len(xyz)):
                if must_keep is None or (keep & must_keep).sum() > 0:
                    return keep
        return np.ones(len(xyz), bool)
