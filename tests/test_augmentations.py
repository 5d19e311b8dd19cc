"""Training-aug option surface (reference datasets/semseg.py:383-470):
flip_in_center, point_per_cut, resample/noise points, instance
oversampling, add_unlabeled_pc, and the yaml-driven aug pipelines."""

import numpy as np
import pytest

from unscene3d_tpu.data.augmentations import (
    ImageAugmentations,
    TrainAugmentation,
    VolumeAugmentations,
    append_unlabeled_scene,
    cut_point_regions,
    flip_in_center,
    oversample_instances,
    random_around_points,
)
from unscene3d_tpu.data.synthetic import make_scene


def _scene(n=4000, seed=0):
    s = make_scene(num_points=n, num_objects=3, extent=3.0, seed=seed)
    s["normals"] = np.zeros((len(s["xyz"]), 3), np.float32)
    return s


def test_flip_in_center_preserves_points():
    rng = np.random.RandomState(0)
    coords = rng.rand(5000, 3) * 4 - 2
    out = flip_in_center(coords.copy())
    assert out.shape == coords.shape
    assert not np.allclose(out, coords - coords.mean(0))
    # z is never flipped
    rec = coords - coords.mean(0)
    np.testing.assert_allclose(out[:, 2], rec[:, 2], atol=1e-9)


def test_point_per_cut_removes_points():
    s = _scene()
    rng = np.random.RandomState(0)
    out = cut_point_regions(dict(s), rng, point_per_cut=500,
                            max_cut_region=0.4)
    assert len(out["xyz"]) < len(s["xyz"])
    for k in ("colors", "features", "segments", "labels"):
        assert len(out[k]) == len(out["xyz"])
    assert out["masks"].shape[0] == len(out["xyz"])


def test_resample_points_adds_copies():
    s = _scene()
    rng = np.random.RandomState(0)
    out = random_around_points(dict(s), rng, rate=0.25, noise_rate=0.0)
    n0, n1 = len(s["xyz"]), len(out["xyz"])
    assert n1 == n0 + int(n0 * 0.25)
    assert out["masks"].shape[0] == n1
    # copies keep their source's segment ids
    assert out["segments"].max() == s["segments"].max()


def test_noise_rate_adds_ignore_points():
    s = _scene()
    rng = np.random.RandomState(0)
    out = random_around_points(dict(s), rng, rate=0.1, noise_rate=0.3,
                               ignore_label=255)
    added = len(out["xyz"]) - len(s["xyz"])
    assert added > 0
    assert np.all(out["labels"][-added:] == 255)
    assert not out["masks"][-added:].any()


def test_instance_oversampling_adds_mask_columns():
    s = _scene()
    # database of scenes in npy column format [xyz rgb normal seg label inst]
    def load_points(entry):
        src = _scene(seed=entry["seed"])
        inst = np.argmax(src["masks"], 1)
        inst[~src["masks"].any(1)] = -1
        return np.column_stack([
            src["xyz"], src["colors"] * 255,
            np.zeros((len(src["xyz"]), 3)), src["segments"],
            src["labels"], inst])

    database = [{"seed": i} for i in range(3)]
    rng = np.random.RandomState(0)
    k0 = s["masks"].shape[1]
    out = oversample_instances(dict(s), database, load_points,
                               oversampling=1.0,
                               place_around_existing=True, rng=rng)
    assert out["masks"].shape[1] > k0
    assert out["masks"].shape[0] == len(out["xyz"])
    # each pasted instance introduced one fresh segment id
    assert out["segments"].max() > s["segments"].max()


def test_add_unlabeled_pc():
    s = _scene()
    def load_points(entry):
        src = _scene(seed=9)
        return np.column_stack([
            src["xyz"], src["colors"] * 255,
            np.zeros((len(src["xyz"]), 3)), src["segments"],
            src["labels"], np.zeros(len(src["xyz"]))])

    rng = np.random.RandomState(0)
    out = append_unlabeled_scene(dict(s), [{"f": 1}], load_points, rng,
                                 ignore_label=255)
    added = len(out["xyz"]) - len(s["xyz"])
    assert added > 0
    assert np.all(out["labels"][-added:] == 255)
    assert not out["masks"][-added:].any()
    # unlabeled segments are offset past the scene's own ids
    assert out["segments"][-added:].min() > s["segments"].max()


def test_yaml_pipelines_parse_and_apply():
    va = VolumeAugmentations("conf/augmentation/volumentations_aug.yaml")
    ia = ImageAugmentations("conf/augmentation/albumentations_aug.yaml")
    rng = np.random.RandomState(3)
    coords = rng.rand(1000, 3)
    colors = rng.rand(1000, 3)
    c2 = va(coords.copy(), rng)
    assert c2.shape == coords.shape
    col2 = ia(colors, rng)
    assert col2.shape == colors.shape
    assert col2.min() >= 0 and col2.max() <= 1


def test_train_augmentation_full_surface():
    aug = TrainAugmentation(
        flip_in_center=True, point_per_cut=800, max_cut_region=0.3,
        resample_points=0.1, noise_rate=0.0,
        volume_augmentations_path="conf/augmentation/volumentations_aug.yaml",
        image_augmentations_path="conf/augmentation/albumentations_aug.yaml",
    )
    s = _scene()
    out = aug(dict(s), np.random.RandomState(0))
    n = len(out["xyz"])
    for k in ("colors", "features", "segments", "labels", "normals"):
        assert len(out[k]) == n, k
    assert out["masks"].shape[0] == n
