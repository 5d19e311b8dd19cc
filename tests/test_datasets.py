"""On-disk format compatibility: Mask3D-format npys + database yamls round-trip
through FreeMaskDataset / SemanticSegmentationDataset and the collator."""

import os

import numpy as np
import pytest
import yaml

from unscene3d_tpu.data.collate import FreeMaskCollator
from unscene3d_tpu.data.freemask_dataset import FreeMaskDataset
from unscene3d_tpu.data.semseg_dataset import SemanticSegmentationDataset
from unscene3d_tpu.data.synthetic import make_scene


def write_mask3d_dataset(root, n_scenes=2, with_freemasks=True, seed=0):
    """Write scenes in the reference npy column layout
    [xyz, rgb(0-255), normal, segment, label, instance]."""
    os.makedirs(f"{root}/train", exist_ok=True)
    db = []
    for i in range(n_scenes):
        s = make_scene(num_points=2000, num_objects=4, seed=seed + i)
        n = len(s["xyz"])
        normals = np.tile([0, 0, 1.0], (n, 1))
        points = np.hstack([
            s["xyz"], s["colors"] * 255.0, normals,
            s["segments"][:, None].astype(np.float64),
            s["labels"][:, None].astype(np.float64),
            s["instances"][:, None].astype(np.float64),
        ]).astype(np.float32)
        path = f"{root}/train/{i:04d}_00.npy"
        np.save(path, points)
        if with_freemasks:
            np.save(path.replace(".npy", "_freemasks.npy"),
                    s["masks"].astype(np.float32))
        db.append({"filepath": path, "raw_filepath": f"/x/scene{i:04d}_00/mesh.ply"})
    for mode in ("train", "validation"):
        with open(f"{root}/{mode}_database.yaml", "w") as f:
            yaml.safe_dump(db, f)
    return db


def test_freemask_dataset_reader(tmp_path):
    write_mask3d_dataset(str(tmp_path))
    ds = FreeMaskDataset(data_dir=str(tmp_path), mode="train", augment=False)
    assert len(ds) == 2
    scene = ds[0]
    assert scene["masks"].dtype == bool and scene["masks"].shape[1] >= 1
    assert scene["features"].shape[1] == 3
    batch, meta = FreeMaskCollator(voxel_size=0.1)([scene])
    assert batch.target is not None
    assert (np.asarray(batch.target.labels)[0][np.asarray(batch.target.valid)[0]] == 1).all()


def test_semseg_dataset_reader(tmp_path):
    write_mask3d_dataset(str(tmp_path), with_freemasks=False)
    ds = SemanticSegmentationDataset(data_dir=str(tmp_path), mode="train",
                                     augment=False)
    scene = ds[0]
    assert scene["masks"].shape[1] == 4  # 4 instances
    assert set(np.unique(scene["mask_labels"])) == {1}
    batch, meta = FreeMaskCollator(voxel_size=0.1)([scene])
    labels = np.asarray(batch.target.labels)[0][np.asarray(batch.target.valid)[0]]
    assert (labels == 1).all()


def test_self_train_merge(tmp_path):
    db = write_mask3d_dataset(str(tmp_path))
    # build a fake previous-round export with one novel instance
    st_dir = tmp_path / "round0"
    os.makedirs(st_dir / "freemasks")
    base = np.load(db[0]["filepath"])
    n = len(base)
    cloud = base[:, :3]
    covered = np.load(db[0]["filepath"].replace(".npy", "_freemasks.npy")).any(1)
    # novel mask: a compact uncovered region (so the XY-extent filter keeps it)
    novel = ~covered & (cloud[:, 0] < np.percentile(cloud[:, 0], 25)) \
        & (cloud[:, 1] < np.percentile(cloud[:, 1], 25))
    new_masks = np.zeros((n, 2), bool)
    new_masks[:, 0] = covered          # redundant -> rejected
    new_masks[novel, 1] = True         # novel -> accepted
    np.save(st_dir / "freemasks" / "scene0000_00_cloud.npy", cloud)
    np.save(st_dir / "freemasks" / "scene0000_00_masks.npy", new_masks)

    ds0 = FreeMaskDataset(data_dir=str(tmp_path), mode="train", augment=False)
    k0 = ds0[0]["masks"].shape[1]
    ds = FreeMaskDataset(data_dir=str(tmp_path), mode="train", augment=False,
                         load_self_train_data=True,
                         self_train_data_dir=str(st_dir))
    k1 = ds[0]["masks"].shape[1]
    assert k1 == k0 + 1  # only the novel mask added


def test_make_crops_quadrants():
    """Quadrant splitting (reference datasets/utils.py:616-668): anchors keep
    every quadrant non-empty, crops recentred, masks/labels row-subset."""
    import numpy as np

    from unscene3d_tpu.data.collate import FreeMaskCollator, make_crops

    rng = np.random.RandomState(0)
    n = 400
    scene = dict(
        xyz=rng.randn(n, 3).astype(np.float32) * 2,
        features=rng.rand(n, 3).astype(np.float32),
        segments=rng.randint(0, 20, n),
        masks=rng.rand(n, 3) > 0.7,
        labels=rng.randint(0, 2, n),
        name="s0",
    )
    crops = make_crops([scene])
    assert len(crops) == 4
    total = sum(len(c["xyz"]) for c in crops)
    assert total == n + 4          # the four anchor points
    for c in crops:
        assert abs(c["xyz"][:, :2].mean()) < 1.0
        assert len(c["features"]) == len(c["xyz"]) == len(c["masks"])

    # collator flag wires through end-to-end
    col = FreeMaskCollator(voxel_size=0.05, small_crops=True)
    col.small_crops = True
    batch, meta = col([dict(scene, mode="train")])
    assert batch.batch_size == 4


def test_merge_collator_modes():
    """Mix3D-style merge collator (reference datasets/utils.py:48-179)."""
    import numpy as np

    from unscene3d_tpu.data.collate import MergeCollator

    rng = np.random.RandomState(1)

    def scene(name, n=200, k=2):
        return dict(xyz=rng.rand(n, 3).astype(np.float32) * 2,
                    features=rng.rand(n, 3).astype(np.float32),
                    segments=rng.randint(0, 8, n),
                    masks=rng.rand(n, k) > 0.6,
                    labels=rng.randint(0, 2, n), name=name)

    scenes = [scene("a"), scene("b"), scene("c"), scene("d")]
    col = MergeCollator(voxel_size=0.05, scenes=2, place_nearby=True)
    batch, meta = col(scenes)
    assert batch.batch_size == 2                      # 4 scenes -> 2 merged
    assert meta.scene_names[0] == "a+b"

    # one_pc_noise: each pair yields two scenes with half-ignored labels
    col2 = MergeCollator(voxel_size=0.05, make_one_pc_noise=True)
    merged = []
    orig_call = MergeCollator.__mro__[1].__call__
    batch2, meta2 = col2(scenes[:2])
    assert batch2.batch_size == 2
    # block-diagonal masks: total instance count is the sum
    m = MergeCollator._merge_group(scenes[:2], False, False)
    assert m["masks"].shape[1] == 4
    assert m["masks"][:200, 2:].sum() == 0            # block-diagonal
    assert m["segments"].max() >= 8                   # offsets applied
