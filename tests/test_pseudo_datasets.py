"""Pseudo-app dataset stack: augmenting voxelizer, pose-aug consistency,
ScanNetFree / ARKit / Stanford datasets, sampler + loader factory
(reference pseudo_masks/datasets/{voxelizer,scannet_free,arkit,s3dis,
dataloader,dataset}.py)."""

import os

import numpy as np
import pytest

from unscene3d_tpu.data import pseudo_transforms as t
from unscene3d_tpu.data.pseudo_datasets import (
    ARKitPseudoDataset, InfSampler, PseudoDataLoader, ScanNetFreeDataset,
    ScenePreparer, StanfordPseudoDataset, initialize_data_loader, load_dataset)
from unscene3d_tpu.data.ply import write_ply


def test_voxelizer_no_aug_is_floor_quantize():
    rng = np.random.RandomState(0)
    coords = rng.rand(500, 3) * 4
    feats = rng.rand(500, 3) * 255
    vox = t.Voxelizer(voxel_size=0.05)
    c, f, inds, (m_v, m_r) = vox.voxelize(coords, feats)
    assert np.allclose(m_r, np.eye(4))
    assert np.allclose(np.diag(m_v)[:3], 20.0)
    np.testing.assert_array_equal(c, np.floor(coords[inds] / 0.05))
    assert len(np.unique(c.view([("", c.dtype)] * 3))) == len(c)


def test_voxelizer_augmentation_matrix_properties():
    np.random.seed(1)
    vox = t.Voxelizer(
        voxel_size=0.02, use_augmentation=True,
        scale_augmentation_bound=(0.9, 1.1),
        rotation_augmentation_bound=((-np.pi / 8, np.pi / 8), None, (-np.pi, np.pi)))
    m_v, m_r = vox.get_transformation_matrix()
    r = m_r[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(r), 1.0)
    s = np.diag(m_v)[:3]
    assert np.all(s == s[0]) and 0.9 / 0.02 <= s[0] <= 1.1 / 0.02


def test_voxelizer_clip_bound():
    coords = np.concatenate([np.zeros((50, 3)), np.full((40, 3), 60.0),
                             np.full((50, 3), 100.0)])
    feats = np.zeros((140, 3))
    vox = t.Voxelizer(voxel_size=1.0, clip_bound=30)
    c, f, inds, _ = vox.voxelize(coords, feats)
    # clip keeps only points within +-30 of the scene center (50,50,50):
    # the cluster at 60 survives, the 0 / 100 clusters are cropped
    assert len(c) == 1 and np.all(coords[inds] == 60.0)


def test_pose_consistency_under_augmentation():
    """scannet.py:255-258: after the voxel-grid augmentation, camera-space
    point coordinates scale uniformly, so image projections are unchanged."""
    np.random.seed(3)
    prep = ScenePreparer(voxel_size=0.02, use_augmentation=True)
    n = 200
    coords = np.random.rand(n, 3) * 3
    feats = np.random.rand(n, 3) * 255
    labels = np.zeros(n, int)
    # one camera pose (cam->world), looking at the cloud
    rot = np.eye(3)
    pose = np.eye(4)
    pose[:3, :3] = rot
    pose[:3, 3] = [1.5, 1.5, -2.0]
    poses = pose[None]

    world_pt = coords[0].copy()
    cam_before = rot.T @ (world_pt - pose[:3, 3])

    c_v, f_v, labels, _, poses_t, _, (m_v, m_r) = prep(
        coords, feats, labels, None, camera_poses=poses.copy())
    m = (m_v @ m_r)[:3, :3]
    world_pt_aug = m @ world_pt        # un-floored augmented position
    p = poses_t[0]
    cam_after = p[:3, :3].T @ (world_pt_aug - p[:3, 3])
    scale = np.diag(m_v)[0]
    np.testing.assert_allclose(cam_after, cam_before * scale, atol=1e-9)
    # projection x/z, y/z is scale-invariant
    np.testing.assert_allclose(cam_after[:2] / cam_after[2],
                               cam_before[:2] / cam_before[2], atol=1e-12)


def test_input_transforms_contracts():
    np.random.seed(5)
    import random as pyrandom

    pyrandom.seed(5)
    coords = np.random.rand(1000, 3) * 10
    feats = np.random.rand(1000, 3) * 255
    idx = np.arange(1000)

    c, f, i = t.ChromaticTranslation(0.1)(coords.copy(), feats.copy(), idx)
    assert f.min() >= 0 and f.max() <= 255
    c, f, i = t.ChromaticJitter(0.05)(coords.copy(), feats.copy(), idx)
    assert f.min() >= 0 and f.max() <= 255
    c, f, i = t.ChromaticAutoContrast()(coords.copy(), feats.copy(), idx)
    assert f.shape == feats.shape
    c, f, i = t.HueSaturationTranslation(0.5, 0.2)(coords.copy(), feats.copy(), idx)
    assert f.min() >= 0 and f.max() <= 255

    kept = [t.RandomDropout(0.9)(coords.copy(), feats.copy(), idx)[2].shape[0]
            for _ in range(10)]
    assert min(kept) < 1000  # 0.9 application ratio fires within 10 tries

    c, f, i = t.RandomHorizontalFlip("z", False)(coords.copy(), feats.copy(), idx)
    assert c.shape == coords.shape

    hsv = t.rgb_to_hsv(feats)
    rgb = t.hsv_to_rgb(hsv)
    assert np.abs(rgb.astype(float) - feats).max() <= 1.0 + 1e-6


def test_hsv_roundtrip_matches_colorsys():
    import colorsys

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (50, 3)).astype(float)
    hsv = t.rgb_to_hsv(rgb)
    for k in range(50):
        want = colorsys.rgb_to_hsv(rgb[k, 0], rgb[k, 1], rgb[k, 2])
        np.testing.assert_allclose(hsv[k], want, atol=1e-9)


# ---------------------------------------------------------------------------
# dataset fixtures
# ---------------------------------------------------------------------------


def _make_freemask_fixture(tmp_path, n=400):
    rng = np.random.RandomState(11)
    coords = rng.rand(n, 3).astype(np.float32) * np.array([4, 4, 2.5], np.float32)
    coords[:60] = coords[:60] * 0.1 + 1.0   # compact cluster: a real object
    colors = rng.randint(0, 255, (n, 3))
    cloud = np.column_stack([coords, colors])
    masks = np.zeros((n, 3), np.float32)
    masks[:60, 0] = 0.9            # valid instance
    masks[60:100, 1] = 0.2         # below hard threshold -> dropped
    # wall-sized mask spanning full XY extent -> extent filter drops it
    wall = (coords[:, 0] > 0.01) | (coords[:, 0] < 3.99)
    masks[:, 2] = wall * 0.95
    masks_dir = tmp_path / "masks"
    masks_dir.mkdir()
    np.save(masks_dir / "scene0000_00_cloud.npy", cloud)
    np.save(masks_dir / "scene0000_00_masks.npy", masks)

    insseg = tmp_path / "insseg"
    insseg.mkdir()
    import torch

    sem = np.full(n, 5, np.int64)      # chair: valid oracle instance class
    sem[:50] = 1                       # wall -> ignored in oracle mode
    inst = np.arange(n) // 100         # 4 instances
    # give each oracle instance a compact footprint so the XY extent-ratio
    # filter (which applies to oracle masks too) keeps it
    oracle_coords = coords.copy()
    for k in range(4):
        blk = slice(k * 100, (k + 1) * 100)
        oracle_coords[blk] = coords[blk] * 0.1 + np.array([k, k, 0], np.float32)
    torch.save((oracle_coords, colors.astype(np.float32), sem, inst),
               insseg / "scene0000_00.pth")
    (insseg / "train.txt").write_text("scene0000_00\n")
    return str(masks_dir), str(insseg)


def test_scannet_free_dataset_freemask_mode(tmp_path):
    masks_dir, insseg = _make_freemask_fixture(tmp_path)
    ds = ScanNetFreeDataset(masks_path=masks_dir, scannet_insseg_path=insseg,
                            phase="train", oracle_mode=False,
                            preparer=ScenePreparer(voxel_size=0.05))
    coords, colors, labels, instance_ids, hard = \
        ds.load_unsupervised_scene("scene0000_00")
    assert hard.shape[1] == 1          # soft + wall masks filtered out
    assert labels.sum() == 60 and set(np.unique(instance_ids)) == {0, 1}

    item = ds[0]
    assert item["coords"].shape[1] == 3
    assert item["feats"].min() >= -0.5 - 1e-6 and item["feats"].max() <= 0.5 + 1e-6
    assert set(np.unique(item["labels"])) <= {0, 1}


def test_scannet_free_dataset_oracle_mode(tmp_path):
    masks_dir, insseg = _make_freemask_fixture(tmp_path)
    ds = ScanNetFreeDataset(masks_path=masks_dir, scannet_insseg_path=insseg,
                            phase="train", oracle_mode=True,
                            preparer=ScenePreparer(voxel_size=0.05))
    coords, colors, labels, instance_ids, hard = \
        ds.load_unsupervised_scene("scene0000_00")
    # instance 0 is half wall-labeled but instances 1..3 are chairs; wall
    # points (sem==1) are excluded from the valid mask, instance 0 survives
    # only via its chair half
    assert hard.shape[1] >= 3
    assert labels.max() == 1


def test_scannet_free_grid_targets(tmp_path):
    masks_dir, insseg = _make_freemask_fixture(tmp_path)
    ds = ScanNetFreeDataset(masks_path=masks_dir, scannet_insseg_path=insseg,
                            phase="train", oracle_mode=False)
    n = 300
    coords = np.random.RandomState(0).rand(n, 3) * 10
    labels = np.zeros(n, int)
    labels[:150] = 1
    inst = np.zeros(n, int)
    inst[:80] = 1
    segs = (np.arange(n) // 50)[:, None]
    grids, grid_idx = ds.generate_grid_targets(coords, labels, inst, segs)
    assert len(grids) == 1
    g = grids[0]
    covered = [v for v in g.values() if v.get("inst_id") == 1]
    assert covered and covered[0]["mask"].sum() == 80
    assert grid_idx.shape == (n, 1)


def test_arkit_dataset(tmp_path):
    rng = np.random.RandomState(13)
    # grid mesh: 10x10 vertices + one dangling vertex that must be cleaned
    xs, ys = np.meshgrid(np.arange(10), np.arange(10))
    verts = np.column_stack([xs.ravel(), ys.ravel(),
                             rng.rand(100) * 0.01]).astype(np.float32)
    verts = np.vstack([verts, [[50, 50, 50]]])  # unreferenced
    faces = []
    for i in range(9):
        for j in range(9):
            a = i * 10 + j
            faces += [[a, a + 1, a + 10], [a + 1, a + 11, a + 10]]
    faces = np.asarray(faces, np.int32)
    colors = rng.randint(0, 255, (101, 3))
    write_ply(str(tmp_path / "ark0001.ply"), verts, colors, faces)

    ds = ARKitPseudoDataset(str(tmp_path), phase="train",
                            segments_min_vert_nums=(10,),
                            preparer=ScenePreparer(voxel_size=0.5))
    assert len(ds) == 1
    coords, cols, labels, inst, name, segs, conn = ds.load_scene_data(0)
    assert len(coords) <= 100          # dangling vertex dropped
    assert segs.shape[1] == 1
    item = ds[0]
    assert item["coords"].shape[0] > 0
    assert item["scene_name"] == "ark0001"


def test_stanford_dataset(tmp_path):
    rng = np.random.RandomState(17)
    area = tmp_path / "area5"
    area.mkdir()
    n = 500
    verts = rng.rand(n, 3).astype(np.float32) * 5
    colors = rng.randint(0, 255, (n, 3))
    labels = rng.randint(0, 14, n)
    labels[:20] = 10                   # stairs -> ignored
    write_ply(str(area / "office_1.ply"), verts, colors, None,
              extra={"label": labels, "instance_id": rng.randint(0, 5, n),
                     "segment_id": rng.randint(0, 30, n)})

    ds = StanfordPseudoDataset(str(tmp_path), phase="val")
    assert len(ds) == 1
    item = ds[0]
    assert item["feats"].shape[1] == 6        # rgb + centered xyz
    labs = item["labels"]
    assert 255 in np.unique(labs)             # stairs remapped to ignore
    assert labs[labs != 255].max() < 13


def test_inf_sampler_and_loader(tmp_path):
    s = InfSampler(list(range(5)), shuffle=True, seed=0)
    seen = [next(s) for _ in range(10)]
    assert sorted(seen[:5]) == list(range(5))
    assert sorted(seen[5:]) == list(range(5))

    class _DS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return {"i": i}

    loader = PseudoDataLoader(_DS(), batch_size=3, num_workers=2, shuffle=True,
                              seed=1)
    batches = list(loader)
    assert [len(b) for b in batches] == [3, 3, 1]
    assert sorted(x["i"] for b in batches for x in b) == list(range(7))

    # non-shuffle streams ascending (the reference's non-shuffle path is
    # broken upstream: dataloader.py:26 calls .tolist() on an int)
    rep = PseudoDataLoader(_DS(), batch_size=2, repeat=True, shuffle=False)
    it = iter(rep)
    assert [x["i"] for x in next(it)] == [0, 1]


def test_initialize_data_loader_end_to_end(tmp_path):
    rng = np.random.RandomState(19)
    area = tmp_path / "area1"
    area.mkdir()
    n = 400
    write_ply(str(area / "conf_1.ply"), rng.rand(n, 3).astype(np.float32) * 3,
              rng.randint(0, 255, (n, 3)), None,
              extra={"label": rng.randint(0, 10, n),
                     "instance_id": rng.randint(0, 4, n),
                     "segment_id": rng.randint(0, 20, n)})
    loader = initialize_data_loader(
        load_dataset("StanfordPseudoDataset"), phase="train", num_workers=0,
        shuffle=True, repeat=False, augment_data=True, batch_size=1,
        dataset_kwargs=dict(data_root=str(tmp_path)), seed=2)
    batch = next(iter(loader))
    item = batch[0]
    assert item["coords"].shape[0] > 0
    assert np.isfinite(item["feats"]).all()
