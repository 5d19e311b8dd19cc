"""Pseudo-mask generation pipeline (the reference's unscene3d_pseudo_main).

Per scene batch: encode features (3D CSC multires backbone and/or 2D DINO
projected through the z-buffer splat), pool onto Felzenszwalb segments, run
the batched greedy masked-NCut, lift segment bipartitions to points, rebase
to the full-resolution cloud and save `{scene}_cloud.npy` + `{scene}_masks.npy`
(reference :532-667). Scenes are processed in lockstep so eigensolves batch
on device.
"""

from __future__ import annotations

import os

import numpy as np

from unscene3d_tpu.pseudo.csc import CSCFeatureExtractor
from unscene3d_tpu.pseudo.features import aggregate_features
from unscene3d_tpu.pseudo.ncut import BatchedNCut, NCutConfig

VOXEL_SIZE = 0.02


class PseudoMaskPipeline:
    def __init__(
        self,
        modality: str = "geom",            # 'geom' | 'color' | 'both'
        method: str = "ncut",              # 'ncut' | 'query' (freemask_main)
        ncut_cfg: NCutConfig | None = None,
        csc_weights: str | None = None,
        dino_weights: str | None = None,
        resolution_scale: int = 2,
        aggregation_mode: str = "mean",
        voxel_size: float = VOXEL_SIZE,
        image_size: tuple = (192, 256),
        reference_average: bool = True,
    ):
        self.modality = modality
        self.method = method
        self.cfg = ncut_cfg or NCutConfig()
        self.aggregation_mode = aggregation_mode
        self.voxel_size = voxel_size
        self.image_size = tuple(image_size)
        self.reference_average = reference_average

        self.csc = None
        if modality in ("geom", "both"):
            variables = None
            if csc_weights:
                from unscene3d_tpu.models.torch_convert import load_csc_backbone

                variables = load_csc_backbone(csc_weights)
            self.csc = CSCFeatureExtractor(
                variables=variables, resolution_scale=resolution_scale
            )
        self.dino = None
        if modality in ("color", "both"):
            from unscene3d_tpu.models.encoders_2d.dino import (
                DinoNet,
                load_torch_dino_weights,
            )

            variables = (load_torch_dino_weights(dino_weights)
                         if dino_weights else None)
            self.dino = DinoNet(variables=variables, image_size=self.image_size)

    # ------------------------------------------------------------- encoding
    def _encode_3d(self, scene: dict) -> np.ndarray:
        return self.csc(scene["coords"], scene["feats"])

    def _encode_2d(self, scene: dict) -> np.ndarray:
        import jax.numpy as jnp

        from unscene3d_tpu.pseudo.projection import project_2d_features

        images, poses, K = scene["images"], scene["poses"], scene["intrinsics"]
        h, w = images.shape[1:3]
        n = len(scene["coords"])
        world = (scene["coords"].astype(np.float32) + 0.5) * self.voxel_size
        acc = np.zeros((n, self.dino.feature_dim), np.float32)
        cnt_total = np.zeros(n, np.int32)
        for i in range(len(images)):
            feats = self.dino(images[i][None])  # (1, H, W, 384)
            out, cnt = project_2d_features(
                jnp.asarray(feats), jnp.asarray(world), jnp.ones(n, bool),
                jnp.asarray(poses[i][None].astype(np.float32)),
                jnp.asarray(K.astype(np.float32)), h, w,
                reference_average=False,
            )
            out, cnt = np.asarray(out), np.asarray(cnt)
            hit = cnt > 0
            if self.reference_average:
                # reference per-view pairwise mean (:312-313)
                acc[hit] = (acc[hit] + out[hit]) / 2.0
            else:
                acc[hit] += out[hit]
                cnt_total[hit] += 1
        if not self.reference_average:
            acc /= np.maximum(cnt_total, 1)[:, None]
        return acc

    # -------------------------------------------------------------- pipeline
    def process_scenes(self, scenes: list[dict], save_dir: str | None = None,
                       skip_existing: bool = True,
                       save_visualizations: bool = False) -> dict:
        """scenes: dicts from ScanNetPseudoDataset (or synthetic equivalents).
        Returns {scene_name: (cloud, masks)}; saves npys when save_dir set."""
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)

        todo = []
        for s in scenes:
            out_path = (os.path.join(save_dir, f"{s['scene_name']}_cloud.npy")
                        if save_dir else None)
            if save_dir and skip_existing and os.path.exists(out_path):
                continue
            todo.append(s)

        ncut_inputs = []
        for s in todo:
            seg_ids = np.asarray(s["segment_ids"][0])
            conn = np.asarray(s["segment_connectivity"][0])
            feats = []
            if self.dino is not None:
                f2d, uniq = aggregate_features(
                    self._encode_2d(s), seg_ids, conn, self.aggregation_mode)
                feats.append(f2d)
            if self.csc is not None:
                f3d, uniq = aggregate_features(
                    self._encode_3d(s), seg_ids, conn, self.aggregation_mode)
                feats.append(f3d)
            features = tuple(feats) if len(feats) == 2 else feats[0]
            ncut_inputs.append(dict(
                features=features, unique_segments=uniq, connectivity=conn,
                segment_ids=seg_ids,
                coords=s["coords"][:, -3:].astype(np.float32),
            ))

        if self.method == "query":
            from unscene3d_tpu.ops.segment_ops import segment_mean
            import jax.numpy as jnp

            from unscene3d_tpu.pseudo.freemask_query import freemask_query_masks

            bipartitions = []
            for inp in ncut_inputs:
                f = inp["features"]
                f = f[0] if isinstance(f, tuple) else f
                uniq = inp["unique_segments"]
                local = np.searchsorted(uniq, inp["segment_ids"])
                seg_coords = np.asarray(segment_mean(
                    jnp.asarray(inp["coords"]), jnp.asarray(local.astype(np.int32)),
                    len(uniq)))
                extent = inp["coords"].max(0) - inp["coords"].min(0)
                masks, _ = freemask_query_masks(
                    np.asarray(f), uniq, inp["connectivity"], seg_coords, extent,
                    instance_to_scene_max_ratio=self.cfg.max_extent_ratio,
                    max_instance_num=self.cfg.max_number_of_instances,
                )
                bipartitions.append(masks)
        else:
            bipartitions = BatchedNCut(self.cfg).run(ncut_inputs) if ncut_inputs else []

        results = {}
        for s, inp, bip in zip(todo, ncut_inputs, bipartitions):
            uniq = inp["unique_segments"]
            seg_ids = inp["segment_ids"]
            # segment-level -> point-level masks
            pos = np.searchsorted(uniq, seg_ids)
            point_masks = bip.T[pos]  # (P_vox, K)
            # rebase to full-res cloud (reference :646-659, +0.5 rounding shift)
            from scipy.spatial import KDTree

            tree = KDTree(s["coords"].astype(np.float64) + 0.5)
            _, match = tree.query(s["full_coords"] / self.voxel_size, k=1)
            full_masks = point_masks[match]
            cloud = s["full_coords"].astype(np.float32)
            results[s["scene_name"]] = (cloud, full_masks)
            if save_dir:
                np.save(os.path.join(save_dir, f"{s['scene_name']}_cloud.npy"), cloud)
                np.save(os.path.join(save_dir, f"{s['scene_name']}_masks.npy"), full_masks)
                if save_visualizations:
                    # browsable pseudo-mask scenes (reference pyviz3d export,
                    # unscene3d_pseudo_main.py:601-644)
                    from unscene3d_tpu.eval.visualize import (
                        save_scene_visualization,
                    )

                    save_scene_visualization(
                        os.path.join(save_dir, "visualizations"),
                        s["scene_name"], cloud,
                        colors=s.get("full_colors"),
                        segments=seg_ids[match],
                        masks=full_masks.astype(bool))
        return results
