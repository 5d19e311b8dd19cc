"""Host-side voxelization + collation into static-shaped SceneBatch pytrees.

Mirrors the reference's FreeMaskVoxelizeCollate / freemask_voxelize
(datasets/utils.py:181-478): floor-divide coords by voxel size, deduplicate,
batch with batch indices, relabel segment ids to consecutive local ids, and
build per-instance targets (voxel masks + segment masks + labels). On top of
that we build everything the TPU engine needs statically: the multi-level
SparseGraph, per-level per-scene gather tables, and bucketed padding.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from unscene3d_tpu.data.batch import SceneBatch, Targets
from unscene3d_tpu.ops.hashing import sparse_quantize
from unscene3d_tpu.ops.kernel_maps import build_sparse_graph
from unscene3d_tpu.ops.sparse_graph import bucket_size


def _pair(v):
    """Normalize a win_spill plan entry to [table_rows, slice_len]."""
    if isinstance(v, (list, tuple)):
        return [int(v[0]), int(v[1])]
    return [int(v), int(v)]


def _merge_csr_pb(entries):
    """Elementwise max of per-offset csr bucket lists (0 = level without csr)."""
    lists = [e for e in entries if isinstance(e, (list, tuple))]
    if not lists:
        return 0
    return [max(l[i] for l in lists) for i in range(len(lists[0]))]


@dataclasses.dataclass
class CollateMeta:
    """Host-only per-scene metadata for full-res eval / export."""

    scene_names: list
    inverse_maps: list        # (P_b,) voxel index per original point
    full_res_coords: list     # (P_b, 3) raw xyz
    original_masks: list      # (P_b, K_b) or None
    original_labels: list
    original_colors: list
    num_voxels: list
    segment_connectivity: list
    original_segments: list   # (P_b,) consecutive full-res segment ids


def fps_numpy(xyz: np.ndarray, valid: np.ndarray, k: int) -> np.ndarray:
    """Iterative-argmax furthest point sampling, numerically identical to
    ops/fps.py::furthest_point_sample (start at 0, f32 distances, first-max
    tie breaking) so host-precomputed seeds equal the device loop's."""
    n = len(xyz)
    xyz = np.asarray(xyz, np.float32)
    from unscene3d_tpu.native import furthest_point_sample_native

    # C++ loop (bit-identical, ~60x faster at 200k voxels: the numpy loop
    # re-materializes three (N,3) temporaries per iteration)
    out = furthest_point_sample_native(xyz, np.asarray(valid), k)
    if out is not None:
        return out
    mask_bias = np.where(valid, np.float32(0), -np.inf).astype(np.float32)
    dist = np.full(n, np.inf, np.float32)
    idxs = np.zeros(k, np.int32)
    # same (x - c) squared-sum arithmetic as the device loop (a |x|^2
    # expansion would be faster but changes f32 rounding and breaks the
    # bit-identity), staged through preallocated buffers
    buf = np.empty((n, 3), np.float32)
    for i in range(1, k):
        np.subtract(xyz, xyz[idxs[i - 1]], out=buf)
        np.multiply(buf, buf, out=buf)
        d = buf.sum(axis=1)
        np.minimum(dist, d, out=dist)
        idxs[i] = np.argmax(dist + mask_bias)
    return idxs


def _host_coord_pyramid_bounds(graph, raw_coords: np.ndarray, B: int
                               ) -> np.ndarray:
    """Per-scene [min, max] of the avg-pool2 coordinate pyramid, (B,5,2,3).

    Replicates conv_ops.avg_pool2 bitwise (per-offset child sums in offset
    order, f32) so the model can skip its device segment-min/max ops."""
    bounds = np.zeros((B, len(graph.levels), 2, 3), np.float32)
    c = np.asarray(raw_coords, np.float32)
    for lv, lvl in enumerate(graph.levels):
        if lv > 0:
            child_idx = np.asarray(lvl.child_idx)
            child_valid = np.asarray(lvl.child_valid)
            s = np.zeros((lvl.num_padded, 3), np.float32)
            for k in range(8):
                s = s + np.where(child_valid[k][:, None], c[child_idx[k]], 0.0)
            cnt = child_valid.sum(axis=0).astype(np.float32)
            c = s / np.maximum(cnt, 1.0)[:, None]
            c = c * np.asarray(lvl.valid)[:, None]
        bidx = np.asarray(lvl.coords[:, 0])
        valid = np.asarray(lvl.valid)
        for b in range(B):
            m = (bidx == b) & valid
            if m.any():
                bounds[b, lv, 0] = c[m].min(axis=0)
                bounds[b, lv, 1] = c[m].max(axis=0)
    return bounds


def _relabel(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    uniq, inv = np.unique(ids, return_inverse=True)
    return inv.astype(np.int32), uniq


def make_crops(scenes: list[dict]) -> list[dict]:
    """Quadrant-split every scene into four XY crops (reference
    datasets/utils.py:616-668, incl. its four anchor points that guarantee a
    point per quadrant, appended with zero features / ignore labels / empty
    masks). Each crop is recentred like the reference."""
    out = []
    for s in scenes:
        xyz = np.asarray(s["xyz"], np.float32).copy()
        xyz[:, :3] -= xyz[:, :3].mean(0)
        anchors = np.asarray([[0.1, 0.1, 0.1], [0.1, -0.1, 0.1],
                              [-0.1, 0.1, 0.1], [-0.1, -0.1, 0.1]], np.float32)
        xyz = np.vstack([xyz, anchors])

        def pad_rows(key, fill):
            v = s.get(key)
            if v is None:
                return None
            v = np.asarray(v)
            extra_shape = (4,) + v.shape[1:]
            return np.concatenate([v, np.full(extra_shape, fill, v.dtype)], 0)

        feats = pad_rows("features", 0)
        segs = pad_rows("segments", 0)
        masks = pad_rows("masks", False)
        labels = pad_rows("labels", 255)
        colors = pad_rows("colors", 0)
        for sx, sy in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
            crop = (sx * xyz[:, 0] > 0) & (sy * xyz[:, 1] > 0)
            if crop.sum() <= 1:
                continue
            c_xyz = xyz[crop].copy()
            c_xyz[:, :3] -= c_xyz[:, :3].mean(0)
            cs = dict(s)
            cs["xyz"] = c_xyz
            if feats is not None:
                cs["features"] = feats[crop]
            if segs is not None:
                cs["segments"] = segs[crop]
            if masks is not None:
                cs["masks"] = masks[crop]
            if labels is not None:
                cs["labels"] = labels[crop]
            if colors is not None:
                cs["colors"] = colors[crop]
            cs["name"] = f"{s.get('name', 'scene')}_crop{sx}{sy}"
            out.append(cs)
    return out


class FreeMaskCollator:
    """Collate a list of scene dicts into (SceneBatch, CollateMeta).

    Scene dict keys:
      xyz (P,3) float32, features (P,C) float32, segments (P,) int,
      masks (P,K) bool freemask instances, optional labels (P,),
      optional segment_connectivity (E,2), optional name.
    """

    def __init__(self, voxel_size: float = 0.02, num_levels: int = 5,
                 target_align: int = 8, seg_align: int = 64,
                 build_triplane: bool = False,
                 brick_levels: tuple = (),
                 fine_buckets: bool = False,
                 csr_levels: tuple = (),
                 win_levels: tuple = (),
                 win_group: int = 8,
                 win_tile: int = 256,
                 win_w_sub: int | tuple = 384,
                 small_crops: bool = False,
                 very_small_crops: bool = False,
                 fps_queries: int = 0):
        self.voxel_size = voxel_size
        self.num_levels = num_levels
        self.target_align = target_align
        self.seg_align = seg_align
        self.build_triplane = build_triplane
        # dense-brick conv levels (ops/bricks.py). A same-process A/B on the
        # dev chip measured the full forward at 492ms (bricks at L0-1) vs
        # 386ms (27-way gather): XLA's dense conv on 10^3 bricks loses more
        # than the gather rows save, so the gather path is the default.
        self.brick_levels = tuple(brick_levels)
        # sixteenth-step padding buckets: ~6% max waste, for latency-critical
        # single-shape workloads (bench/inference); training keeps the coarse
        # buckets to bound recompiles
        self.fine_buckets = fine_buckets
        # levels whose k3 convs use the CSR pair tables + Pallas
        # segment-combine kernel (ops/csr_conv.py)
        self.csr_levels = tuple(csr_levels)
        # levels whose k3 convs use the windowed-select Pallas kernel
        # (ops/window_conv.py) -- no HBM row gathers; round-3 eval default
        self.win_levels = tuple(win_levels)
        # tiles per union-window DMA (amortizes the w_union/T read
        # amplification; G=8 divides it by ~6 on the bench scene)
        self.win_group = int(win_group)
        self.win_tile = int(win_tile)
        # one width or per-region (W_own, W_dx) sub-window widths
        self.win_w_sub = (tuple(win_w_sub)
                          if isinstance(win_w_sub, (tuple, list))
                          else int(win_w_sub))
        # reference VoxelizeCollate small_crops / very_small_crops
        # (datasets/utils.py:37-45): quadrant-split scenes once or twice
        self.small_crops = bool(small_crops)
        self.very_small_crops = bool(very_small_crops)
        # when set (= model num_queries), precompute per-scene FPS query
        # seeds on the host; the model skips its device FPS loop
        self.fps_queries = int(fps_queries)

    def __call__(self, scenes: list[dict], pads: dict | None = None
                 ) -> tuple[SceneBatch, CollateMeta]:
        """pads: optional explicit pad plan (from `pad_plan`) so that several
        shards collated independently share identical static shapes -- required
        for stacking shards on a data-parallel mesh axis."""
        if self.small_crops or self.very_small_crops:
            scenes = make_crops(scenes)
        if self.very_small_crops:
            scenes = make_crops(scenes)
        B = len(scenes)
        per_scene = []
        meta = CollateMeta([], [], [], [], [], [], [], [], [])
        for b, s in enumerate(scenes):
            xyz = np.asarray(s["xyz"], np.float32)
            vox_coords, unique_map, inverse_map = sparse_quantize(xyz, self.voxel_size)
            feats = np.asarray(s["features"], np.float32)[unique_map]
            raw = xyz[unique_map]
            seg, _ = _relabel(np.asarray(s["segments"])[unique_map])
            masks = s.get("masks")
            masks_v, mask_labels = None, None
            if masks is not None:
                masks_v = np.asarray(masks, bool)[unique_map]
                keep = masks_v.sum(0) > 0  # drop instances emptied by voxelization
                masks_v = masks_v[:, keep]
                if s.get("mask_labels") is not None:
                    mask_labels = np.asarray(s["mask_labels"])[keep]
            per_scene.append(dict(coords=vox_coords, feats=feats, raw=raw,
                                  seg=seg, masks=masks_v, mask_labels=mask_labels))
            meta.scene_names.append(s.get("name", f"scene{b:04d}"))
            meta.inverse_maps.append(inverse_map)
            meta.full_res_coords.append(xyz)
            meta.original_masks.append(masks)
            meta.original_labels.append(s.get("labels"))
            meta.original_colors.append(s.get("colors"))
            meta.num_voxels.append(len(vox_coords))
            meta.segment_connectivity.append(s.get("segment_connectivity"))
            full_seg, _ = _relabel(np.asarray(s["segments"]))
            meta.original_segments.append(full_seg)

        coords_all = np.concatenate(
            [np.column_stack([np.full(len(p["coords"]), b, np.int32), p["coords"]])
             for b, p in enumerate(per_scene)]
        )
        graph = build_sparse_graph(
            coords_all,
            num_levels=self.num_levels,
            pad_sizes=pads["levels"] if pads else None,
            brick_levels=self.brick_levels,
            brick_pads=pads.get("bricks") if pads else None,
            fine_buckets=self.fine_buckets,
            csr_levels=self.csr_levels,
            csr_pbs=pads.get("csr_pb") if pads else None,
            win_levels=self.win_levels,
            win_spills=pads.get("win_spill") if pads else None,
            win_spills_down=pads.get("win_spill_down") if pads else None,
            win_spills_up=pads.get("win_spill_up") if pads else None,
            win_group=self.win_group,
            win_tile=self.win_tile,
            win_w_sub=self.win_w_sub,
        )
        n0_pad = graph.levels[0].num_padded

        c_in = per_scene[0]["feats"].shape[1]
        features = np.zeros((n0_pad, c_in), np.float32)
        raw_coords = np.zeros((n0_pad, 3), np.float32)
        point2segment = np.zeros(n0_pad, np.int32)
        offset = 0
        scene_ranges = []
        for p in per_scene:
            n = len(p["coords"])
            features[offset:offset + n] = p["feats"]
            raw_coords[offset:offset + n] = p["raw"]
            point2segment[offset:offset + n] = p["seg"]
            scene_ranges.append((offset, n))
            offset += n

        # per-level scene gather tables
        scene_idx, scene_valid = [], []
        for lv in range(self.num_levels):
            lvl = graph.levels[lv]
            bidx = np.asarray(lvl.coords[:, 0])
            valid = np.asarray(lvl.valid)
            n_pad_l = lvl.num_padded
            counts = [int(((bidx == b) & valid).sum()) for b in range(B)]
            n_max = (pads["scene_n"][lv] if pads
                     else bucket_size(max(counts) + 1, align=64, min_size=64))
            idx_tbl = np.full((B, n_max), n_pad_l - 1, np.int32)  # padded row
            val_tbl = np.zeros((B, n_max), bool)
            for b in range(B):
                rows = np.nonzero((bidx == b) & valid)[0]
                if len(rows) > n_max:
                    # ratchetable overflow (an augmentation redraw can grow a
                    # scene's voxel count ~18% past the probe draw); a raw
                    # broadcast ValueError here killed the train prefetcher
                    from unscene3d_tpu.ops.window_conv import SpillPlanExceeded

                    raise SpillPlanExceeded(
                        f"scene rows {len(rows)} > plan {n_max} (level {lv})",
                        needed={"scene_n": {lv: int(len(rows))}})
                idx_tbl[b, : len(rows)] = rows
                val_tbl[b, : len(rows)] = True
            scene_idx.append(idx_tbl)
            scene_valid.append(val_tbl)

        # host-precomputed pos-enc bounds + segment counts (static data;
        # their device segment-reduce versions cost ~9ms/fwd, docs/DESIGN.md)
        level_bounds = _host_coord_pyramid_bounds(graph, raw_coords, B)

        fps_idx = None
        if self.fps_queries:
            # exactly the rows/order the model's device FPS would see
            c0 = np.asarray(graph.levels[0].coords[:, 1:], np.float32)
            fps_idx = np.stack([
                fps_numpy(c0[scene_idx[0][b]], scene_valid[0][b],
                          self.fps_queries)
                for b in range(B)
            ]).astype(np.int32)

        # segments
        s_counts = [int(p["seg"].max()) + 1 if len(p["seg"]) else 0 for p in per_scene]
        s_max = (pads["s_max"] if pads else
                 bucket_size(max(s_counts) + 1, align=self.seg_align, min_size=self.seg_align))
        if max(s_counts) >= s_max:
            from unscene3d_tpu.ops.window_conv import SpillPlanExceeded

            raise SpillPlanExceeded(
                f"segments {max(s_counts)} >= plan {s_max}",
                needed={"s_max": {0: int(max(s_counts)) + 1}})
        seg_valid = np.zeros((B, s_max), bool)
        for b, c in enumerate(s_counts):
            seg_valid[b, :c] = True
        # per-(scene, segment) voxel counts: denominator of the model's
        # segment mean-pool, static per batch
        bidx0 = np.asarray(graph.levels[0].coords[:, 0])
        valid0 = np.asarray(graph.levels[0].valid)
        seg_flat_h = (bidx0 * s_max + point2segment)[valid0]
        seg_counts_arr = np.bincount(
            seg_flat_h, minlength=B * s_max).astype(np.float32)[:B * s_max]

        # targets
        target = None
        if per_scene[0]["masks"] is not None:
            t_counts = [p["masks"].shape[1] for p in per_scene]
            t_max = (pads["t_max"] if pads else
                     bucket_size(max(t_counts + [1]), align=self.target_align,
                                 min_size=self.target_align))
            labels = np.zeros((B, t_max), np.int32)
            t_valid = np.zeros((B, t_max), bool)
            seg_masks = np.zeros((B, t_max, s_max), bool)
            vox_masks = np.zeros((n0_pad, t_max), bool)
            for b, p in enumerate(per_scene):
                off, n = scene_ranges[b]
                k = p["masks"].shape[1]
                if k > t_max:
                    from unscene3d_tpu.ops.window_conv import SpillPlanExceeded

                    raise SpillPlanExceeded(
                        f"targets {k} > plan {t_max}",
                        needed={"t_max": {0: int(k)}})
                if p.get("mask_labels") is not None:
                    labels[b, :k] = p["mask_labels"]
                else:
                    labels[b, :k] = 1  # freemask: single 'foreground' class
                t_valid[b, :k] = True
                vox_masks[off:off + n, :k] = p["masks"]
                for t in range(k):
                    segs = np.unique(p["seg"][p["masks"][:, t]])
                    seg_masks[b, t, segs] = True
            target = Targets(labels=labels, valid=t_valid, seg_masks=seg_masks,
                             vox_masks=vox_masks)

        triplane = None
        if self.build_triplane:
            from unscene3d_tpu.ops.triplane import build_triplane_maps

            triplane = build_triplane_maps(
                np.asarray(graph.levels[0].coords),
                np.asarray(graph.levels[0].valid),
                B,
                n_pix_pad=pads["n_pix"] if pads else None,
            )

        batch = SceneBatch(
            graph=graph,
            features=features,
            raw_coords=raw_coords,
            point2segment=point2segment,
            seg_valid=seg_valid,
            scene_idx=tuple(scene_idx),
            scene_valid=tuple(scene_valid),
            level_bounds=level_bounds,
            seg_counts=seg_counts_arr,
            fps_idx=fps_idx,
            target=target,
            triplane=triplane,
        )
        return batch, meta

    @staticmethod
    def pad_plan(batch: SceneBatch) -> dict:
        """Extract the pad plan realized by a collated batch."""
        return dict(
            levels=[l.num_padded for l in batch.graph.levels],
            bricks=[(l.brick.num_bricks if l.brick is not None else 0)
                    for l in batch.graph.levels],
            csr_pb=[(list(l.csr.pb) if l.csr is not None else 0)
                    for l in batch.graph.levels],
            win_spill=[([l.win.num_spill_padded, l.win.spill_q]
                        if l.win is not None else [0, 0])
                       for l in batch.graph.levels],
            win_spill_down=[(l.win_down.num_spill_padded
                             if l.win_down is not None else 0)
                            for l in batch.graph.levels],
            win_spill_up=[(l.win_up.num_spill_padded
                           if l.win_up is not None else 0)
                          for l in batch.graph.levels],
            scene_n=[si.shape[1] for si in batch.scene_idx],
            s_max=batch.seg_valid.shape[1],
            t_max=(batch.target.labels.shape[1] if batch.target is not None else 0),
            n_pix=(batch.triplane.pix_scene.shape[0]
                   if batch.triplane is not None else 0),
        )

    @staticmethod
    def merge_pad_plans(plans: list[dict]) -> dict:
        return dict(
            levels=[max(p["levels"][i] for p in plans) for i in range(len(plans[0]["levels"]))],
            bricks=[max(p["bricks"][i] for p in plans) for i in range(len(plans[0]["bricks"]))],
            csr_pb=[_merge_csr_pb([p.get("csr_pb", [0] * 5)[i] for p in plans])
                    for i in range(len(plans[0]["levels"]))],
            win_spill=[[max(_pair(p.get("win_spill", [[0, 0]] * 5)[i])[j]
                            for p in plans) for j in (0, 1)]
                       for i in range(len(plans[0]["levels"]))],
            win_spill_down=[max(p.get("win_spill_down", [0] * 5)[i]
                                for p in plans)
                            for i in range(len(plans[0]["levels"]))],
            win_spill_up=[max(p.get("win_spill_up", [0] * 5)[i]
                              for p in plans)
                          for i in range(len(plans[0]["levels"]))],
            scene_n=[max(p["scene_n"][i] for p in plans) for i in range(len(plans[0]["scene_n"]))],
            s_max=max(p["s_max"] for p in plans),
            t_max=max(p["t_max"] for p in plans),
            n_pix=max(p["n_pix"] for p in plans),
        )

    def collate_shards(self, shard_scenes: list[list[dict]],
                       pads: dict | None = None
                       ) -> tuple[list[SceneBatch], list[CollateMeta]]:
        """Collate several data-parallel shards with one unified pad plan so
        their pytrees can be stacked on a device axis. Pass `pads` (a master
        plan) to avoid the double-collate sizing pass entirely."""
        if pads is not None:
            collated = [self(scenes, pads=pads) for scenes in shard_scenes]
            return [b for b, _ in collated], [m for _, m in collated]
        first = [self(scenes) for scenes in shard_scenes]
        plans = [self.pad_plan(b) for b, _ in first]
        merged = self.merge_pad_plans(plans)
        batches, metas = [], []
        for (b, m), plan, scenes in zip(first, plans, shard_scenes):
            if plan != merged:
                b, m = self(scenes, pads=merged)
            batches.append(b)
            metas.append(m)
        return batches, metas


class MergeCollator(FreeMaskCollator):
    """VoxelizeCollateMerge equivalent (reference datasets/utils.py:48-179):
    Mix3D-style merging of groups of `scenes` scene dicts into single point
    clouds before voxelization. Options mirror the reference:

    - place_nearby: abut the second scene along +x; place_far: random
      +-2000-unit offset (for 2-scene groups).
    - make_one_pc_noise: each pair yields TWO merged scenes, labels valid
      for one half and ignore_label for the other (reference :147-176).
    - small/very_small_crops compose via the inherited flags.
    Masks concatenate block-diagonally; segment ids are offset per scene so
    they stay unique (reference :120-124)."""

    def __init__(self, *args, scenes: int = 2, make_one_pc_noise: bool = False,
                 place_nearby: bool = False, place_far: bool = False,
                 proba: float = 1.0, ignore_label: int = 255, **kw):
        super().__init__(*args, **kw)
        self.scenes = int(scenes)
        self.make_one_pc_noise = bool(make_one_pc_noise)
        self.place_nearby = bool(place_nearby)
        self.place_far = bool(place_far)
        self.proba = float(proba)
        self.ignore_label = int(ignore_label)

    @staticmethod
    def _merge_group(group, place_nearby, place_far):
        xyz = [np.asarray(s["xyz"], np.float32).copy() for s in group]
        if len(group) == 2 and place_nearby:
            xyz[1][:, 0] += xyz[0][:, 0].max() - xyz[1][:, 0].min()
        elif len(group) == 2 and place_far:
            xyz[1] += np.random.uniform(-10, 10, 3).astype(np.float32) * 200

        def cat(key, default=None):
            vals = [s.get(key) for s in group]
            if any(v is None for v in vals):
                return default
            return np.concatenate([np.asarray(v) for v in vals], axis=0)

        seg_off, segs = 0, []
        for s in group:
            sg = np.asarray(s["segments"])
            segs.append(sg + seg_off)
            seg_off += int(sg.max()) + 1
        masks_list = [s.get("masks") for s in group]
        masks = None
        if all(m is not None for m in masks_list):
            tot = sum(len(s["xyz"]) for s in group)
            k_tot = sum(np.asarray(m).shape[1] for m in masks_list)
            masks = np.zeros((tot, k_tot), bool)
            r0 = k0 = 0
            for m in masks_list:
                m = np.asarray(m)
                masks[r0:r0 + m.shape[0], k0:k0 + m.shape[1]] = m
                r0 += m.shape[0]
                k0 += m.shape[1]
        out = dict(group[0])
        out["xyz"] = np.vstack(xyz)
        out["features"] = cat("features")
        out["segments"] = np.concatenate(segs)
        if masks is not None:
            out["masks"] = masks
        labels = cat("labels")
        if labels is not None:
            out["labels"] = labels
        out["name"] = "+".join(str(s.get("name", f"s{i}"))
                               for i, s in enumerate(group))
        out.pop("segment_connectivity", None)
        return out

    def __call__(self, scenes_in: list[dict], pads: dict | None = None):
        import random as pyrandom

        scenes = list(scenes_in)
        if self.make_one_pc_noise:
            merged = []
            for i in range(0, len(scenes), 2):
                if i + 1 < len(scenes):
                    pair = scenes[i:i + 2]
                    na, nb = len(pair[0]["xyz"]), len(pair[1]["xyz"])
                    for valid_first in (True, False):
                        m = self._merge_group(pair, False, False)
                        lab = np.asarray(
                            m.get("labels", np.zeros(na + nb, np.int64))).copy()
                        ignored = slice(na, None) if valid_first else slice(0, na)
                        lab[ignored] = self.ignore_label
                        m["labels"] = lab
                        # freemask supervision comes from the mask matrix,
                        # so the "noise" half must lose its masks too (the
                        # reference ignores that half's labels,
                        # datasets/utils.py:147-176)
                        if m.get("masks") is not None:
                            masks = np.asarray(m["masks"]).copy()
                            masks[ignored] = False
                            m["masks"] = masks
                        merged.append(m)
                else:
                    merged.append(scenes[i])
            return super().__call__(merged, pads)
        if self.proba > pyrandom.random():
            merged = [self._merge_group(scenes[i:i + self.scenes],
                                        self.place_nearby, self.place_far)
                      for i in range(0, len(scenes), self.scenes)]
            return super().__call__(merged, pads)
        return super().__call__(scenes, pads)


