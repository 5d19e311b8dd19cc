"""Mask3D: sparse UNet backbone + DETR-style iterative mask transformer.

TPU-native re-design of the reference decoder (models/mask3d.py:16-446):
  * ragged per-scene decomposition -> static (B, n_max) gather tables
  * per-(decoder,level) GPU randperm point subsampling -> masked uniform-score
    top_k on device (same semantics: sample without replacement, pad+mask when
    a scene is smaller than the sample size, models/mask3d.py:295-346)
  * torch MultiheadAttention with repeated head masks -> fused masked MHA
  * torch_scatter segment pooling -> deterministic segment_mean/max
  * CUDA FPS -> jit lax.fori_loop FPS (ops/fps.py)

Shapes: Q = num_queries, S = padded segments per scene, C = num classes,
L = num_decoders * len(hlevels) + 1 prediction sets (13 for the flagship).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from unscene3d_tpu.data.batch import SceneBatch
from unscene3d_tpu.models.position_embedding import PositionEmbeddingCoordsSine
from unscene3d_tpu.models.transformer_layers import (
    CrossAttentionLayer,
    FFNLayer,
    SelfAttentionLayer,
)
from unscene3d_tpu.ops import conv_ops
from unscene3d_tpu.ops.fps import furthest_point_sample_batch
from unscene3d_tpu.ops.segment_ops import (segment_count, segment_max,
                                            segment_mean)




def _sample_level(batch, hlevel, sample_size, max_sample_size, is_eval, rng):
    """Per-scene point subsampling at aux level hlevel (ref :295-346).
    Returns (flat row indices (B, P), validity (B, P))."""
    glevel = 4 - hlevel
    scene_idx = batch.scene_idx[glevel]
    scene_valid = batch.scene_valid[glevel]
    n_max = scene_idx.shape[1]
    if max_sample_size or is_eval or n_max <= sample_size:
        return scene_idx, scene_valid
    scores = jax.random.uniform(rng, scene_valid.shape)
    scores = jnp.where(scene_valid, scores, -jnp.inf)
    _, sel_cols = jax.lax.top_k(scores, sample_size)
    return (jnp.take_along_axis(scene_idx, sel_cols, axis=1),
            jnp.take_along_axis(scene_valid, sel_cols, axis=1))


def _attend_level(layers, queries, query_pos, blocked, sel_valid,
                  src, batched_pe, level_embed, deterministic=True):
    """One masked cross-attn + self-attn + FFN step (ref :334-373).

    blocked: (B, P, Q) True = query does not attend to point; src/batched_pe:
    (B, P, D) level features (already projected by lin_squeeze) and pos-enc in
    the batched sampled layout."""
    cross, self_attn, ffn = layers

    # un-mask queries that mask out every sampled point (ref :346)
    all_blocked = blocked.sum(axis=1) == blocked.shape[1]
    blocked = jnp.where(all_blocked[:, None, :], False, blocked)
    blocked = jnp.logical_or(blocked, ~sel_valid[..., None])

    if level_embed is not None:
        src = src + level_embed
    attn_block = jnp.swapaxes(blocked, 1, 2)
    q = cross(queries, src, block_mask=attn_block, pos=batched_pe,
              query_pos=query_pos, deterministic=deterministic)
    q = self_attn(q, query_pos=query_pos, deterministic=deterministic)
    return ffn(q, deterministic=deterministic)


def per_scene_min_max(x, batch_idx, valid, num_scenes):
    """Per-scene min/max over valid rows of a flat (N, D) array."""
    mx = segment_max(x, batch_idx, num_scenes, valid)
    mn = -segment_max(-x, batch_idx, num_scenes, valid)
    return mn, mx


class Mask3D(nn.Module):
    backbone: nn.Module
    num_classes: int = 2
    hidden_dim: int = 128
    num_queries: int = 100
    num_heads: int = 8
    dim_feedforward: int = 1024
    num_decoders: int = 3
    shared_decoder: bool = True
    hlevels: tuple = (0, 1, 2, 3)
    sample_sizes: tuple = (200, 800, 3200, 12800, 51200)
    max_sample_size: bool = False
    non_parametric_queries: bool = True
    train_on_segments: bool = True
    normalize_pos_enc: bool = True
    use_level_embed: bool = False
    scatter_type: str = "mean"
    gauss_scale: float = 1.0
    # config-surface parity with the reference (conf/model/mask3d.yaml)
    dropout: float = 0.0
    pre_norm: bool = False
    positional_encoding_type: str = "fourier"
    random_queries: bool = False
    random_query_both: bool = False
    random_normal: bool = False
    use_np_features: bool = False
    voxel_size: float = 0.02
    # roll the shared decoder rounds into one lax.scan body: ~3x smaller HLO
    # (the full train-step remote compile otherwise exceeds 20 minutes); the
    # extra scan iteration's first mask-head output IS the final full-res
    # prediction, since mask logits are independent of the attention target
    scan_decoder: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        D = self.hidden_dim
        self.pos_enc = PositionEmbeddingCoordsSine(
            d_pos=D, gauss_scale=self.gauss_scale, normalize=self.normalize_pos_enc,
            pos_type=self.positional_encoding_type, dtype=self.dtype,
        )
        if self.non_parametric_queries:
            # GenericMLP(query_projection): Lin->ReLU->Lin->ReLU (helpers_3detr.py:45)
            self.query_projection = [nn.Dense(D, name=f"query_proj_{i}") for i in range(2)]
            if self.use_np_features:
                self.np_feature_projection = [
                    nn.Dense(D, name=f"np_feat_proj_{i}") for i in range(2)
                ]
        elif self.random_query_both:
            self.query_projection = [
                nn.Dense(2 * D, name=f"query_proj_{i}") for i in range(2)
            ]
        elif not self.random_queries:
            self.query_feat = self.param(
                "query_feat", nn.initializers.normal(1.0), (self.num_queries, D)
            )
            self.query_pos_embed = self.param(
                "query_pos", nn.initializers.normal(1.0), (self.num_queries, D)
            )
        if self.use_level_embed:
            self.level_embed = self.param(
                "level_embed", nn.initializers.normal(1.0), (len(self.hlevels), D)
            )
        self.mask_features_head = nn.Dense(D, name="mask_features_head")
        self.mask_embed_head = [nn.Dense(D, name=f"mask_embed_{i}") for i in range(2)]
        self.class_embed_head = nn.Dense(self.num_classes, name="class_embed_head")
        self.decoder_norm = nn.LayerNorm(name="decoder_norm")

        n_sets = 1 if self.shared_decoder else self.num_decoders
        self.cross_attention = [
            [CrossAttentionLayer(D, self.num_heads, pre_norm=self.pre_norm,
                                 dropout=self.dropout, dtype=self.dtype,
                                 name=f"cross_{d}_{i}") for i in range(len(self.hlevels))]
            for d in range(n_sets)
        ]
        self.self_attention = [
            [SelfAttentionLayer(D, self.num_heads, pre_norm=self.pre_norm,
                                dropout=self.dropout, dtype=self.dtype,
                                name=f"self_{d}_{i}") for i in range(len(self.hlevels))]
            for d in range(n_sets)
        ]
        self.ffn = [
            [FFNLayer(D, self.dim_feedforward, pre_norm=self.pre_norm,
                      dropout=self.dropout, dtype=self.dtype,
                      name=f"ffn_{d}_{i}") for i in range(len(self.hlevels))]
            for d in range(n_sets)
        ]
        self.lin_squeeze = [
            [nn.Dense(D, name=f"squeeze_{d}_{i}") for i in range(len(self.hlevels))]
            for d in range(n_sets)
        ]

    def _segment_pool(self, x, seg_flat, num_segments, valid, counts=None):
        if self.scatter_type == "mean":
            from unscene3d_tpu.ops.segment_pool import tile_segment_sum

            s = tile_segment_sum(x, seg_flat, num_segments, valid)
            if counts is None:
                counts = segment_count(seg_flat, num_segments, valid)
            return s / jnp.maximum(counts, 1.0).astype(s.dtype)[
                (...,) + (None,) * (x.ndim - 1)]
        return segment_max(x, seg_flat, num_segments, valid)

    def _mask_module(self, queries, mask_segments, batch):
        """Returns (class logits (B,Q,C), segment mask logits (B,S,Q), the
        mask embedding (B,Q,D)). Voxel logits / pooled attention masks are
        derived from these by the caller: both are LINEAR in the mask
        features, so the per-level average-pool chain of (N,Q) logits the
        reference runs per decoder step (models/mask3d.py:429-436) is
        computed as (pooled D-dim features, once per forward) x (this mask
        embedding) -- exactly the same numbers, ~10x less pooling traffic."""
        q = self.decoder_norm(queries)
        me = q
        for li, layer in enumerate(self.mask_embed_head):
            me = layer(me)
            if li == 0:
                me = nn.relu(me)
        outputs_class = self.class_embed_head(q)
        seg_logits = jnp.einsum("bsd,bqd->bsq", mask_segments, me)
        seg_logits = seg_logits * batch.seg_valid[..., None].astype(seg_logits.dtype)
        return outputs_class, seg_logits, me

    def _vox_from_seg(self, seg_logits, batch):
        """Broadcast segment mask logits to voxels (ref :415-419)."""
        B = batch.batch_size
        S = batch.num_segments_padded
        seg_flat = batch.batch_idx * S + batch.point2segment
        return jnp.take(
            seg_logits.reshape(B * S, -1), seg_flat, axis=0
        ) * batch.valid[:, None].astype(seg_logits.dtype)

    def __call__(self, batch: SceneBatch, train: bool = False, is_eval: bool = False,
                 return_aux_vox: bool = False, debug_stage: str | None = None):
        """return_aux_vox: also stack voxel-level mask logits for every aux
        prediction set (needed only by the noise-robust tri-plane loss, which
        the reference computes per aux output, models/criterion.py:170-179);
        costs L x N0 x Q memory, so off by default.
        debug_stage: profiling aid -- early-return after 'backbone', 'posenc',
        'queries', or 'round0'."""
        B = batch.batch_size
        S = batch.num_segments_padded
        Q = self.num_queries
        D = self.hidden_dim
        L0 = batch.graph.levels[0]

        pcd_features, fpn, _final = self.backbone(batch.features, batch.graph, train=train)
        if debug_stage == "backbone":
            return {"pred_logits": pcd_features[None, None]}

        # ---- coords pyramid by repeated AvgPooling of raw coords (ref :205-216)
        coords_by_level = [batch.raw_coords]
        for lv in range(1, 5):
            coords_by_level.append(
                conv_ops.avg_pool2(coords_by_level[-1], batch.graph.levels[lv],
                                   fine=batch.graph.levels[lv - 1])
            )

        # ---- per-level positional encodings on flat voxels (ref :183-198)
        pe_by_level = []
        for lv in range(5):
            lvl = batch.graph.levels[lv]
            bidx = lvl.coords[:, 0]
            if batch.level_bounds is not None:
                # host-precomputed (data/collate.py), bitwise-identical
                mn, mx = batch.level_bounds[:, lv, 0], batch.level_bounds[:, lv, 1]
            else:
                mn, mx = per_scene_min_max(coords_by_level[lv], bidx,
                                           lvl.valid, B)
            pe = self.pos_enc(
                coords_by_level[lv][None],  # (1, N, 3)
                jnp.take(mn, bidx, axis=0)[None],
                jnp.take(mx, bidx, axis=0)[None],
            )[0]
            pe_by_level.append(pe * lvl.valid[:, None].astype(pe.dtype))

        if debug_stage == "posenc":
            return {"pred_logits": sum(p.sum() for p in pe_by_level)[None, None, None, None]}

        # ---- mask features + segment pooling (ref :218-223)
        mask_features = self.mask_features_head(pcd_features)
        mask_features = mask_features * L0.valid[:, None].astype(mask_features.dtype)
        seg_flat = batch.batch_idx * S + batch.point2segment
        mask_segments = self._segment_pool(
            mask_features, seg_flat, B * S, L0.valid,
            counts=batch.seg_counts,
        ).reshape(B, S, D)

        # ---- query init (ref :227-266)
        if self.non_parametric_queries:
            if batch.fps_idx is not None:
                # host-precomputed seeds (data/collate.py::fps_numpy, same
                # algorithm); saves an O(Q*N) device loop (~13ms at 200k vox)
                assert batch.fps_idx.shape[-1] == Q
                fps_idx = batch.fps_idx
            else:
                vox_xyz = jnp.take(
                    L0.coords[:, 1:].astype(jnp.float32), batch.scene_idx[0],
                    axis=0)  # (B, n0, 3)
                fps_idx = furthest_point_sample_batch(
                    vox_xyz, batch.scene_valid[0], Q)
            raw_by_scene = jnp.take(batch.raw_coords, batch.scene_idx[0], axis=0)
            sampled_coords = jnp.take_along_axis(
                raw_by_scene, fps_idx[..., None], axis=1
            )  # (B, Q, 3)
            if batch.level_bounds is not None:
                mn, mx = batch.level_bounds[:, 0, 0], batch.level_bounds[:, 0, 1]
            else:
                mn, mx = per_scene_min_max(batch.raw_coords, batch.batch_idx,
                                           L0.valid, B)
            query_pos = self.pos_enc(sampled_coords, mn[:, None], mx[:, None])
            for layer in self.query_projection:
                query_pos = nn.relu(layer(query_pos))
            if self.use_np_features:
                queries = jnp.take_along_axis(
                    jnp.take(pcd_features, batch.scene_idx[0], axis=0),
                    fps_idx[..., None], axis=1,
                )
                for li, layer in enumerate(self.np_feature_projection):
                    queries = layer(queries)
                    if li == 0:
                        queries = nn.relu(queries)
            else:
                queries = jnp.zeros_like(query_pos)
        elif self.random_queries:
            rng = self.make_rng("sample")
            query_pos = jax.random.uniform(rng, (B, Q, D), self.dtype) - 0.5
            queries = jnp.zeros_like(query_pos)
            sampled_coords = None
        elif self.random_query_both:
            rng = self.make_rng("sample")
            if self.random_normal:
                qpf = jax.random.normal(rng, (B, Q, 2 * D), self.dtype)
            else:
                qpf = jax.random.uniform(rng, (B, Q, 2 * D), self.dtype) - 0.5
            queries = qpf[..., :D]
            query_pos = qpf[..., D:]
            sampled_coords = None
        else:
            queries = jnp.tile(self.query_feat[None], (B, 1, 1))
            query_pos = jnp.tile(self.query_pos_embed[None], (B, 1, 1))
            sampled_coords = None

        if debug_stage == "queries":
            return {"pred_logits": (queries.sum() + query_pos.sum()
                                    + mask_segments.sum())[None, None, None, None]}

        # ---- pooled mask features per graph level, once per forward: the
        # attention block-mask at level g is a linear readout of these (see
        # _mask_module docstring)
        vox_feats = jnp.take(mask_segments.reshape(B * S, D), seg_flat, axis=0)
        vox_feats = vox_feats * L0.valid[:, None].astype(vox_feats.dtype)
        pooled_feats = [vox_feats]
        for lv in range(1, 5):
            pooled_feats.append(
                conv_ops.avg_pool2(pooled_feats[-1], batch.graph.levels[lv],
                                   fine=batch.graph.levels[lv - 1])
            )

        # ---- eval path: sampling is the identity, so the per-level attention
        # inputs (projected src, pos-enc, pooled mask feats) are the same in
        # every decoder round -- compute them once outside the rounds
        cached_levels = None
        if (is_eval or self.max_sample_size) and self.shared_decoder:
            cached_levels = []
            for i, hlevel in enumerate(self.hlevels):
                glevel = 4 - hlevel
                sel_flat_c = batch.scene_idx[glevel]
                sel_valid_c = batch.scene_valid[glevel]
                src_c = self.lin_squeeze[0][i](
                    jnp.take(fpn[hlevel], sel_flat_c, axis=0).astype(self.dtype))
                pe_c = jnp.take(pe_by_level[glevel], sel_flat_c, axis=0)
                pooled_c = jnp.take(pooled_feats[glevel], sel_flat_c, axis=0)
                cached_levels.append((src_c, pe_c, pooled_c, sel_valid_c))

        def run_round(mdl, q_in, dd, collect_vox):
            preds_c, preds_s, preds_v = [], [], []
            q = q_in
            for i, hlevel in enumerate(mdl.hlevels):
                glevel = 4 - hlevel  # graph level of aux[hlevel]
                out_class, seg_logits, me = mdl._mask_module(
                    q, mask_segments, batch)
                preds_c.append(out_class)
                preds_s.append(seg_logits)
                if collect_vox:
                    preds_v.append(mdl._vox_from_seg(seg_logits, batch))
                if cached_levels is not None:
                    src_i, pe_i, pooled_i, sel_valid = cached_levels[i]
                else:
                    needs_rng = not (mdl.max_sample_size or is_eval
                                     or batch.scene_idx[glevel].shape[1]
                                     <= mdl.sample_sizes[hlevel])
                    rng = mdl.make_rng("sample") if needs_rng else None
                    sel_flat, sel_valid = _sample_level(
                        batch, hlevel, mdl.sample_sizes[hlevel],
                        mdl.max_sample_size, is_eval, rng)
                    src_i = mdl.lin_squeeze[dd][i](
                        jnp.take(fpn[hlevel], sel_flat, axis=0).astype(mdl.dtype))
                    pe_i = jnp.take(pe_by_level[glevel], sel_flat, axis=0)
                    pooled_i = jnp.take(pooled_feats[glevel], sel_flat, axis=0)
                # pooled block logits (ref :429-436): linear readout of the
                # pooled mask features with this round's mask embedding
                blk = jnp.einsum(
                    "bpd,bqd->bpq",
                    jax.lax.stop_gradient(pooled_i),
                    jax.lax.stop_gradient(me).astype(pooled_i.dtype))
                blocked = jax.nn.sigmoid(blk) < 0.5
                layers = (mdl.cross_attention[dd][i], mdl.self_attention[dd][i],
                          mdl.ffn[dd][i])
                q = _attend_level(
                    layers, q, query_pos, blocked, sel_valid, src_i, pe_i,
                    mdl.level_embed[i] if mdl.use_level_embed else None,
                    deterministic=not train)
            return q, preds_c, preds_s, preds_v

        if self.shared_decoder and self.scan_decoder:
            # scan over decoder rounds: one compiled body instead of
            # num_decoders unrolled copies; iteration num_decoders computes
            # the final prediction (its attention output is discarded)
            def round_body(mdl, q_in, flag):
                q, pc, ps, pv = run_round(mdl, q_in, 0, return_aux_vox)
                q_out = jnp.where(flag, q, q_in)
                outs = (jnp.stack(pc), jnp.stack(ps))
                if return_aux_vox:
                    outs = outs + (jnp.stack(pv),)
                return q_out, outs

            scanned = nn.scan(
                round_body,
                variable_broadcast="params",
                split_rngs={"params": False, "sample": True,
                            "dropout": True},
                in_axes=0, out_axes=0,
                length=self.num_decoders + 1,
            )
            flags = jnp.concatenate([
                jnp.ones((self.num_decoders,), bool), jnp.zeros((1,), bool)
            ])
            _, outs = scanned(self, queries, flags)
            pc = outs[0]  # (R+1, 4, B, Q, C)
            ps = outs[1]
            R = self.num_decoders
            predictions_class = list(pc[:R].reshape((-1,) + pc.shape[2:]))
            predictions_class.append(pc[R, 0])
            predictions_seg = list(ps[:R].reshape((-1,) + ps.shape[2:]))
            predictions_seg.append(ps[R, 0])
            if return_aux_vox:
                pv = outs[2]
                predictions_vox = list(pv[:R].reshape((-1,) + pv.shape[2:]))
                predictions_vox.append(pv[R, 0])
            else:
                # final voxel logits from the final segment logits
                seg_flat = batch.batch_idx * S + batch.point2segment
                vox_final = jnp.take(
                    predictions_seg[-1].reshape(B * S, -1), seg_flat, axis=0
                ) * batch.valid[:, None].astype(predictions_seg[-1].dtype)
                predictions_vox = [vox_final]
        else:
            predictions_class = []
            predictions_seg = []
            predictions_vox = []
            for d in range(self.num_decoders):
                dd = 0 if self.shared_decoder else d
                queries, pc, ps, pv = run_round(self, queries, dd, return_aux_vox)
                predictions_class.extend(pc)
                predictions_seg.extend(ps)
                predictions_vox.extend(pv)

            out_class, seg_logits, _me = self._mask_module(
                queries, mask_segments, batch
            )
            predictions_class.append(out_class)
            predictions_seg.append(seg_logits)
            predictions_vox.append(self._vox_from_seg(seg_logits, batch))

        return {
            "pred_logits": jnp.stack(predictions_class),  # (L, B, Q, C)
            "pred_masks_seg": jnp.stack(predictions_seg),  # (L, B, S, Q)
            # (L, N0, Q) if return_aux_vox else (1, N0, Q) -- final set only
            "pred_masks_vox": jnp.stack(predictions_vox),
            "sampled_coords": sampled_coords,
            "backbone_features": pcd_features,
            "mask_features": mask_features,
        }
