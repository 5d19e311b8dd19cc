"""Res16UNet sparse-conv backbone family, TPU-native.

Re-implements the reference's MinkowskiEngine UNets (models/res16unet.py:9-381)
on the gather-GEMM engine: a 4-down/4-up UNet over the 5-level SparseGraph with
skip concatenations, returning the full-res output plus the per-level FPN list
[stride16, 8, 4, 2, 1] the Mask3D decoder consumes (out_fpn=True semantics,
models/res16unet.py:252-297).

The `multires` call mode reproduces Res16UNet34CMultiRes
(models/res16unet.py:428-505): identical weights, returns
{'res_1'..'res_16'} for CSC feature extraction in pseudo-mask generation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from unscene3d_tpu.models.sparse_modules import BasicBlock, SparseBatchNorm, SparseConv
from unscene3d_tpu.ops.sparse_graph import SparseGraph


class Res16UNetBase(nn.Module):
    out_channels: int
    planes: tuple = (32, 64, 128, 256, 256, 256, 256, 256)
    layers: tuple = (2, 2, 2, 2, 2, 2, 2, 2)
    init_dim: int = 32
    bn_momentum: float = 0.02
    dtype: Any = jnp.float32
    # rematerialize residual blocks in the backward pass (jax.checkpoint):
    # f32 activations at the fine levels pad 32 channels to 128 lanes (4x
    # waste), so storing every conv's output OOMs a 16G-HBM chip at the
    # flagship batch-8 workload; remat trades ~1/3 extra forward FLOPs for
    # O(#blocks) fewer stored activations. No effect on eval.
    remat: bool = False

    def _blocks(self, x, level, n, planes, name, train):
        block_cls = BasicBlock
        if self.remat and train:
            # static_argnums counts self at 0 (flax lifted transform);
            # prevent_cse stays True -- under plain jit XLA's CSE would
            # otherwise undo the rematerialization
            block_cls = nn.remat(BasicBlock, static_argnums=(3,))
        for bi in range(n):
            x = block_cls(
                planes, self.bn_momentum, dtype=self.dtype, name=f"{name}_{bi}"
            )(x, level, train)
        return x

    def _conv_bn_relu(self, x, level, out_ch, kind, name, train, other=None):
        if not train:
            # inference: fold BN into the conv epilogue (fuses into the
            # window kernel at win levels, one XLA pass otherwise)
            sc, sh = SparseBatchNorm(self.bn_momentum, dtype=self.dtype,
                                     name=f"{name}_bn")(None, None, False,
                                                        fold=True,
                                                        features=out_ch)
            return SparseConv(out_ch, kind, dtype=self.dtype,
                              name=f"{name}_conv")(x, level, other,
                                                   scale=sc, shift=sh,
                                                   relu=True)
        x = SparseConv(out_ch, kind, dtype=self.dtype, name=f"{name}_conv")(
            x, level, other)
        x = SparseBatchNorm(self.bn_momentum, dtype=self.dtype, name=f"{name}_bn")(
            x, level.valid, train
        )
        return nn.relu(x)

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        graph: SparseGraph,
        train: bool = False,
        multires: bool = False,
    ):
        """features: (N0_pad, in_channels) at stride 1."""
        assert graph.num_levels == 5, "Res16UNet needs a 5-level SparseGraph"
        L = graph.levels
        p = self.planes

        # ---- stem + down path (strides 1 -> 16); each strided conv keeps its
        # input width (reference uses self.inplanes for both in and out,
        # models/res16unet.py:51-125)
        out_p1 = self._conv_bn_relu(features, L[0], self.init_dim, "k3", "conv0p1s1", train)

        out = self._conv_bn_relu(out_p1, L[1], out_p1.shape[-1], "down2", "conv1p1s2", train, other=L[0])
        out_b1p2 = self._blocks(out, L[1], self.layers[0], p[0], "block1", train)

        out = self._conv_bn_relu(out_b1p2, L[2], out_b1p2.shape[-1], "down2", "conv2p2s2", train, other=L[1])
        out_b2p4 = self._blocks(out, L[2], self.layers[1], p[1], "block2", train)

        out = self._conv_bn_relu(out_b2p4, L[3], out_b2p4.shape[-1], "down2", "conv3p4s2", train, other=L[2])
        out_b3p8 = self._blocks(out, L[3], self.layers[2], p[2], "block3", train)

        out = self._conv_bn_relu(out_b3p8, L[4], out_b3p8.shape[-1], "down2", "conv4p8s2", train, other=L[3])
        res_16 = self._blocks(out, L[4], self.layers[3], p[3], "block4", train)

        feature_maps = [res_16]

        # ---- up path (note: down2 conv at the *fine* graph = transpose conv)
        out = self._conv_bn_relu(res_16, L[3], p[4], "up2", "convtr4p16s2", train, other=L[4])
        out = jnp.concatenate([out, out_b3p8], axis=-1)
        res_8 = self._blocks(out, L[3], self.layers[4], p[4], "block5", train)
        feature_maps.append(res_8)

        out = self._conv_bn_relu(res_8, L[2], p[5], "up2", "convtr5p8s2", train, other=L[3])
        out = jnp.concatenate([out, out_b2p4], axis=-1)
        res_4 = self._blocks(out, L[2], self.layers[5], p[5], "block6", train)
        feature_maps.append(res_4)

        out = self._conv_bn_relu(res_4, L[1], p[6], "up2", "convtr6p4s2", train, other=L[2])
        out = jnp.concatenate([out, out_b1p2], axis=-1)
        res_2 = self._blocks(out, L[1], self.layers[6], p[6], "block7", train)
        feature_maps.append(res_2)

        out = self._conv_bn_relu(res_2, L[0], p[7], "up2", "convtr7p2s2", train, other=L[1])
        out = jnp.concatenate([out, out_p1], axis=-1)
        res_1 = self._blocks(out, L[0], self.layers[7], p[7], "block8", train)
        feature_maps.append(res_1)

        final = SparseConv(self.out_channels, "k1", use_bias=True, name="final")(
            res_1, L[0]
        )

        if multires:
            return final, {
                "res_1": res_1,
                "res_2": res_2,
                "res_4": res_4,
                "res_8": res_8,
                "res_16": res_16,
            }
        return res_1, feature_maps, final


class Res16UNet14A(Res16UNetBase):
    planes: tuple = (32, 64, 128, 256, 128, 128, 96, 96)
    layers: tuple = (1, 1, 1, 1, 1, 1, 1, 1)


class Res16UNet18A(Res16UNetBase):
    planes: tuple = (32, 64, 128, 256, 128, 128, 96, 96)
    layers: tuple = (2, 2, 2, 2, 2, 2, 2, 2)


class Res16UNet18B(Res16UNetBase):
    planes: tuple = (32, 64, 128, 256, 128, 128, 128, 128)
    layers: tuple = (2, 2, 2, 2, 2, 2, 2, 2)


class Res16UNet34A(Res16UNetBase):
    planes: tuple = (32, 64, 128, 256, 256, 128, 64, 64)
    layers: tuple = (2, 3, 4, 6, 2, 2, 2, 2)


class Res16UNet34B(Res16UNetBase):
    planes: tuple = (32, 64, 128, 256, 256, 128, 64, 32)
    layers: tuple = (2, 3, 4, 6, 2, 2, 2, 2)


class Res16UNet34C(Res16UNetBase):
    """The reference's flagship backbone (models/res16unet.py:373-374)."""

    planes: tuple = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: tuple = (2, 3, 4, 6, 2, 2, 2, 2)


class Res16UNet34D(Res16UNetBase):
    planes: tuple = (32, 64, 128, 256, 256, 128, 96, 128)
    layers: tuple = (2, 3, 4, 6, 2, 2, 2, 2)
