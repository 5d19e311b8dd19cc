"""MinkUNet (ResUNet) and sparse ResNet families.

Re-implements the reference's secondary backbone families:
  * MinkUNetBase (models/resunet.py:11-240): 3-down/3-up UNet with k2s2
    strided convs, skip concats, and a conv-BN-ReLU-conv final head;
    variants ResUNet14/18/34/50 (+A/B/C/D channel plans).
  * ResNetBase (models/resnet.py:9-140): classifier-style stem (conv +
    sum-pool) and 4 stride-2 stages whose first block strides with a k3 conv
    (needs `build_sparse_graph(..., build_down_nbr_maps=True, num_levels=6)`).

The flagship UnScene3D path uses Res16UNet (backbone.py); these families are
provided for parity with the reference's model registry.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from unscene3d_tpu.models.sparse_modules import BasicBlock, SparseBatchNorm, SparseConv
from unscene3d_tpu.ops import conv_ops
from unscene3d_tpu.ops.sparse_graph import SparseGraph


class MinkUNetBase(nn.Module):
    out_channels: int
    planes: tuple = (64, 128, 256, 512, 256, 128, 128)
    layers: tuple = (2, 2, 2, 2, 2, 2)
    init_dim: int = 64
    bn_momentum: float = 0.02
    dtype: Any = jnp.float32

    def _blocks(self, x, level, n, planes, name, train):
        for bi in range(n):
            x = BasicBlock(planes, self.bn_momentum, dtype=self.dtype,
                           name=f"{name}_{bi}")(x, level, train)
        return x

    def _conv_bn_relu(self, x, level, out_ch, kind, name, train):
        x = SparseConv(out_ch, kind, dtype=self.dtype, name=f"{name}_conv")(x, level)
        x = SparseBatchNorm(self.bn_momentum, dtype=self.dtype, name=f"{name}_bn")(
            x, level.valid, train)
        return nn.relu(x)

    @nn.compact
    def __call__(self, features: jnp.ndarray, graph: SparseGraph,
                 train: bool = False):
        assert graph.num_levels >= 4, "MinkUNet needs >= 4 levels"
        L = graph.levels
        p = self.planes

        out = self._conv_bn_relu(features, L[0], self.init_dim, "k3",
                                 "conv1p1s1", train)
        out_b1 = self._blocks(out, L[0], self.layers[0], p[0], "block1", train)

        out = self._conv_bn_relu(out_b1, L[1], out_b1.shape[-1], "down2",
                                 "conv2p1s2", train)
        out_b2 = self._blocks(out, L[1], self.layers[1], p[1], "block2", train)

        out = self._conv_bn_relu(out_b2, L[2], out_b2.shape[-1], "down2",
                                 "conv3p2s2", train)
        out_b3 = self._blocks(out, L[2], self.layers[2], p[2], "block3", train)

        out = self._conv_bn_relu(out_b3, L[3], out_b3.shape[-1], "down2",
                                 "conv4p4s2", train)
        out = self._blocks(out, L[3], self.layers[3], p[3], "block4", train)

        out = self._conv_bn_relu(out, L[2], p[4], "up2", "convtr4p8s2", train)
        out = jnp.concatenate([out, out_b3], axis=-1)
        out = self._blocks(out, L[2], self.layers[4], p[4], "block5", train)

        out = self._conv_bn_relu(out, L[1], p[5], "up2", "convtr5p4s2", train)
        out = jnp.concatenate([out, out_b2], axis=-1)
        out = self._blocks(out, L[1], self.layers[5], p[5], "block6", train)

        out = self._conv_bn_relu(out, L[0], p[6], "up2", "convtr6p2s2", train)
        out = jnp.concatenate([out, out_b1], axis=-1)

        # final head: conv1x1 -> 512 BN ReLU -> conv1x1 (reference :227-240)
        out = self._conv_bn_relu(out, L[0], 512, "k1", "final_hidden", train)
        return SparseConv(self.out_channels, "k1", use_bias=True,
                          name="final")(out, L[0])


class ResUNet14(MinkUNetBase):
    layers: tuple = (1, 1, 1, 1, 1, 1)


class ResUNet18(MinkUNetBase):
    layers: tuple = (2, 2, 2, 2, 2, 2)


class ResUNet34(MinkUNetBase):
    layers: tuple = (2, 3, 4, 6, 2, 2)


class ResUNet14A(ResUNet14):
    planes: tuple = (64, 128, 256, 512, 256, 128, 96)


class ResUNet18A(ResUNet18):
    planes: tuple = (64, 128, 256, 512, 256, 128, 96)


class ResNetBase(nn.Module):
    """Sparse ResNet classifier trunk (reference models/resnet.py:9-140);
    OUT_PIXEL_DIST=32: stem sum-pool (stride 2) + 4 stride-2 stages.
    Requires a 6-level graph built with down-neighbor maps."""

    out_channels: int
    planes: tuple = (64, 128, 256, 512)
    layers: tuple = (2, 2, 2, 2)
    init_dim: int = 64
    bn_momentum: float = 0.02
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, graph: SparseGraph,
                 train: bool = False):
        assert graph.num_levels >= 6, "ResNetBase needs a 6-level graph"
        L = graph.levels
        x = SparseConv(self.init_dim, "k3", dtype=self.dtype, name="conv1")(
            features, L[0])
        x = SparseBatchNorm(self.bn_momentum, dtype=self.dtype, name="bn1")(
            x, L[0].valid, train)
        x = nn.relu(x)
        x = conv_ops.sum_pool2(x, L[1])

        for si, (planes, n) in enumerate(zip(self.planes, self.layers)):
            lvl = L[2 + si]
            x = BasicBlock(planes, self.bn_momentum, stride=2, dtype=self.dtype,
                           name=f"layer{si + 1}_0")(x, lvl, train)
            for bi in range(1, n):
                x = BasicBlock(planes, self.bn_momentum, dtype=self.dtype,
                               name=f"layer{si + 1}_{bi}")(x, lvl, train)

        return SparseConv(self.out_channels, "k1", use_bias=True,
                          name="final")(x, L[5])


class ResNet14(ResNetBase):
    layers: tuple = (1, 1, 1, 1)


class ResNet18(ResNetBase):
    layers: tuple = (2, 2, 2, 2)


class ResNet34(ResNetBase):
    layers: tuple = (3, 4, 6, 3)
