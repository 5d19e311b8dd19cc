"""Flax modules wrapping the sparse-conv primitives.

Parameter layouts:
  * k3 convs:  (27, Cin, Cout), offsets ordered per KERNEL3_OFFSETS
  * k2 convs:  (8, Cin, Cout), offsets per KERNEL2_OFFSETS
  * k1 convs:  (Cin, Cout)
Checkpoint converters from MinkowskiEngine (torch) permute kernel axes into
these orders.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from unscene3d_tpu.ops import conv_ops
from unscene3d_tpu.ops.sparse_graph import LevelGraph

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _apply_epilogue(out, valid, scale, shift, residual, relu):
    """XLA fallback for the fused conv epilogue (win levels fuse in-kernel)."""
    y = out.astype(jnp.float32)
    if scale is not None:
        y = y * scale + shift
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return (y * valid[:, None].astype(jnp.float32)).astype(out.dtype)


class SparseConv(nn.Module):
    """Sparse convolution; `kind` selects topology.

    kind: 'k3' (3x3x3 s1), 'k1' (1x1x1), 'down2' (k2 s2), 'up2' (k2 transpose s2).
    For 'down2' pass the coarse LevelGraph; for 'up2' pass the fine LevelGraph.
    """

    out_channels: int
    kind: str = "k3"
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, level: LevelGraph,
                 other: LevelGraph | None = None,
                 scale: jnp.ndarray | None = None,
                 shift: jnp.ndarray | None = None,
                 residual: jnp.ndarray | None = None,
                 relu: bool = False) -> jnp.ndarray:
        """`other`: for 'down2' the FINE level, for 'up2' the COARSE level --
        enables the scatter-free custom VJP (ops/conv_ops.py).

        scale/shift/residual/relu: optional fused epilogue (folded BatchNorm
        + residual add + activation); fuses into the window kernel's
        epilogue at win levels, applied as one XLA elementwise pass
        otherwise. Inference-path only (no custom VJP)."""
        cin = x.shape[-1]
        cout = self.out_channels
        bias = (
            self.param("bias", nn.initializers.zeros, (cout,))
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        fused = scale is not None or residual is not None or relu
        if self.kind == "k3":
            w = self.param("kernel", _conv_init, (27, cin, cout))
            if fused and level.win is not None:
                from unscene3d_tpu.ops.window_conv import window_conv3_fwd

                return window_conv3_fwd(
                    x, w.astype(self.dtype), level.win, level.valid,
                    bias=bias, scale=scale, shift=shift, residual=residual,
                    relu=relu)
            out = conv_ops.sparse_conv3(x, w.astype(self.dtype), level, bias)
            if fused:
                out = _apply_epilogue(out, level.valid, scale, shift,
                                      residual, relu)
            return out
        elif self.kind == "k1":
            w = self.param("kernel", _conv_init, (cin, cout))
            out = conv_ops.sparse_conv1(x, w.astype(self.dtype), level, bias)
        elif self.kind == "down2":
            w = self.param("kernel", _conv_init, (8, cin, cout))
            out = conv_ops.sparse_conv_down2(x, w.astype(self.dtype), level,
                                             bias, fine=other)
        elif self.kind == "up2":
            w = self.param("kernel", _conv_init, (8, cin, cout))
            out = conv_ops.sparse_conv_up2(x, w.astype(self.dtype), level,
                                           bias, coarse=other)
        elif self.kind == "k3down2":
            w = self.param("kernel", _conv_init, (27, cin, cout))
            out = conv_ops.sparse_conv3_down2(x, w.astype(self.dtype), level, bias)
        elif self.kind == "k1down2":
            w = self.param("kernel", _conv_init, (cin, cout))
            out = conv_ops.sparse_conv1_down2(x, w.astype(self.dtype), level, bias)
        else:
            raise ValueError(f"unknown conv kind {self.kind!r}")
        if fused:
            out = _apply_epilogue(out, level.valid, scale, shift, residual,
                                  relu)
        return out


class SparseBatchNorm(nn.Module):
    """BatchNorm over valid voxels only (padding rows excluded from stats).

    Matches torch BatchNorm1d semantics: biased variance for normalization,
    unbiased for the running estimate; torch momentum m maps to
    running = (1-m)*running + m*batch. Reference uses bn_momentum=0.02
    (conf/model/mask3d.yaml backbone config).
    """

    momentum: float = 0.02  # torch-style momentum
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, valid, train: bool, fold: bool = False,
                 features: int | None = None):
        """fold=True: return the eval-time affine constants (scale, shift)
        with y = x*scale + shift == (x - mean)*rsqrt(var+eps)*gamma + beta,
        for fusing into a conv epilogue (pass `features`; x/valid unused)."""
        features = x.shape[-1] if x is not None else features
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if fold:
            assert not train, "BN folding is an inference-path optimization"
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            return inv, bias - ra_mean.value * inv

        if train:
            w = valid.astype(jnp.float32)
            cnt = jnp.maximum(w.sum(), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * w[:, None]).sum(0) / cnt
            var = (jnp.square(xf - mean) * w[:, None]).sum(0) / cnt
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        y = y * valid[:, None].astype(jnp.float32)
        return y.astype(self.dtype)


class BasicBlock(nn.Module):
    """Residual basic block (reference models/modules/resnet_block.py:7-64).

    stride=2 strides with a k3 conv into `level` (the coarse LevelGraph),
    with a k1-stride-2 shortcut -- the MinkUNet/ResNet stage pattern
    (reference models/resnet.py:96-133). stride=1 operates within `level`.
    """

    planes: int
    bn_momentum: float = 0.02
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, level: LevelGraph, train: bool) -> jnp.ndarray:
        # inference: fold BN into the conv epilogue and fuse residual+ReLU
        # (one kernel per conv at win levels, one XLA elementwise pass
        # otherwise); training keeps separate BN for batch-stat updates
        if not train and self.stride == 1:
            conv1 = SparseConv(self.planes, "k3", dtype=self.dtype, name="conv1")
            s1, b1 = SparseBatchNorm(self.bn_momentum, dtype=self.dtype,
                                     name="norm1")(None, None, False, fold=True,
                                                   features=self.planes)
            conv2 = SparseConv(self.planes, "k3", dtype=self.dtype, name="conv2")
            s2, b2 = SparseBatchNorm(self.bn_momentum, dtype=self.dtype,
                                     name="norm2")(None, None, False, fold=True,
                                                   features=self.planes)
            residual = x
            if x.shape[-1] != self.planes:
                sd, bd = SparseBatchNorm(
                    self.bn_momentum, dtype=self.dtype, name="downsample_norm"
                )(None, None, False, fold=True, features=self.planes)
                residual = SparseConv(self.planes, "k1", dtype=self.dtype,
                                      name="downsample_conv")(
                    x, level, scale=sd, shift=bd)
            out = conv1(x, level, scale=s1, shift=b1, relu=True)
            return conv2(out, level, scale=s2, shift=b2, residual=residual,
                         relu=True)

        residual = x
        kind1 = "k3down2" if self.stride == 2 else "k3"
        out = SparseConv(self.planes, kind1, dtype=self.dtype, name="conv1")(x, level)
        out = SparseBatchNorm(self.bn_momentum, dtype=self.dtype, name="norm1")(
            out, level.valid, train
        )
        out = nn.relu(out)
        out = SparseConv(self.planes, "k3", dtype=self.dtype, name="conv2")(out, level)
        out = SparseBatchNorm(self.bn_momentum, dtype=self.dtype, name="norm2")(
            out, level.valid, train
        )
        if x.shape[-1] != self.planes or self.stride != 1:
            skind = "k1down2" if self.stride == 2 else "k1"
            residual = SparseConv(self.planes, skind, dtype=self.dtype, name="downsample_conv")(
                x, level
            )
            residual = SparseBatchNorm(
                self.bn_momentum, dtype=self.dtype, name="downsample_norm"
            )(residual, level.valid, train)
        return nn.relu(out + residual)
