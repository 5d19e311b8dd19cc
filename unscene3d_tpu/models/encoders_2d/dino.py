"""DINO ViT-S/8 feature extractor in flax, with the reduced-stride trick.

Re-implements the reference's third_party/dino_vit/extractor.py:16-140 +
models/encoders_2d/dino.py:7-126: a ViT-S (dim 384, 6 heads, 12 blocks,
patch 8) run at stride 4 by re-interpolating the positional embeddings to the
denser token grid, returning per-pixel descriptors (the KEY vectors of a
chosen block, bilinearly upsampled to the input resolution) or the last
block's q/k attention features.

Weights: `load_torch_dino_weights` converts a torch dino_deitsmall8 state
dict (torch is in the image; downloading is not -- pass a local checkpoint
path). Random init otherwise (tests).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _torch_bicubic_1d(x: jnp.ndarray, out_len: int, scale: float, axis: int):
    """torch F.interpolate bicubic along one axis: cubic convolution A=-0.75,
    half-pixel mapping src=(i+0.5)/scale-0.5 with the CALLER's scale factor
    (recompute_scale_factor=False), border-replicated taps."""
    in_len = x.shape[axis]
    a = -0.75
    pos = (jnp.arange(out_len) + 0.5) / scale - 0.5
    base = jnp.floor(pos).astype(jnp.int32)
    t = (pos - base).astype(x.dtype)
    # cubic convolution weights at tap distances s: outer taps use
    # a*s^3-5a*s^2+8a*s-4a, inner taps (a+2)s^3-(a+3)s^2+1 (torch UpSample.h)
    def w_outer(s):
        return a * s**3 - 5 * a * s**2 + 8 * a * s - 4 * a

    def w_inner(s):
        return (a + 2) * s**3 - (a + 3) * s**2 + 1

    w = jnp.stack([w_outer(1 + t), w_inner(t), w_inner(1 - t), w_outer(2 - t)],
                  axis=0)
    out = 0.0
    for tap in range(4):
        idx = jnp.clip(base + tap - 1, 0, in_len - 1)
        out = out + jnp.take(x, idx, axis=axis) * jnp.expand_dims(
            w[tap], tuple(d for d in range(x.ndim) if d != axis))
    return out


def interpolate_pos_encoding_torch(pos: jnp.ndarray, h0: int, w0: int,
                                   grid0: int) -> jnp.ndarray:
    """Bit-faithful port of the reference's stride-trick pos-embed resize
    (third_party/dino_vit/extractor.py:85-119): torch bicubic (A=-0.75) with
    scale_factor=((w0+0.1)/g, (h0+0.1)/g) and recompute_scale_factor=False.

    NOTE the reference applies the W-derived scale to the ROW axis and
    flattens the resulting (w0, h0) grid over an (h0, w0) token layout — a
    transposition on non-square inputs. Replicated verbatim so converted
    weights reproduce reference features exactly.

    pos: (1, g*g+1, D) -> (1, h0*w0+1, D).
    """
    if h0 == grid0 and w0 == grid0:
        return pos
    cls_pos, grid = pos[:, :1], pos[0, 1:]
    d = grid.shape[-1]
    grid = grid.reshape(grid0, grid0, d)
    grid = _torch_bicubic_1d(grid, w0, (w0 + 0.1) / grid0, axis=0)
    grid = _torch_bicubic_1d(grid, h0, (h0 + 0.1) / grid0, axis=1)
    return jnp.concatenate([cls_pos, grid.reshape(1, h0 * w0, d)], axis=1)


class _Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_qkv: bool = False):
        B, N, D = x.shape
        H = self.num_heads
        qkv = nn.Dense(3 * D, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, D // H)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(D // H).astype(x.dtype)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        out = nn.Dense(D, dtype=self.dtype, name="proj")(out)
        if return_qkv:
            return out, (q.reshape(B, N, -1), k.reshape(B, N, -1), v.reshape(B, N, -1))
        return out, None


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_qkv: bool = False):
        h, qkv = _Attention(self.dim, self.num_heads, dtype=self.dtype,
                            name="attn")(nn.LayerNorm(name="norm1")(x), return_qkv)
        x = x + h
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y, qkv


class ViTExtractor(nn.Module):
    """ViT-S/8 run at a reduced stride; returns token-grid features."""

    patch_size: int = 8
    stride: int = 4
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    facet_layer: int = 9          # reference uses layer-10 keys (0-indexed 9)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, facet: str = "key"):
        """images: (B, H, W, 3) normalized. Returns (feats (B, h, w, 384),
        extras) where (h, w) is the stride-grid; facet in
        {'key','query','token','attn_qk'}."""
        B, H, W, _ = images.shape
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(images)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(B, h * w, self.dim)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.tile(cls_token, (B, 1, 1)), x], axis=1)

        # positional embedding stored at the native patch-8 grid; re-interpolate
        # to the reduced-stride grid with the reference's exact torch-bicubic
        # stride trick (third_party/dino_vit/extractor.py:85-140)
        grid0 = 224 // self.patch_size
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, grid0 * grid0 + 1, self.dim))
        x = x + interpolate_pos_encoding_torch(pos, h, w, grid0)

        feats = None
        qkv_last = None
        for i in range(self.depth):
            want_qkv = (facet in ("key", "query") and i == self.facet_layer) or \
                       (facet == "attn_qk" and i == self.depth - 1)
            x, qkv = _Block(self.dim, self.num_heads, dtype=self.dtype,
                            name=f"block_{i}")(x, return_qkv=want_qkv)
            if want_qkv:
                qkv_last = qkv
        x = nn.LayerNorm(name="norm")(x)

        if facet == "token":
            feats = x[:, 1:]
        elif facet == "key":
            feats = qkv_last[1][:, 1:]
        elif facet == "query":
            feats = qkv_last[0][:, 1:]
        elif facet == "attn_qk":
            return (qkv_last[1][:, 1:].reshape(B, h, w, -1),
                    qkv_last[0][:, 1:].reshape(B, h, w, -1))
        else:
            raise ValueError(facet)
        return feats.reshape(B, h, w, -1)


class DinoNet:
    """Reference-compatible wrapper (models/encoders_2d/dino.py:29-126):
    per-pixel descriptors, bilinearly upsampled to the input resolution."""

    feature_dim = 384

    def __init__(self, variables=None, facet: str = "key", stride: int = 4,
                 image_size: tuple = (240, 320)):
        self.model = ViTExtractor(stride=stride)
        self.facet = facet
        self.image_size = image_size
        if variables is None:
            dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(0), dummy)
        self.variables = variables
        self._fwd = jax.jit(
            lambda v, img: self.model.apply(v, img, facet=self.facet)
        )

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: (B, H, W, 3) in [0,1]. Returns (B, H, W, 384) descriptors."""
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        img = (jnp.asarray(images, jnp.float32) - mean) / std
        feats = self._fwd(self.variables, img)
        B, h, w, c = feats.shape
        H, W = images.shape[1:3]
        return np.asarray(jax.image.resize(feats, (B, H, W, c), "bilinear"))


def load_torch_dino_weights(path, stride: int = 4) -> dict:
    """Convert a torch dino ViT-S/8 state dict (path or in-memory dict) into
    flax variables."""
    if isinstance(path, (str, bytes)):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
    else:
        sd = path
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}
    p = {}
    p["cls_token"] = sd["cls_token"].reshape(1, 1, -1)
    p["pos_embed"] = sd["pos_embed"]
    p["patch_embed"] = {
        "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
        "bias": sd["patch_embed.proj.bias"],
    }
    p["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        b = f"blocks.{i}"
        p[f"block_{i}"] = {
            "norm1": {"scale": sd[f"{b}.norm1.weight"], "bias": sd[f"{b}.norm1.bias"]},
            "norm2": {"scale": sd[f"{b}.norm2.weight"], "bias": sd[f"{b}.norm2.bias"]},
            "attn": {
                "qkv": {"kernel": sd[f"{b}.attn.qkv.weight"].T,
                        "bias": sd[f"{b}.attn.qkv.bias"]},
                "proj": {"kernel": sd[f"{b}.attn.proj.weight"].T,
                         "bias": sd[f"{b}.attn.proj.bias"]},
            },
            "mlp_fc1": {"kernel": sd[f"{b}.mlp.fc1.weight"].T,
                        "bias": sd[f"{b}.mlp.fc1.bias"]},
            "mlp_fc2": {"kernel": sd[f"{b}.mlp.fc2.weight"].T,
                        "bias": sd[f"{b}.mlp.fc2.bias"]},
        }
        i += 1
    return {"params": p}
