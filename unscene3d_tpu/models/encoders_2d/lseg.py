"""LSeg language-driven 2D encoder (real architecture, feature_dim 512).

Re-implements the reference's vendored LSeg fork — a DPT decoder over a CLIP-
aligned ViT-L/16 backbone — in flax, matching the torch math op for op:

- ViT backbone with hooked block activations at depths [5, 11, 17, 23] and
  bilinearly re-interpolated positional embeddings
  (third_party/LSeg_fork/modules/models/lseg_vit.py:104-201,408-533).
- "project" readout: concat(cls, patch) -> Linear -> GELU per hooked layer
  (lseg_vit.py:79-91,204-219).
- Reassembly (act_postprocess): 1x1 conv to [256,512,1024,1024] channels,
  then x4 / x2 transposed conv / identity / stride-2 conv resampling
  (lseg_vit.py:446-523).
- Scratch 3x3 convs (bias-free) to 256 features + four
  FeatureFusionBlock_custom refinenets with BatchNorm residual conv units and
  align_corners=True bilinear x2 upsampling
  (modules/models/lseg_blocks.py:60-109,220-358).
- head1 1x1 conv to 512, L2 normalization, final x2 bilinear upsample; the
  multi-resolution `forward_image` contract returns (full, 1/2, 1/4, 1/8)
  feature maps in NHWC (lseg_net.py:231-265, wrapped NHWC at
  models/encoders_2d/lseg.py:46-63).

Text-driven relevance maps use precomputed CLIP text embeddings — the
reference itself precomputes them at init and deletes the CLIP tower
(lseg_net.py:160-173); `text_embeddings` here plays that precomputed role.

`load_torch_lseg_weights` converts a reference LSeg checkpoint
(`state['state_dict']` with `net.` prefixes, models/encoders_2d/lseg.py:31-35)
into flax variables, including BatchNorm running stats.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# torch-parity helpers
# ---------------------------------------------------------------------------


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 upsample with torch's align_corners=True semantics.

    Output pixel i samples input coordinate i*(H-1)/(2H-1); jax.image.resize
    only implements half-pixel centers (align_corners=False), so gather+lerp
    by hand. x: (B, H, W, C).
    """
    B, H, W, C = x.shape

    def axis_weights(n):
        out = 2 * n
        if n == 1:
            return jnp.zeros(out, jnp.int32), jnp.zeros(out, jnp.int32), jnp.zeros(out, x.dtype)
        pos = jnp.arange(out) * (n - 1) / (out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        return lo, hi, (pos - lo).astype(x.dtype)

    ylo, yhi, wy = axis_weights(H)
    xlo, xhi, wx = axis_weights(W)
    top = x[:, ylo] * (1 - wy)[None, :, None, None] + x[:, yhi] * wy[None, :, None, None]
    out = (top[:, :, xlo] * (1 - wx)[None, None, :, None]
           + top[:, :, xhi] * wx[None, None, :, None])
    return out


def resize_pos_embed(pos: jnp.ndarray, gs_h: int, gs_w: int) -> jnp.ndarray:
    """torch F.interpolate bilinear (align_corners=False) of the pos-embed
    grid, keeping the cls token (lseg_vit.py:149-163)."""
    tok, grid = pos[:, :1], pos[0, 1:]
    gs_old = int(round(float(np.sqrt(grid.shape[0]))))
    grid = grid.reshape(1, gs_old, gs_old, -1)
    # antialias=False: torch F.interpolate never low-pass-filters, even when
    # shrinking the grid (240-crop deployments shrink 24 -> 15)
    grid = jax.image.resize(grid, (1, gs_h, gs_w, grid.shape[-1]), "bilinear",
                            antialias=False)
    return jnp.concatenate([tok, grid.reshape(1, gs_h * gs_w, -1)], axis=1)


# ---------------------------------------------------------------------------
# ViT backbone (timm vit_large_patch16_384 semantics)
# ---------------------------------------------------------------------------


class _ViTAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        H = self.num_heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, D // H)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (D // H) ** -0.5
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


class _ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + _ViTAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x))
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class _HookedViT(nn.Module):
    """ViT trunk returning the four hooked block outputs (forward_flex +
    forward hooks, lseg_vit.py:104-201)."""

    dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 16
    hooks: Sequence[int] = (5, 11, 17, 23)
    native_grid: int = 24          # 384 // 16: pos-embed storage grid
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        B, H, W, _ = images.shape
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(images)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(B, h * w, self.dim)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.tile(cls_token, (B, 1, 1)), x], axis=1)

        g = self.native_grid
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, g * g + 1, self.dim))
        x = x + resize_pos_embed(pos, h, w)

        hooked = []
        hookset = set(self.hooks)
        for i in range(self.depth):
            x = _ViTBlock(self.dim, self.num_heads, dtype=self.dtype,
                          name=f"block_{i}")(x)
            if i in hookset:
                hooked.append(x)
        return hooked, (h, w)


# ---------------------------------------------------------------------------
# DPT reassembly + fusion
# ---------------------------------------------------------------------------


class _ProjectReadout(nn.Module):
    """concat(patch, cls) -> Linear -> exact GELU (lseg_vit.py:79-91)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        readout = jnp.broadcast_to(x[:, :1], x[:, 1:].shape)
        feats = jnp.concatenate([x[:, 1:], readout], axis=-1)
        return nn.gelu(nn.Dense(self.dim, dtype=self.dtype, name="project")(feats),
                       approximate=False)


class _DeconvEven(nn.Module):
    """ConvTranspose2d with kernel == stride: each input pixel expands to a
    k x k block. Kernel stored in the torch (Cin, Cout, kh, kw) layout so the
    converter copies it verbatim."""

    out_ch: int
    k: int

    @nn.compact
    def __call__(self, x):
        B, h, w, ci = x.shape
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (ci, self.out_ch, self.k, self.k))
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        y = jnp.einsum("bhwi,iodk->bhdwko", x, kern)
        y = y.reshape(B, h * self.k, w * self.k, self.out_ch) + bias
        return y


class _Reassemble(nn.Module):
    """One act_postprocess branch (lseg_vit.py:446-523): project readout,
    token grid -> image grid, 1x1 channel conv, then the per-level resample."""

    vit_dim: int
    out_ch: int
    resample: str          # "up4" | "up2" | "none" | "down2"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, h, w):
        x = _ProjectReadout(self.vit_dim, dtype=self.dtype, name="readout")(tokens)
        B = x.shape[0]
        x = x.reshape(B, h, w, self.vit_dim)
        x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv")(x)
        if self.resample == "up4":
            x = _DeconvEven(self.out_ch, 4, name="deconv")(x)
        elif self.resample == "up2":
            x = _DeconvEven(self.out_ch, 2, name="deconv")(x)
        elif self.resample == "down2":
            x = nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name="down")(x)
        return x


class _ResidualConvUnit(nn.Module):
    """ResidualConvUnit_custom with bn=True (lseg_blocks.py:220-285):
    relu -> conv(no bias) -> BN -> relu -> conv -> BN, + skip."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                      dtype=self.dtype, name="conv1")(out)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn2")(out)
        return out + x


class _FeatureFusion(nn.Module):
    """FeatureFusionBlock_custom (lseg_blocks.py:288-358)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + _ResidualConvUnit(self.features, dtype=self.dtype, name="rcu1")(skip)
        x = _ResidualConvUnit(self.features, dtype=self.dtype, name="rcu2")(x)
        x = upsample2x_align_corners(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class LSegFeatureNet(nn.Module):
    """The full LSeg image tower: forward_image semantics
    (lseg_net.py:231-265). Returns NHWC (out@H, path1@H/2, path2@H/4,
    path3@H/8); `out` is the L2-normalized 512-d pixel-feature map."""

    vit_dim: int = 1024
    vit_depth: int = 24
    vit_heads: int = 16
    patch_size: int = 16
    hooks: Sequence[int] = (5, 11, 17, 23)
    reassemble_ch: Sequence[int] = (256, 512, 1024, 1024)
    features: int = 256
    out_dim: int = 512
    native_grid: int = 24
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        hooked, (h, w) = _HookedViT(
            self.vit_dim, self.vit_depth, self.vit_heads, self.patch_size,
            self.hooks, self.native_grid, dtype=self.dtype, name="vit")(images)

        resamples = ("up4", "up2", "none", "down2")
        layers = [
            _Reassemble(self.vit_dim, ch, rs, dtype=self.dtype, name=f"post{i + 1}")(
                hooked[i], h, w)
            for i, (ch, rs) in enumerate(zip(self.reassemble_ch, resamples))
        ]
        rn = [
            nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name=f"layer{i + 1}_rn")(layers[i])
            for i in range(4)
        ]

        path4 = _FeatureFusion(self.features, dtype=self.dtype, name="refinenet4")(rn[3])
        path3 = _FeatureFusion(self.features, dtype=self.dtype, name="refinenet3")(path4, rn[2])
        path2 = _FeatureFusion(self.features, dtype=self.dtype, name="refinenet2")(path3, rn[1])
        path1 = _FeatureFusion(self.features, dtype=self.dtype, name="refinenet1")(path2, rn[0])

        feats = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="head1")(path1)
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        out = upsample2x_align_corners(feats)
        return out, path1, path2, path3


class LSegNet:
    """Reference-wrapper-compatible LSeg (models/encoders_2d/lseg.py:8-63).

    __call__ takes (B, H, W, 3) images in [0,1] and returns full-res 512-d
    normalized pixel features; `forward_multi_res` mirrors the reference
    wrapper's (out, half, quarter, eighth) contract, with an optional
    (B, V, ...) frame axis.
    """

    feature_dim = 512

    def __init__(self, variables=None, image_size: tuple = (256, 320),
                 text_embeddings: np.ndarray | None = None,
                 tiny: bool = False):
        cfg = dict(vit_dim=64, vit_depth=4, vit_heads=2, hooks=(0, 1, 2, 3),
                   reassemble_ch=(16, 32, 64, 64), features=16,
                   native_grid=4) if tiny else {}
        self.model = LSegFeatureNet(**cfg)
        if image_size[0] % 32 or image_size[1] % 32:
            raise ValueError(
                f"LSeg needs H,W divisible by 32 (token grid must survive the "
                f"/32 pyramid + x2 fusions); got {image_size}. The reference "
                f"enforces this via its square crop sizes.")
        self.image_size = tuple(image_size)
        self.text_embeddings = text_embeddings  # (num_labels, 512) precomputed CLIP
        if variables is None:
            dummy = jnp.zeros((1,) + self.image_size + (3,), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(0), dummy)
        self.variables = variables
        self._fwd = jax.jit(lambda v, img: self.model.apply(v, img))

    def _normalize(self, images):
        # LSeg transform: ImageNet mean/std (LSeg_fork/modules/lseg_module.py)
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        return (jnp.asarray(images, jnp.float32) - mean) / std

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images (B, H, W, 3) in [0,1] -> (B, H, W, 512) normalized feats."""
        out, _, _, _ = self._fwd(self.variables, self._normalize(images))
        return np.asarray(out)

    def forward_multi_res(self, images: np.ndarray):
        """images (B, V, H, W, 3) -> (out, half, quarter, eighth), each
        (B, V, h, w, C) — the reference wrapper's forward contract
        (models/encoders_2d/lseg.py:46-63)."""
        arr = np.asarray(images)
        B, V = arr.shape[:2]
        flat = arr.reshape((-1,) + arr.shape[2:])
        out, p1, p2, p3 = self._fwd(self.variables, self._normalize(flat))
        def split(t):
            t = np.asarray(t)
            return t.reshape((B, V) + t.shape[1:])
        return split(out), split(p1), split(p2), split(p3)

    def relevance_maps(self, images: np.ndarray) -> np.ndarray:
        """Per-pixel label logits against precomputed CLIP text embeddings
        (lseg_net.py:176-221 with precompute_text_feats=True)."""
        if self.text_embeddings is None:
            raise ValueError("no text embeddings loaded")
        text = np.asarray(self.text_embeddings, np.float32)
        text = text / np.maximum(np.linalg.norm(text, axis=-1, keepdims=True), 1e-12)
        feats = self(images)
        logit_scale = float(np.exp(np.log(1.0 / 0.07)))
        return logit_scale * feats @ text.T


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _conv(sd, key):
    return {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0),
            **({"bias": sd[f"{key}.bias"]} if f"{key}.bias" in sd else {})}


def _dense(sd, key):
    return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _bn(sd, key):
    params = {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}
    stats = {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]}
    return params, stats


def load_torch_lseg_weights(path_or_state) -> dict:
    """Convert a reference LSeg checkpoint into LSegFeatureNet variables.

    Accepts a file path or an in-memory state dict; strips the Lightning
    `net.` prefix the reference wrapper strips
    (models/encoders_2d/lseg.py:31-35). Returns {'params': ..,
    'batch_stats': ..}.
    """
    if isinstance(path_or_state, (str, bytes)):
        import torch

        state = torch.load(path_or_state, map_location="cpu", weights_only=False)
        sd = state.get("state_dict", state)
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v) for k, v in path_or_state.items()}
    if any(k.startswith("net.") for k in sd):
        sd = {k[4:]: v for k, v in sd.items() if k.startswith("net.")}

    p: dict = {}
    stats: dict = {}

    vit: dict = {
        "cls_token": sd["pretrained.model.cls_token"].reshape(1, 1, -1),
        "pos_embed": sd["pretrained.model.pos_embed"],
        "patch_embed": _conv(sd, "pretrained.model.patch_embed.proj"),
    }
    i = 0
    while f"pretrained.model.blocks.{i}.norm1.weight" in sd:
        b = f"pretrained.model.blocks.{i}"
        vit[f"block_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "attn": {"qkv": _dense(sd, f"{b}.attn.qkv"),
                     "proj": _dense(sd, f"{b}.attn.proj")},
            "mlp_fc1": _dense(sd, f"{b}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{b}.mlp.fc2"),
        }
        i += 1
    p["vit"] = vit

    # act_postprocess branches: [0]=readout, [3]=1x1 conv, [4]=resample
    for li, resample in enumerate(("up4", "up2", "none", "down2")):
        key = f"pretrained.act_postprocess{li + 1}"
        branch = {
            "readout": {"project": _dense(sd, f"{key}.0.project.0")},
            "conv": _conv(sd, f"{key}.3"),
        }
        if resample in ("up4", "up2"):
            branch["deconv"] = {"kernel": sd[f"{key}.4.weight"],
                                "bias": sd[f"{key}.4.bias"]}
        elif resample == "down2":
            branch["down"] = _conv(sd, f"{key}.4")
        p[f"post{li + 1}"] = branch

    for li in range(4):
        p[f"layer{li + 1}_rn"] = _conv(sd, f"scratch.layer{li + 1}_rn")

    for ri in range(1, 5):
        key = f"scratch.refinenet{ri}"
        block: dict = {"out_conv": _conv(sd, f"{key}.out_conv")}
        bstats: dict = {}
        for rcu_t, rcu_f in (("resConfUnit1", "rcu1"), ("resConfUnit2", "rcu2")):
            if f"{key}.{rcu_t}.conv1.weight" not in sd:
                continue
            unit = {"conv1": _conv(sd, f"{key}.{rcu_t}.conv1"),
                    "conv2": _conv(sd, f"{key}.{rcu_t}.conv2")}
            ustats = {}
            for bn in ("bn1", "bn2"):
                bn_p, bn_s = _bn(sd, f"{key}.{rcu_t}.{bn}")
                unit[bn] = bn_p
                ustats[bn] = bn_s
            block[rcu_f] = unit
            bstats[rcu_f] = ustats
        p[f"refinenet{ri}"] = block
        stats[f"refinenet{ri}"] = bstats

    p["head1"] = _conv(sd, "scratch.head1")
    return {"params": p, "batch_stats": stats}
