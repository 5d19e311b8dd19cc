"""Numerical fidelity of the converted 2D encoders: torch-vs-flax forward
checks with random-but-shared weights (torch is in the image; pretrained
checkpoints are not).

Every downstream AP claim rests on the weight converters reproducing the
reference features, so these tests build the reference architectures in
torch op-for-op (DINO ViT stride trick, third_party/dino_vit/extractor.py;
LSeg DPT tower, third_party/LSeg_fork/modules/models/lseg_net.py), export a
reference-format state dict, convert it, and assert the flax forward matches
to float32 tolerance — including the reference's transposed pos-grid
behavior on non-square inputs.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from unscene3d_tpu.models.encoders_2d.dino import (  # noqa: E402
    ViTExtractor, load_torch_dino_weights, interpolate_pos_encoding_torch)
from unscene3d_tpu.models.encoders_2d.lseg import (  # noqa: E402
    LSegFeatureNet, load_torch_lseg_weights)


def _randn_like_state(model, seed):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            scale = 0.3 if v.ndim > 1 else 0.1
            sd[k] = torch.randn(v.shape, generator=g) * scale
            if "running_var" in k:
                sd[k] = sd[k].abs() + 0.5
    model.load_state_dict(sd)
    return sd


# ---------------------------------------------------------------------------
# torch DINO ViT mirror (dino-repo key names: blocks.N.*, patch_embed.proj)
# ---------------------------------------------------------------------------


class _TAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x, return_qkv=False):
        B, N, D = x.shape
        H = self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, H, D // H)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = torch.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(D // H)
        attn = attn.softmax(-1)
        out = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        out = self.proj(out)
        if return_qkv:
            return out, (q.reshape(B, N, -1), k.reshape(B, N, -1))
        return out, None


class _TMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _TBlock(tnn.Module):
    def __init__(self, dim, heads, eps=1e-6):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=eps)
        self.attn = _TAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=eps)
        self.mlp = _TMlp(dim, 4 * dim)

    def forward(self, x, return_qkv=False):
        h, qk = self.attn(self.norm1(x), return_qkv)
        x = x + h
        return x + self.mlp(self.norm2(x)), qk


class _TPatchEmbed(tnn.Module):
    def __init__(self, dim, patch, stride):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, patch, stride=stride)


class _TorchDino(tnn.Module):
    """DINO ViT at a reduced stride, mirroring extractor.py:85-140 verbatim
    (including the +0.1 scale and the (w0, h0) interpolate order)."""

    def __init__(self, dim=32, depth=4, heads=2, patch=8, stride=4, grid0=28):
        super().__init__()
        self.patch = patch
        self.stride = stride
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.zeros(1, grid0 * grid0 + 1, dim))
        self.patch_embed = _TPatchEmbed(dim, patch, stride)
        self.blocks = tnn.ModuleList([_TBlock(dim, heads, eps=1e-6)
                                      for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def interpolate_pos_encoding(self, npatch, w, h):
        N = self.pos_embed.shape[1] - 1
        if npatch == N and w == h:
            return self.pos_embed
        class_pos = self.pos_embed[:, 0]
        grid = self.pos_embed[:, 1:]
        dim = grid.shape[-1]
        w0 = 1 + (w - self.patch) // self.stride
        h0 = 1 + (h - self.patch) // self.stride
        w0f, h0f = w0 + 0.1, h0 + 0.1
        g = int(math.sqrt(N))
        grid = F.interpolate(
            grid.reshape(1, g, g, dim).permute(0, 3, 1, 2),
            scale_factor=(w0f / g, h0f / g),
            mode="bicubic", align_corners=False, recompute_scale_factor=False)
        grid = grid.permute(0, 2, 3, 1).reshape(1, -1, dim)
        return torch.cat((class_pos.unsqueeze(0), grid), dim=1)

    def forward(self, x, facet_layer):
        B, _, H, W = x.shape
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.interpolate_pos_encoding(x.shape[1] - 1, W, H)
        key = None
        for i, blk in enumerate(self.blocks):
            x, qk = blk(x, return_qkv=(i == facet_layer))
            if qk is not None:
                key = qk[1]
        x = self.norm(x)
        return x[:, 1:], key[:, 1:]


def test_dino_torch_vs_flax_square_native_stride():
    """stride == patch on a 224-square: the pos-embed path is an exact
    identity in both frameworks, so this isolates block/conv conversion."""
    tm = _TorchDino(stride=8)
    sd = _randn_like_state(tm, 0)
    tm.eval()

    img = torch.rand(1, 3, 224, 224, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        tok_t, key_t = tm(img, facet_layer=2)

    fm = ViTExtractor(patch_size=8, stride=8, dim=32, depth=4, num_heads=2,
                      facet_layer=2)
    variables = load_torch_dino_weights(
        {k: v for k, v in sd.items()}, stride=8)
    img_j = jnp.asarray(img.permute(0, 2, 3, 1).numpy())
    key_f = fm.apply(variables, img_j, facet="key")
    tok_f = fm.apply(variables, img_j, facet="token")

    h = w = (224 - 8) // 8 + 1
    np.testing.assert_allclose(np.asarray(key_f).reshape(1, h * w, -1),
                               key_t.numpy(), rtol=1e-3, atol=5e-5)
    np.testing.assert_allclose(np.asarray(tok_f).reshape(1, h * w, -1),
                               tok_t.numpy(), rtol=1e-3, atol=5e-5)


def test_dino_torch_vs_flax_stride4_nonsquare():
    """The real deployment shape class: stride 4, non-square input — covers
    the torch-bicubic +0.1-scale interpolation AND the reference's
    transposed pos-grid flattening."""
    tm = _TorchDino(stride=4)
    sd = _randn_like_state(tm, 2)
    tm.eval()

    img = torch.rand(2, 3, 48, 64, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        tok_t, key_t = tm(img, facet_layer=2)

    fm = ViTExtractor(patch_size=8, stride=4, dim=32, depth=4, num_heads=2,
                      facet_layer=2)
    variables = load_torch_dino_weights({k: v for k, v in sd.items()})
    img_j = jnp.asarray(img.permute(0, 2, 3, 1).numpy())
    key_f = fm.apply(variables, img_j, facet="key")

    h0 = 1 + (48 - 8) // 4
    w0 = 1 + (64 - 8) // 4
    np.testing.assert_allclose(np.asarray(key_f).reshape(2, h0 * w0, -1),
                               key_t.numpy(), rtol=1e-3, atol=5e-5)


def test_pos_interp_matches_torch_exactly():
    pos = torch.randn(1, 28 * 28 + 1, 16, generator=torch.Generator().manual_seed(4))
    tm = _TorchDino(dim=16, depth=1, heads=1)
    with torch.no_grad():
        tm.pos_embed.copy_(pos)
    with torch.no_grad():
        want = tm.interpolate_pos_encoding(11 * 15, 64, 48).numpy()
    got = np.asarray(interpolate_pos_encoding_torch(
        jnp.asarray(pos.numpy()), 11, 15, 28))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# torch LSeg mirror (LSeg_fork key names: pretrained.*, scratch.*)
# ---------------------------------------------------------------------------


class _TProjectReadout(tnn.Module):
    def __init__(self, vit_dim):
        super().__init__()
        self.project = tnn.Sequential(tnn.Linear(2 * vit_dim, vit_dim), tnn.GELU())

    def forward(self, x):
        readout = x[:, 0].unsqueeze(1).expand_as(x[:, 1:])
        return self.project(torch.cat((x[:, 1:], readout), -1))


class _TRCU(tnn.Module):
    """ResidualConvUnit_custom with bn=True (lseg_blocks.py:220-285)."""

    def __init__(self, feat):
        super().__init__()
        self.conv1 = tnn.Conv2d(feat, feat, 3, padding=1, bias=False)
        self.conv2 = tnn.Conv2d(feat, feat, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(feat)
        self.bn2 = tnn.BatchNorm2d(feat)

    def forward(self, x):
        out = self.bn1(self.conv1(F.relu(x)))
        out = self.bn2(self.conv2(F.relu(out)))
        return out + x


class _TFusion(tnn.Module):
    def __init__(self, feat):
        super().__init__()
        self.resConfUnit1 = _TRCU(feat)
        self.resConfUnit2 = _TRCU(feat)
        self.out_conv = tnn.Conv2d(feat, feat, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class _TorchLSeg(tnn.Module):
    """Tiny LSeg image tower with reference state-dict key names."""

    def __init__(self, vit_dim=64, depth=4, heads=2, hooks=(0, 1, 2, 3),
                 chans=(16, 32, 64, 64), feat=16, out_dim=512, grid0=4):
        super().__init__()
        self.hooks = hooks

        class _P(tnn.Module):
            pass

        class _M(tnn.Module):
            pass

        pretrained = _P()
        model = _M()
        model.cls_token = tnn.Parameter(torch.zeros(1, 1, vit_dim))
        model.pos_embed = tnn.Parameter(torch.zeros(1, grid0 * grid0 + 1, vit_dim))
        model.patch_embed = _TPatchEmbed(vit_dim, 16, 16)
        model.blocks = tnn.ModuleList([_TBlock(vit_dim, heads) for _ in range(depth)])
        model.norm = tnn.LayerNorm(vit_dim, eps=1e-6)
        pretrained.model = model
        for i, ch in enumerate(chans):
            seq = [_TProjectReadout(vit_dim), tnn.Identity(), tnn.Identity(),
                   tnn.Conv2d(vit_dim, ch, 1)]
            if i == 0:
                seq.append(tnn.ConvTranspose2d(ch, ch, 4, stride=4))
            elif i == 1:
                seq.append(tnn.ConvTranspose2d(ch, ch, 2, stride=2))
            elif i == 3:
                seq.append(tnn.Conv2d(ch, ch, 3, stride=2, padding=1))
            setattr(pretrained, f"act_postprocess{i + 1}", tnn.Sequential(*seq))
        self.pretrained = pretrained

        scratch = _M()
        for i, ch in enumerate(chans):
            setattr(scratch, f"layer{i + 1}_rn", tnn.Conv2d(ch, feat, 3, padding=1, bias=False))
        for i in range(1, 5):
            setattr(scratch, f"refinenet{i}", _TFusion(feat))
        scratch.head1 = tnn.Conv2d(feat, out_dim, 1)
        self.scratch = scratch

    def forward_image(self, x):
        B, _, H, W = x.shape
        m = self.pretrained.model
        t = m.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([m.cls_token.expand(B, -1, -1), t], dim=1)
        h, w = H // 16, W // 16
        pos_tok, pos_grid = m.pos_embed[:, :1], m.pos_embed[0, 1:]
        g = int(math.sqrt(pos_grid.shape[0]))
        pos_grid = F.interpolate(
            pos_grid.reshape(1, g, g, -1).permute(0, 3, 1, 2), size=(h, w),
            mode="bilinear")
        pos_grid = pos_grid.permute(0, 2, 3, 1).reshape(1, h * w, -1)
        t = t + torch.cat([pos_tok, pos_grid], dim=1)
        hooked = []
        for i, blk in enumerate(m.blocks):
            t, _ = blk(t)
            if i in self.hooks:
                hooked.append(t)

        layers = []
        for i in range(4):
            post = getattr(self.pretrained, f"act_postprocess{i + 1}")
            y = post[0](hooked[i])                      # readout -> (B, N, C)
            y = y.transpose(1, 2).unflatten(2, (h, w))  # (B, C, h, w)
            y = post[3](y)
            if len(post) > 4:
                y = post[4](y)
            layers.append(y)
        rn = [getattr(self.scratch, f"layer{i + 1}_rn")(layers[i]) for i in range(4)]
        p4 = self.scratch.refinenet4(rn[3])
        p3 = self.scratch.refinenet3(p4, rn[2])
        p2 = self.scratch.refinenet2(p3, rn[1])
        p1 = self.scratch.refinenet1(p2, rn[0])
        feats = self.scratch.head1(p1)
        feats = feats / feats.norm(dim=1, keepdim=True).clamp_min(1e-12)
        out = F.interpolate(feats, scale_factor=2, mode="bilinear", align_corners=True)
        return out, p1, p2, p3


def test_lseg_torch_vs_flax():
    tm = _TorchLSeg()
    sd = _randn_like_state(tm, 5)
    tm.eval()

    img = torch.rand(2, 3, 96, 64, generator=torch.Generator().manual_seed(6))
    with torch.no_grad():
        out_t, p1_t, p2_t, p3_t = tm.forward_image(img)

    fm = LSegFeatureNet(vit_dim=64, vit_depth=4, vit_heads=2, hooks=(0, 1, 2, 3),
                        reassemble_ch=(16, 32, 64, 64), features=16,
                        native_grid=4)
    variables = load_torch_lseg_weights({k: v.numpy() for k, v in sd.items()})
    img_j = jnp.asarray(img.permute(0, 2, 3, 1).numpy())
    out_f, p1_f, p2_f, p3_f = fm.apply(variables, img_j)

    for got, want, name in ((out_f, out_t, "out"), (p1_f, p1_t, "path1"),
                            (p2_f, p2_t, "path2"), (p3_f, p3_t, "path3")):
        w = want.permute(0, 2, 3, 1).numpy()
        g = np.asarray(got)
        # random BN running stats blow activations up to O(10^3-10^4); judge
        # fp32 fidelity relative to the tensor's own dynamic range
        scale = float(np.abs(w).max())
        np.testing.assert_allclose(g, w, rtol=2e-4, atol=2e-5 * max(scale, 1.0),
                                   err_msg=name)


def test_lseg_net_prefix_and_full_shapes():
    """Converter strips the Lightning `net.` prefix and the full-size config
    produces ViT-L/16-shaped parameters (lseg wrapper load path)."""
    tm = _TorchLSeg()
    sd = {f"net.{k}": v.numpy() for k, v in tm.state_dict().items()}
    variables = load_torch_lseg_weights(sd)
    assert "vit" in variables["params"]
    assert variables["params"]["head1"]["kernel"].shape == (1, 1, 16, 512)

    full = LSegFeatureNet()
    import jax
    shapes = jax.eval_shape(
        lambda: full.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 128, 3))))
    p = shapes["params"]
    assert p["vit"]["pos_embed"].shape == (1, 24 * 24 + 1, 1024)
    assert p["vit"]["block_23"]["attn"]["qkv"]["kernel"].shape == (1024, 3072)
    assert p["post1"]["deconv"]["kernel"].shape == (256, 256, 4, 4)
    assert p["head1"]["kernel"].shape == (1, 1, 256, 512)
