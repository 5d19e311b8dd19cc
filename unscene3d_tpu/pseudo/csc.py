"""CSC (contrastive-scene-context pretrained) 3D feature extraction.

Reference path (pseudo_masks/unscene3d_pseudo_main.py:332-348): run the
CSC-pretrained Res16UNet34C in multires mode, take the `res_{scale}` feature
map and associate low-res voxel features back to full-res voxels with a
KDTree. Here the association is exact and free: the SparseGraph's parent
chain maps every stride-1 voxel to its ancestor at any level, so low-res
features are gathered, not nearest-neighbor matched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from unscene3d_tpu.models.backbone import Res16UNet34C
from unscene3d_tpu.ops.kernel_maps import build_sparse_graph


class CSCFeatureExtractor:
    def __init__(self, variables=None, in_channels: int = 3,
                 resolution_scale: int = 2, num_labels: int = 20):
        """resolution_scale: 2^k stride of the feature map to use
        (reference config freemask.resolution_scale, res_2 default)."""
        self.model = Res16UNet34C(out_channels=num_labels)
        self.resolution_scale = resolution_scale
        self.level = int(np.log2(resolution_scale))
        self.in_channels = in_channels
        self.variables = variables
        self._fwd = None

    def _ensure_init(self, feats, graph):
        if self.variables is None:
            self.variables = self.model.init(
                jax.random.PRNGKey(0), feats, graph, train=False, multires=True
            )
        if self._fwd is None:
            self._fwd = jax.jit(
                lambda v, f, g: self.model.apply(v, f, g, train=False, multires=True)
            )

    def __call__(self, coords: np.ndarray, colors: np.ndarray) -> np.ndarray:
        """coords: (N, 3) int voxel coords (single scene), colors: (N, C)
        normalized features. Returns (N, D) per-voxel CSC features at the
        requested resolution, broadcast to stride 1."""
        bcoords = np.column_stack([np.zeros(len(coords), np.int32), coords])
        graph = build_sparse_graph(bcoords, num_levels=5)
        n0 = graph.levels[0].num_padded
        feats = np.zeros((n0, colors.shape[1]), np.float32)
        feats[: len(coords)] = colors
        self._ensure_init(jnp.asarray(feats), graph)
        _, res = self._fwd(self.variables, jnp.asarray(feats), graph)
        f = res[f"res_{self.resolution_scale}"]
        # broadcast the level-L features down the parent chain to stride 1
        idx = np.arange(n0)
        for lv in range(self.level):
            idx = np.asarray(graph.levels[lv].parent_idx)[idx]
        out = np.asarray(f)[idx]
        return out[: len(coords)]
