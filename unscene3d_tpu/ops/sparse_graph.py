"""Static sparse-topology containers for the TPU sparse-conv engine.

MinkowskiEngine (the reference's sparse-conv runtime, models/res16unet.py) builds
coordinate hash maps dynamically on device at every layer. On TPU everything
under jit must be static-shaped, so we precompute the full multi-level topology
of a batch once on the host (numpy / C++), pad every level to a bucketed size,
and ship it to the device as one pytree. All convolutions then become
gather + GEMM with no data-dependent shapes.

Levels: 0 = stride 1 (full res) ... 4 = stride 16, matching the reference
Res16UNet's 4-down/4-up layout (models/res16unet.py:224-297).
"""

from __future__ import annotations

from flax import struct
import jax.numpy as jnp


@struct.dataclass
class LevelGraph:
    """Topology of one resolution level, padded to a static size N.

    coords are "unit coords": original voxel coords integer-divided by the
    level stride, so +-1 neighbor offsets at any level address the same
    relative positions MinkowskiEngine's tensor_stride-scaled kernels do.
    """

    coords: jnp.ndarray        # (N, 4) int32 [batch, x, y, z] unit coords
    valid: jnp.ndarray         # (N,) bool
    # kernel-size-3 neighborhood (27 offsets, z fastest, center at 13).
    # Missing neighbors point at row N-1, which is always a padding row
    # (collation buckets to > nnz), so validity masks are DERIVED on device
    # instead of shipped host->device (the tunnel is the bottleneck).
    nbr_idx: jnp.ndarray       # (27, N) int32 index into this level
    # stride-2 downsample topology (kernel_size=2, stride=2 semantics)
    # children of each voxel at this level in the PREVIOUS (finer) level;
    # missing children point at the finer level's last (padding) row.
    child_idx: jnp.ndarray     # (8, N) int32 index into finer level
    # parent of each voxel at this level in the NEXT (coarser) level;
    # padding rows point at the coarser level's last row.
    parent_idx: jnp.ndarray    # (N,) int32 index into coarser level
    parent_offset: jnp.ndarray  # (N,) int32 in [0, 8) = kernel offset id
    # number of padded rows in the PREVIOUS (finer) level, for deriving
    # child validity (static)
    finer_num_padded: int = struct.field(pytree_node=False, default=0)
    # optional dense-brick map for gather-light k3 convs (ops/bricks.py);
    # when present, k3 convs at this level skip the 27-way neighbor gather
    # and nbr_idx is a (27, 1) stub to keep host->device transfers small
    brick: object = None
    # optional CSR pair tables (ops/csr_conv.py): k3 convs gather only VALID
    # neighbor pairs and combine them with a Pallas segment-combine kernel
    csr: object = None
    # optional window tables (ops/window_conv.py): k3 convs stream sliding
    # index windows HBM->VMEM and select neighbor rows with one-hot MXU
    # matmuls -- no HBM row gathers at all (the round-3 default for
    # eval/bench; see docs/DESIGN.md)
    win: object = None
    # optional K=8 window tables (ops/window_gather.py) for the k2s2 strided
    # conv / AvgPooling (children in the finer level; lives on the COARSE
    # level) and the k2s2 transposed conv (parents in the coarser level;
    # lives on the FINE level)
    win_down: object = None
    win_up: object = None
    # optional kernel-size-3 STRIDE-2 map: for each voxel at THIS level, the
    # finer-level voxel at 2*coord + offset (27 offsets). Needed only by the
    # MinkUNet/ResNet families whose stage blocks stride with k3 convs
    # (reference models/resnet.py:96-133); (27, 1) stub otherwise.
    down_nbr_idx: jnp.ndarray | None = None

    @property
    def num_padded(self) -> int:
        return self.coords.shape[0]

    @property
    def nbr_valid(self) -> jnp.ndarray:
        return self.nbr_idx != (self.num_padded - 1)

    @property
    def child_valid(self) -> jnp.ndarray:
        return self.child_idx != (self.finer_num_padded - 1)

    @property
    def down_nbr_valid(self) -> jnp.ndarray:
        return self.down_nbr_idx != (self.finer_num_padded - 1)


@struct.dataclass
class SparseGraph:
    """Full multi-level topology of one collated batch."""

    levels: tuple[LevelGraph, ...]

    @property
    def num_levels(self) -> int:
        return len(self.levels)


def bucket_size(n: int, align: int = 128, min_size: int = 256,
                fine: bool = False) -> int:
    """Round n up to a geometric bucket to bound XLA recompiles.

    Buckets are {1, 1.25, 1.5, 1.75} * 2^k, aligned to `align`. With
    `fine=True`, sixteenth steps ({1, 1.0625, ..., 1.9375} * 2^k) are used --
    at most ~6% padding waste, for latency-critical single-shape workloads
    (inference/bench) where every gathered padding row costs real bandwidth.
    """
    n = max(int(n), 1)
    target = max(n, min_size)
    p = 1
    while p < target:
        p <<= 1
    if p == target:
        size = p
    else:
        half = p >> 1
        size = p
        steps = [i / 16.0 for i in range(17)] if fine else (1.25, 1.5, 1.75)
        for frac in steps:
            cand = int(half * (1.0 + frac)) if fine else int(half * frac)
            if cand >= target:
                size = cand
                break
    return ((size + align - 1) // align) * align
