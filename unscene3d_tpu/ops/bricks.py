"""Dense-brick sparse convolution: gather-light k3 convs via XLA 3D convs.

The output-centric gather formulation reads 27 rows per voxel; on TPU, row
gathers run at a fraction of streaming bandwidth, so the k3 convs dominate
the backbone. Brick mode instead:
  1. assemble occupied 8^3 bricks (plus a 1-voxel halo -> 10^3) with ONE
     gather of ~(1/fill)*(10/8)^3 rows per voxel -- ~3.5x fewer gathered rows
  2. run a dense 3D convolution (VALID, NDHWC) on the MXU
  3. gather each voxel's output cell back to the flat layout.
Empty cells hold zeros, so results are bit-identical to the masked-gather
formulation (submanifold semantics preserved: outputs exist only at input
voxels).

Weight layout note: our (27, Cin, Cout) offsets enumerate z fastest, so
w.reshape(3,3,3,Cin,Cout) is directly the DHWIO correlation kernel
(lax.conv_general_dilated applies no kernel flip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from unscene3d_tpu.ops.hashing import CoordHashTable
from unscene3d_tpu.ops.sparse_graph import LevelGraph, bucket_size

BRICK = 8
HALO = BRICK + 2


@struct.dataclass
class BrickMap:
    assemble_idx: jnp.ndarray   # (nb, 10, 10, 10) int32 flat voxel row; missing -> n_pad-1
    out_idx: jnp.ndarray        # (N_pad,) int32 into nb*512; padding rows -> 0

    @property
    def num_bricks(self) -> int:
        return self.assemble_idx.shape[0]


def build_brick_map(coords: np.ndarray, valid: np.ndarray,
                    nb_pad: int | None = None) -> BrickMap:
    """coords: (N_pad, 4) int [b,x,y,z] unit coords; valid: (N_pad,)."""
    coords = np.asarray(coords, np.int64)
    n_pad = len(coords)
    real = coords[valid]
    n = len(real)

    brick_of = real.copy()
    brick_of[:, 1:] >>= 3
    keys = (
        (brick_of[:, 0] << 54)
        | ((brick_of[:, 1] + (1 << 17)) << 36)
        | ((brick_of[:, 2] + (1 << 17)) << 18)
        | (brick_of[:, 3] + (1 << 17))
    )
    uniq_keys, inverse = np.unique(keys, return_inverse=True)
    nb = len(uniq_keys)
    if nb_pad is None:
        nb_pad = bucket_size(nb, align=8, min_size=8)

    # brick base coords
    b = (uniq_keys >> 54).astype(np.int64)
    bx = ((uniq_keys >> 36) & ((1 << 18) - 1)) - (1 << 17)
    by = ((uniq_keys >> 18) & ((1 << 18) - 1)) - (1 << 17)
    bz = (uniq_keys & ((1 << 18) - 1)) - (1 << 17)

    # assemble queries via key arithmetic: ravel_hash fields are disjoint bit
    # ranges, so coord offsets are key ADDITIONS -- no (nb*1000, 4) coord
    # materialization (np.repeat dominated the build otherwise)
    rng = np.arange(-1, BRICK + 1, dtype=np.int64)
    ii, jj, kk = np.meshgrid(rng, rng, rng, indexing="ij")
    cell_key_off = (ii.ravel() << 36) + (jj.ravel() << 18) + kk.ravel()  # (1000,)
    offset = 1 << 17
    base_key = (
        (b << 54)
        | ((bx * BRICK + offset) << 36)
        | ((by * BRICK + offset) << 18)
        | (bz * BRICK + offset)
    )
    keys = base_key[:, None] + cell_key_off[None, :]  # (nb, 1000)

    table = CoordHashTable(coords[valid])
    # map back into padded-row indices
    real_rows = np.nonzero(valid)[0].astype(np.int64)
    idx, found = table.lookup_keys(keys)
    rows = np.where(found, real_rows[np.where(found, idx, 0)], n_pad - 1)

    assemble = np.full((nb_pad, HALO, HALO, HALO), n_pad - 1, np.int32)
    assemble[:nb] = rows.reshape(nb, HALO, HALO, HALO).astype(np.int32)

    local = real[:, 1:] - np.column_stack([bx, by, bz])[inverse] * BRICK
    flat_cell = (inverse * (BRICK ** 3)
                 + local[:, 0] * BRICK * BRICK + local[:, 1] * BRICK + local[:, 2])
    out_idx = np.zeros(n_pad, np.int32)
    out_idx[real_rows] = flat_cell.astype(np.int32)
    return BrickMap(assemble_idx=jnp.asarray(assemble), out_idx=jnp.asarray(out_idx))


def brick_conv3(x: jnp.ndarray, w: jnp.ndarray, bm: BrickMap, level: LevelGraph,
                bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """kernel_size=3 stride=1 sparse conv via dense bricks. x: (N_pad, Cin),
    w: (27, Cin, Cout) in the z-fastest offset order."""
    nb = bm.num_bricks
    cin = x.shape[-1]
    cout = w.shape[-1]
    g = jnp.take(x, bm.assemble_idx.reshape(-1), axis=0)
    g = g.reshape(nb, HALO, HALO, HALO, cin)
    y = jax.lax.conv_general_dilated(
        g,
        w.reshape(3, 3, 3, cin, cout).astype(x.dtype),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    out = jnp.take(y.reshape(nb * BRICK ** 3, cout), bm.out_idx, axis=0)
    if bias is not None:
        out = out + bias
    out = out * level.valid[:, None].astype(out.dtype)
    return out.astype(x.dtype)
