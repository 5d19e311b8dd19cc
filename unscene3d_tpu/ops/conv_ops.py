"""Device-side sparse convolution primitives (pure XLA, jit-static shapes).

These replace MinkowskiEngine's CUDA sparse convs (reference:
models/modules/common.py:125-185) with an output-centric gather + GEMM
formulation: for every output voxel we gather the input feature at each kernel
offset (host-precomputed `LevelGraph` maps) and accumulate K matmuls on the
MXU. There are no scatters anywhere -- invalid neighbors gather row 0 and are
masked to zero, so results are bitwise deterministic (unlike the reference's
atomicAdd kernels).

All functions take features as (N_pad, C) flat arrays (scenes concatenated,
zero-padded) exactly like MinkowskiEngine's batched SparseTensor layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unscene3d_tpu.ops.sparse_graph import LevelGraph


def _masked_gather(x: jnp.ndarray, idx: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of x at idx, zeroing invalid entries. idx/valid: (..., M)."""
    g = jnp.take(x, idx, axis=0)
    return g * valid[..., None].astype(x.dtype)


def sparse_conv3(x: jnp.ndarray, w: jnp.ndarray, level: LevelGraph,
                 bias: jnp.ndarray | None = None,
                 impl: str = "scan") -> jnp.ndarray:
    """kernel_size=3, stride=1 sparse conv at one level.

    x: (N, Cin), w: (27, Cin, Cout). Output (N, Cout) on the same coords.

    impl: 'scan' serializes the 27 offset steps (minimal live memory),
    'unroll' emits an independent gather+GEMM per offset with a balanced
    reduction tree (lets XLA overlap gathers with MXU work at the cost of
    transient memory).
    """
    if level.brick is not None:
        from unscene3d_tpu.ops.bricks import brick_conv3

        return brick_conv3(x, w, level.brick, level, bias)

    n, cin = x.shape
    cout = w.shape[-1]
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)

    if impl == "unroll":
        terms = []
        for k in range(27):
            g = _masked_gather(x, level.nbr_idx[k], level.nbr_valid[k])
            terms.append(jnp.dot(g, w[k], preferred_element_type=acc_dtype))
        while len(terms) > 1:  # balanced reduction tree
            terms = [
                terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
                for i in range(0, len(terms), 2)
            ]
        out = terms[0]
    else:
        def step(acc, inp):
            idx, valid, wk = inp
            g = _masked_gather(x, idx, valid)
            return acc + jnp.dot(g, wk, preferred_element_type=acc.dtype), None

        acc0 = jnp.zeros((n, cout), dtype=acc_dtype)
        out, _ = jax.lax.scan(step, acc0, (level.nbr_idx, level.nbr_valid, w))
    if bias is not None:
        out = out + bias
    out = out * level.valid[:, None].astype(out.dtype)
    return out.astype(x.dtype)


def sparse_conv1(x: jnp.ndarray, w: jnp.ndarray, level: LevelGraph,
                 bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """kernel_size=1 conv: a plain per-voxel matmul."""
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    out = out * level.valid[:, None].astype(out.dtype)
    return out.astype(x.dtype)


def sparse_conv_down2(x: jnp.ndarray, w: jnp.ndarray, coarse: LevelGraph,
                      bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """kernel_size=2, stride=2 sparse conv: fine level -> coarse level.

    x: (N_fine, Cin), w: (8, Cin, Cout). Output (N_coarse, Cout). Every fine
    voxel contributes to exactly one coarse voxel (its floor(c/2) parent), so
    the map is the child table of the coarse level.
    """
    cout = w.shape[-1]
    n_out = coarse.num_padded

    def step(acc, inp):
        idx, valid, wk = inp
        g = _masked_gather(x, idx, valid)
        return acc + jnp.dot(g, wk, preferred_element_type=acc.dtype), None

    acc0 = jnp.zeros((n_out, cout), dtype=jnp.promote_types(x.dtype, jnp.float32))
    out, _ = jax.lax.scan(step, acc0, (coarse.child_idx, coarse.child_valid, w))
    if bias is not None:
        out = out + bias
    out = out * coarse.valid[:, None].astype(out.dtype)
    return out.astype(x.dtype)


def sparse_conv_up2(x: jnp.ndarray, w: jnp.ndarray, fine: LevelGraph,
                    bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """kernel_size=2, upsample_stride=2 transposed conv: coarse -> fine level.

    x: (N_coarse, Cin), w: (8, Cin, Cout). Output lands on the fine level's
    existing coords (MinkowskiEngine conv_tr reuses the downsampling path's
    coordinate map, which the reference's skip-concats require,
    models/res16unet.py:259-290).

    Each fine voxel has exactly one coarse parent and a known kernel offset,
    so we compute one big (N_coarse, Cin) x (Cin, 8*Cout) GEMM and gather the
    (parent, offset) row per fine voxel.
    """
    n_c, cin = x.shape
    cout = w.shape[-1]
    # (N_coarse, 8*Cout) single MXU GEMM
    z = jnp.dot(x, w.transpose(1, 0, 2).reshape(cin, 8 * cout),
                preferred_element_type=jnp.float32)
    flat_idx = fine.parent_idx * 8 + fine.parent_offset
    out = jnp.take(z.reshape(n_c * 8, cout), flat_idx, axis=0)
    if bias is not None:
        out = out + bias
    out = out * fine.valid[:, None].astype(out.dtype)
    return out.astype(x.dtype)


def sparse_conv3_down2(x: jnp.ndarray, w: jnp.ndarray, coarse: LevelGraph,
                       bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """kernel_size=3, STRIDE-2 conv (MinkUNet/ResNet stage convs): fine ->
    coarse level via the coarse level's down_nbr map. x: (N_fine, Cin),
    w: (27, Cin, Cout)."""
    cout = w.shape[-1]
    n_out = coarse.num_padded

    def step(acc, inp):
        idx, valid, wk = inp
        g = _masked_gather(x, idx, valid)
        return acc + jnp.dot(g, wk, preferred_element_type=acc.dtype), None

    acc0 = jnp.zeros((n_out, cout), dtype=jnp.promote_types(x.dtype, jnp.float32))
    out, _ = jax.lax.scan(
        step, acc0, (coarse.down_nbr_idx, coarse.down_nbr_valid, w)
    )
    if bias is not None:
        out = out + bias
    out = out * coarse.valid[:, None].astype(out.dtype)
    return out.astype(x.dtype)


def sparse_conv1_down2(x: jnp.ndarray, w: jnp.ndarray, coarse: LevelGraph,
                       bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """kernel_size=1, stride-2 conv (MinkUNet downsample shortcut): the coarse
    voxel takes the fine voxel at exactly 2*coord (kernel-2 offset 0)."""
    g = _masked_gather(x, coarse.child_idx[0], coarse.child_valid[0])
    out = jnp.dot(g, w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    out = out * coarse.valid[:, None].astype(out.dtype)
    return out.astype(x.dtype)


def avg_pool2(x: jnp.ndarray, coarse: LevelGraph) -> jnp.ndarray:
    """MinkowskiAvgPooling(kernel_size=2, stride=2): mean over valid children."""
    g = _masked_gather(x, coarse.child_idx, coarse.child_valid)  # (8, Nc, C)
    s = g.sum(axis=0)
    cnt = coarse.child_valid.sum(axis=0).astype(x.dtype)
    out = s / jnp.maximum(cnt, 1.0)[:, None]
    return out * coarse.valid[:, None].astype(x.dtype)


def sum_pool2(x: jnp.ndarray, coarse: LevelGraph) -> jnp.ndarray:
    """Minkowski sum_pool(kernel_size=2, stride=2) (reference ResNet stem,
    models/resnet.py:49-51)."""
    g = _masked_gather(x, coarse.child_idx, coarse.child_valid)
    out = g.sum(axis=0)
    return out * coarse.valid[:, None].astype(x.dtype)


def max_pool2(x: jnp.ndarray, coarse: LevelGraph) -> jnp.ndarray:
    """MinkowskiMaxPooling(kernel_size=2, stride=2) over valid children."""
    g = jnp.take(x, coarse.child_idx, axis=0)  # (8, Nc, C)
    neg = jnp.finfo(x.dtype).min
    g = jnp.where(coarse.child_valid[..., None], g, neg)
    out = g.max(axis=0)
    out = jnp.where(coarse.child_valid.any(axis=0)[:, None], out, 0.0)
    return out * coarse.valid[:, None].astype(x.dtype)


def unpool_nearest(x_coarse: jnp.ndarray, fine: LevelGraph) -> jnp.ndarray:
    """Broadcast coarse features to fine voxels (parent gather)."""
    out = jnp.take(x_coarse, fine.parent_idx, axis=0)
    return out * fine.valid[:, None].astype(x_coarse.dtype)
