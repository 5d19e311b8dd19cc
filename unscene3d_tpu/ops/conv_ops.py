"""Device-side sparse convolution primitives (pure XLA, jit-static shapes).

These replace MinkowskiEngine's CUDA sparse convs (reference:
models/modules/common.py:125-185) with an output-centric gather + GEMM
formulation: for every output voxel we gather the input feature at each kernel
offset (host-precomputed `LevelGraph` maps) and accumulate K matmuls on the
MXU. There are no scatters anywhere -- invalid neighbors gather the last
(padding) row, whose features are kept zero, so results are bitwise
deterministic (unlike the reference's atomicAdd kernels).

Backwards are CUSTOM VJPs expressed as gather-convs too: XLA's default
transpose of a gather is a scatter-add, and at scene scale (6M+ scattered
rows per conv) the TPU compiler falls over -- besides being slow. The k3
offset set is symmetric (offset[26-k] == -offset[k]), so
  d x = conv3(d y, flip-transposed W)         (another gather-conv)
  d W[k] = gather_k(x)^T @ d y                (a GEMM)
and stride-2 / transposed convs swap their child/parent tables. The whole
train step is therefore scatter-free on the conv path.

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


def _scan_gather_gemm(x, w, idx, valid, n_out, bias, out_valid):
    """out[i] = sum_k (x[idx[k, i]] * valid[k, i]) @ w[k], masked to out_valid."""
    cout = w.shape[-1]
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)

    def step(acc, inp):
        idx_k, valid_k, wk = inp
        g = _masked_gather(x, idx_k, valid_k)
        return acc + jnp.dot(g, wk, preferred_element_type=acc_dtype), None

    acc0 = jnp.zeros((n_out, cout), dtype=acc_dtype)
    out, _ = jax.lax.scan(step, acc0, (idx, valid, w))
    if bias is not None:
        out = out + bias
    out = out * out_valid[:, None].astype(out.dtype)
    return out.astype(x.dtype)


def _scan_weight_grad(x, gm, idx, valid):
    """dW[k] = gather_k(x)^T @ gm, accumulated in f32. Returns (K, Cin, Cout)."""

    def step(_, inp):
        idx_k, valid_k = inp
        g = _masked_gather(x, idx_k, valid_k)
        return None, jnp.einsum("nc,nd->cd", g.astype(jnp.float32),
                                gm.astype(jnp.float32))

    _, dws = jax.lax.scan(step, None, (idx, valid))
    return dws


def _flip_transpose(w: jnp.ndarray) -> jnp.ndarray:
    """W'[k] = W[26-k]^T -- valid because KERNEL3_OFFSETS[26-k] == -OFFSETS[k]."""
    return jnp.flip(w, axis=0).swapaxes(-1, -2)


# ------------------------------------------------------------- fused conv3
def _fused_gather_gemm(x, w, idx, n_out, bias, out_valid):
    """Big-K formulation: ONE (N, 27, C) gather + ONE (N, 27C)@(27C, Cout)
    GEMM. The scan formulation's 27 separate K=C GEMMs run the MXU at a few
    percent utilization (trace: ~93ms of GEMM in a 215ms backbone); a single
    K=27C GEMM amortizes the systolic pipeline. Relies on the repo invariant
    that padding rows of x are zero (invalid neighbors index the last row),
    so no per-pair masking is needed."""
    n27, cin = idx.shape[0], x.shape[1]
    g = jnp.take(x, idx.T, axis=0)                    # (N, 27, C)
    out = jax.lax.dot_general(
        g.reshape(n_out, n27 * cin), w.reshape(n27 * cin, -1),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return (out * out_valid[:, None].astype(out.dtype)).astype(x.dtype)


@jax.custom_vjp
def _conv3_fused(x, w, bias, level):
    return _fused_gather_gemm(x, w, level.nbr_idx, level.num_padded,
                              bias, level.valid)


def _conv3_fused_fwd(x, w, bias, level):
    return _conv3_fused(x, w, bias, level), (x, w, bias, level)


def _conv3_fused_bwd(res, g):
    x, w, bias, level = res
    gm = (g * level.valid[:, None].astype(g.dtype)).astype(x.dtype)
    dx = _fused_gather_gemm(gm, _flip_transpose(w).astype(w.dtype),
                            level.nbr_idx, level.num_padded, None, level.valid)
    gather = jnp.take(x, level.nbr_idx.T, axis=0)     # (N, 27, C)
    dw = jnp.einsum("nkc,nd->kcd", gather.astype(jnp.float32),
                    gm.astype(jnp.float32))
    dbias = gm.astype(jnp.float32).sum(0).astype(bias.dtype) if bias is not None else None
    return dx.astype(x.dtype), dw.astype(w.dtype), dbias, None


_conv3_fused.defvjp(_conv3_fused_fwd, _conv3_fused_bwd)


# --------------------------------------------------------------------- conv3
@jax.custom_vjp
def _conv3(x, w, bias, level):
    return _scan_gather_gemm(x, w, level.nbr_idx, level.nbr_valid,
                             level.num_padded, bias, level.valid)


def _conv3_fwd(x, w, bias, level):
    return _conv3(x, w, bias, level), (x, w, bias, level)


def _conv3_bwd(res, g):
    x, w, bias, level = res
    gm = (g * level.valid[:, None].astype(g.dtype)).astype(x.dtype)
    dx = _scan_gather_gemm(gm, _flip_transpose(w).astype(w.dtype),
                           level.nbr_idx, level.nbr_valid,
                           level.num_padded, None, level.valid)
    dw = _scan_weight_grad(x, gm, level.nbr_idx, level.nbr_valid)
    dbias = gm.astype(jnp.float32).sum(0).astype(bias.dtype) if bias is not None else None
    return dx.astype(x.dtype), dw.astype(w.dtype), dbias, None


_conv3.defvjp(_conv3_fwd, _conv3_bwd)


_DEFAULT_K3_IMPL = ["scan"]


def set_default_k3_impl(impl: str):
    """Select the k3 formulation for levels without a CSR/brick graph:
    'scan' | 'unroll' | 'fused'."""
    _DEFAULT_K3_IMPL[0] = impl


def sparse_conv3(x: jnp.ndarray, w: jnp.ndarray, level: LevelGraph,
                 bias: jnp.ndarray | None = None,
                 impl: str | None = None) -> jnp.ndarray:
    """kernel_size=3, stride=1 sparse conv at one level.

    x: (N, Cin), w: (27, Cin, Cout). Output (N, Cout) on the same coords.
    impl: 'scan' (custom scatter-free VJP), 'unroll' (autodiff, per-offset
    parallelism), 'fused' (one big-K gather+GEMM, scatter-free VJP), or the
    dense-brick / CSR paths when the level carries those graphs. None uses
    the module default (set_default_k3_impl).
    """
    if impl is None:
        impl = _DEFAULT_K3_IMPL[0]
    if level.brick is not None:
        from unscene3d_tpu.ops.bricks import brick_conv3

        return brick_conv3(x, w, level.brick, level, bias)

    from unscene3d_tpu.ops import csr_conv as _csr

    # NOTE: routing narrow-cin convs to the gather path was A/B'd and LOSES
    # (bench 134ms vs 90ms): row gathers are ROW-bound (~0.3 Grows/s), so 27
    # x N rows cost the same regardless of row width, while the window
    # kernel's select cost is bounded by the 128-lane padding
    if level.win is not None:
        from unscene3d_tpu.ops.window_conv import window_conv3

        out = window_conv3(x, w.astype(x.dtype), level.win, level.valid)
        if bias is not None:
            out = (out + bias) * level.valid[:, None].astype(out.dtype)
        return out.astype(x.dtype)

    if level.csr is not None and not _csr.fallback_active():
        out = _csr.csr_conv3(x, w.astype(x.dtype), level.csr, level.valid)
        if bias is not None:
            out = (out + bias) * level.valid[:, None].astype(out.dtype)
        return out.astype(x.dtype)

    if impl == "unroll":
        acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
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
        if bias is not None:
            out = out + bias
        return (out * level.valid[:, None].astype(out.dtype)).astype(x.dtype)

    if impl == "fused":
        return _conv3_fused(x, w, bias, level)

    return _conv3(x, w, bias, level)


def sparse_conv1(x: jnp.ndarray, w: jnp.ndarray, level: LevelGraph,
                 bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """kernel_size=1 conv: a plain per-voxel matmul."""
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    out = out * level.valid[:, None].astype(out.dtype)
    return out.astype(x.dtype)


# ------------------------------------------------------------- k2 s2 down/up
def _up_select(z_flat, fine, cout):
    """Gather each fine voxel's (parent, kernel-offset) row of a coarse
    (N_coarse*8, Cout) matrix."""
    flat_idx = fine.parent_idx * 8 + fine.parent_offset
    return jnp.take(z_flat.reshape(-1, cout), flat_idx, axis=0)


def _down2_primal(x, w, bias, coarse):
    if coarse.win_down is not None:
        from unscene3d_tpu.ops.window_gather import window_k_apply

        out = window_k_apply(x, w.astype(x.dtype), coarse.win_down,
                             coarse.valid, coarse.num_padded)
        if bias is not None:
            out = ((out.astype(jnp.float32) + bias)
                   * coarse.valid[:, None].astype(jnp.float32)).astype(x.dtype)
        return out
    return _scan_gather_gemm(x, w, coarse.child_idx, coarse.child_valid,
                             coarse.num_padded, bias, coarse.valid)


@jax.custom_vjp
def _conv_down2(x, w, bias, coarse, fine):
    return _down2_primal(x, w, bias, coarse)


def _conv_down2_fwd(x, w, bias, coarse, fine):
    return _conv_down2(x, w, bias, coarse, fine), (x, w, bias, coarse, fine)


def _conv_down2_bwd(res, g):
    x, w, bias, coarse, fine = res
    gm = (g * coarse.valid[:, None].astype(g.dtype)).astype(x.dtype)
    # dx[i] = gm[parent(i)] @ W[off(i)]^T : exactly an up2 conv with W^T,
    # so _up2_primal's window path (fine.win_up) replaces the fine-level
    # row gather where tables exist
    dx = _up2_primal(gm, w.swapaxes(-1, -2).astype(w.dtype), None, fine)
    # dW[k] = sum_{i: off(i)=k} x[i]^T gm[parent(i)] -- each fine voxel is its
    # parent's unique offset-k child, so ONE parent gather + 8 masked GEMMs
    # replaces 8 child gathers of the (larger) fine features (gathers are
    # row-bound; measured 30ms -> ~4ms at the stride-2 stem level)
    g_par = jnp.take(gm, fine.parent_idx, axis=0)
    g_par = (g_par * fine.valid[:, None].astype(gm.dtype)).astype(jnp.float32)

    def step(_, k):
        sel = (fine.parent_offset == k) & fine.valid
        xs = x.astype(jnp.float32) * sel[:, None].astype(jnp.float32)
        return None, jnp.einsum("nc,nd->cd", xs, g_par)

    _, dw = jax.lax.scan(step, None, jnp.arange(8))
    dbias = gm.astype(jnp.float32).sum(0).astype(bias.dtype) if bias is not None else None
    return dx.astype(x.dtype), dw.astype(w.dtype), dbias, None, None


_conv_down2.defvjp(_conv_down2_fwd, _conv_down2_bwd)


def sparse_conv_down2(x: jnp.ndarray, w: jnp.ndarray, coarse: LevelGraph,
                      bias: jnp.ndarray | None = None,
                      fine: LevelGraph | None = None) -> jnp.ndarray:
    """kernel_size=2, stride=2 sparse conv: fine level -> coarse level.

    x: (N_fine, Cin), w: (8, Cin, Cout). Output (N_coarse, Cout). Pass the
    fine LevelGraph to enable the scatter-free custom VJP (required for
    large-scene training)."""
    if fine is None:
        return _down2_primal(x, w, bias, coarse)
    return _conv_down2(x, w, bias, coarse, fine)


def _up2_primal(x, w, bias, fine):
    if fine.win_up is not None:
        from unscene3d_tpu.ops.window_gather import window_k_apply

        out = window_k_apply(x, w.astype(x.dtype), fine.win_up,
                             fine.valid, fine.num_padded)
        if bias is not None:
            out = ((out.astype(jnp.float32) + bias)
                   * fine.valid[:, None].astype(jnp.float32)).astype(x.dtype)
        return out
    n_c, cin = x.shape
    cout = w.shape[-1]
    z = jnp.dot(x, w.transpose(1, 0, 2).reshape(cin, 8 * cout),
                preferred_element_type=jnp.float32)
    out = _up_select(z, fine, cout)
    if bias is not None:
        out = out + bias
    out = out * fine.valid[:, None].astype(out.dtype)
    return out.astype(x.dtype)


@jax.custom_vjp
def _conv_up2(x, w, bias, fine, coarse):
    return _up2_primal(x, w, bias, fine)


def _conv_up2_fwd(x, w, bias, fine, coarse):
    return _conv_up2(x, w, bias, fine, coarse), (x, w, bias, fine, coarse)


def _conv_up2_bwd(res, g):
    x, w, bias, fine, coarse = res
    gm = (g * fine.valid[:, None].astype(g.dtype)).astype(x.dtype)
    # dx[j] = sum_k gm[child_k(j)] @ W[k]^T : a k2s2 down-conv with W^T --
    # route through _down2_primal so levels with window tables take the
    # Pallas path (the 8-offset gather scan was ~50ms at the finest level)
    dx = _down2_primal(gm, w.swapaxes(-1, -2).astype(w.dtype), None, coarse)
    # dW[k] = sum_{i: off(i)=k} x[parent(i)]^T gm[i]
    x_par = jnp.take(x, fine.parent_idx, axis=0)
    x_par = x_par * fine.valid[:, None].astype(x.dtype)

    def step(_, k):
        sel = (fine.parent_offset == k) & fine.valid
        xs = x_par * sel[:, None].astype(x.dtype)
        return None, jnp.einsum("nc,nd->cd", xs.astype(jnp.float32),
                                gm.astype(jnp.float32))

    _, dw = jax.lax.scan(step, None, jnp.arange(8))
    dbias = gm.astype(jnp.float32).sum(0).astype(bias.dtype) if bias is not None else None
    return dx.astype(x.dtype), dw.astype(w.dtype), dbias, None, None


_conv_up2.defvjp(_conv_up2_fwd, _conv_up2_bwd)


def sparse_conv_up2(x: jnp.ndarray, w: jnp.ndarray, fine: LevelGraph,
                    bias: jnp.ndarray | None = None,
                    coarse: LevelGraph | None = None) -> jnp.ndarray:
    """kernel_size=2, upsample_stride=2 transposed conv: coarse -> fine level.

    x: (N_coarse, Cin), w: (8, Cin, Cout). Output lands on the fine level's
    existing coords (MinkowskiEngine conv_tr reuses the downsampling path's
    coordinate map, which the reference's skip-concats require,
    models/res16unet.py:259-290). Pass the coarse LevelGraph for the
    scatter-free custom VJP."""
    if coarse is None:
        return _up2_primal(x, w, bias, fine)
    return _conv_up2(x, w, bias, fine, coarse)


def sparse_conv3_down2(x: jnp.ndarray, w: jnp.ndarray, coarse: LevelGraph,
                       bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """kernel_size=3, STRIDE-2 conv (MinkUNet/ResNet stage convs): fine ->
    coarse level via the coarse level's down_nbr map. x: (N_fine, Cin),
    w: (27, Cin, Cout)."""
    return _scan_gather_gemm(x, w, coarse.down_nbr_idx, coarse.down_nbr_valid,
                             coarse.num_padded, bias, coarse.valid)


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


def _avg_pool2_primal(x, coarse):
    cnt = coarse.child_valid.sum(axis=0).astype(x.dtype)
    if coarse.win_down is not None:
        from unscene3d_tpu.ops.window_gather import window_k_apply

        s = window_k_apply(x, None, coarse.win_down, coarse.valid,
                           coarse.num_padded)
    else:
        g = _masked_gather(x, coarse.child_idx, coarse.child_valid)  # (8, Nc, C)
        s = g.sum(axis=0)
    out = s / jnp.maximum(cnt, 1.0)[:, None]
    return (out * coarse.valid[:, None].astype(x.dtype)).astype(x.dtype)


@jax.custom_vjp
def _avg_pool2(x, coarse, fine):
    return _avg_pool2_primal(x, coarse)


def _avg_pool2_fwd(x, coarse, fine):
    return _avg_pool2(x, coarse, fine), (jnp.zeros((), x.dtype), coarse, fine)


def _avg_pool2_bwd(res, g):
    proto, coarse, fine = res
    dtype = proto.dtype
    # d mean-pool / dx[i] = g[parent(i)] / cnt[parent(i)]: a parent GATHER
    # (scatter-free, and the windowed forward's Pallas kernel needs a
    # custom VJP to be differentiable at all)
    cnt = coarse.child_valid.sum(axis=0).astype(jnp.float32)
    gm = (g.astype(jnp.float32) * coarse.valid[:, None].astype(jnp.float32)
          / jnp.maximum(cnt, 1.0)[:, None])
    dx = jnp.take(gm, fine.parent_idx, axis=0)
    dx = dx * fine.valid[:, None].astype(jnp.float32)
    return dx.astype(dtype), None, None


_avg_pool2.defvjp(_avg_pool2_fwd, _avg_pool2_bwd)


def avg_pool2(x: jnp.ndarray, coarse: LevelGraph,
              fine: LevelGraph | None = None) -> jnp.ndarray:
    """MinkowskiAvgPooling(kernel_size=2, stride=2): mean over valid children.
    Pass the fine LevelGraph to enable the scatter-free custom VJP (required
    to differentiate the windowed-select pooling path)."""
    if fine is None:
        return _avg_pool2_primal(x, coarse)
    return _avg_pool2(x, coarse, fine)


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
