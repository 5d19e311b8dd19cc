"""MinkowskiEngine (torch) -> flax parameter conversion for Res16UNet.

Lets the TPU build load the reference ecosystem's pretrained weights (e.g.
the CSC backbone CSC_train_Res16UNet34C_2cm.pth that pseudo-mask generation
depends on, pseudo_masks/unscene3d_pseudo_main.py:63-68).

Layouts:
  * ME MinkowskiConvolution kernel: (kernel_volume, C_in, C_out); ours is the
    same shape but our offsets enumerate z fastest while ME's kernel region
    enumerates the FIRST spatial axis fastest -- `me_offset_permutation`
    computes the reorder. Set offset_order='z_fastest' if a checkpoint was
    saved with the opposite convention.
  * BatchNorm: torch (weight, bias, running_mean, running_var) ->
    (scale, bias, batch_stats.mean, batch_stats.var).

Name mapping follows the reference module tree (models/res16unet.py):
conv0p1s1/bn0, conv{k}p*s2/bn{k}, block{k}.{i}.{conv1,norm1,conv2,norm2,
downsample.0/1}, convtr{k}p*s2/bntr{k}, final.
"""

from __future__ import annotations

import itertools

import numpy as np


def me_offset_permutation(kernel_size: int, offset_order: str = "x_fastest") -> np.ndarray:
    """perm[j] = index into the ME kernel axis for our offset j."""
    ours = list(itertools.product(*([range(kernel_size)] * 3)))  # z fastest
    if offset_order == "x_fastest":
        theirs = [tuple(reversed(t)) for t in itertools.product(*([range(kernel_size)] * 3))]
    elif offset_order == "z_fastest":
        theirs = ours
    else:
        raise ValueError(offset_order)
    lookup = {t: i for i, t in enumerate(theirs)}
    return np.asarray([lookup[o] for o in ours], np.int64)


def _conv(sd, name, ksize, offset_order):
    w = np.asarray(sd[f"{name}.kernel"])
    if w.ndim == 3:
        w = w[me_offset_permutation(ksize, offset_order)]
    out = {"kernel": w.astype(np.float32)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"]).reshape(-1).astype(np.float32)
    return out


def _bn(sd, name):
    return (
        {"scale": np.asarray(sd[f"{name}.bn.weight"] if f"{name}.bn.weight" in sd
                             else sd[f"{name}.weight"]).astype(np.float32),
         "bias": np.asarray(sd[f"{name}.bn.bias"] if f"{name}.bn.bias" in sd
                            else sd[f"{name}.bias"]).astype(np.float32)},
        {"mean": np.asarray(sd[f"{name}.bn.running_mean"] if f"{name}.bn.running_mean" in sd
                            else sd[f"{name}.running_mean"]).astype(np.float32),
         "var": np.asarray(sd[f"{name}.bn.running_var"] if f"{name}.bn.running_var" in sd
                           else sd[f"{name}.running_var"]).astype(np.float32)},
    )


def convert_res16unet(state_dict: dict, layers=(2, 3, 4, 6, 2, 2, 2, 2),
                      offset_order: str = "x_fastest") -> dict:
    """Returns {'params': ..., 'batch_stats': ...} for Res16UNetBase."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in state_dict.items()}
    # strip common prefixes
    for prefix in ("model.", "module.", "backbone."):
        if all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
    params, stats = {}, {}

    def put_conv_bn(flax_name, conv_name, bn_name, ksize):
        params[f"{flax_name}_conv"] = _conv(sd, conv_name, ksize, offset_order)
        p, s = _bn(sd, bn_name)
        params[f"{flax_name}_bn"] = p
        stats[f"{flax_name}_bn"] = s

    put_conv_bn("conv0p1s1", "conv0p1s1", "bn0", 3)
    for k in range(1, 5):
        put_conv_bn(f"conv{k}p{2**(k-1)}s2", f"conv{k}p{2**(k-1)}s2", f"bn{k}", 2)
    for k, stride in zip(range(4, 8), (16, 8, 4, 2)):
        put_conv_bn(f"convtr{k}p{stride}s2", f"convtr{k}p{stride}s2", f"bntr{k}", 2)

    def put_block(flax_name, torch_name):
        blk_p, blk_s = {}, {}
        blk_p["conv1"] = _conv(sd, f"{torch_name}.conv1", 3, offset_order)
        blk_p["conv2"] = _conv(sd, f"{torch_name}.conv2", 3, offset_order)
        p, s = _bn(sd, f"{torch_name}.norm1")
        blk_p["norm1"], blk_s["norm1"] = p, s
        p, s = _bn(sd, f"{torch_name}.norm2")
        blk_p["norm2"], blk_s["norm2"] = p, s
        if f"{torch_name}.downsample.0.kernel" in sd:
            blk_p["downsample_conv"] = _conv(sd, f"{torch_name}.downsample.0", 1,
                                             offset_order)
            p, s = _bn(sd, f"{torch_name}.downsample.1")
            blk_p["downsample_norm"], blk_s["downsample_norm"] = p, s
        params[flax_name] = blk_p
        stats[flax_name] = blk_s

    for bi, n in enumerate(layers, start=1):
        for i in range(n):
            put_block(f"block{bi}_{i}", f"block{bi}.{i}")

    if "final.kernel" in sd:
        w = np.asarray(sd["final.kernel"]).astype(np.float32)
        params["final"] = {"kernel": w.reshape(w.shape[-2], w.shape[-1])
                           if w.ndim == 3 else w}
        if "final.bias" in sd:
            params["final"]["bias"] = np.asarray(sd["final.bias"]).reshape(-1).astype(np.float32)

    return {"params": params, "batch_stats": stats}


def load_csc_backbone(path: str, **kwargs) -> dict:
    """Load a torch CSC checkpoint and convert (tolerates 'state_dict' wrap)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_res16unet(sd, **kwargs)
