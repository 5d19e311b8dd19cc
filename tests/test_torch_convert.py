"""ME->flax weight conversion: structure must match flax init exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unscene3d_tpu.data.collate import FreeMaskCollator
from unscene3d_tpu.data.synthetic import make_batch
from unscene3d_tpu.models.backbone import Res16UNet34C
from unscene3d_tpu.models.torch_convert import convert_res16unet, me_offset_permutation

LAYERS_34 = (2, 3, 4, 6, 2, 2, 2, 2)
PLANES_34C = (32, 64, 128, 256, 256, 128, 96, 96)


def fake_me_state_dict(in_ch=3, out_ch=20):
    """Random arrays under the reference's ME module names."""
    r = np.random.RandomState(0)
    sd = {}

    def conv(name, k, cin, cout, bias=False):
        vol = k ** 3
        scale = np.sqrt(2.0 / (vol * cin))  # keep the 30-layer forward finite
        sd[f"{name}.kernel"] = (r.randn(vol, cin, cout) * scale).astype(np.float32) \
            if k > 1 else (r.randn(cin, cout) * scale).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = (r.randn(cout) * 0.01).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.bn.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bn.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.bn.running_mean"] = r.randn(c).astype(np.float32) * 0.01
        sd[f"{name}.bn.running_var"] = np.ones(c, np.float32)

    init = 32
    conv("conv0p1s1", 3, in_ch, init); bn("bn0", init)
    inplanes = init
    p = PLANES_34C
    for k in range(1, 5):
        conv(f"conv{k}p{2**(k-1)}s2", 2, inplanes, init if k == 1 else inplanes, False)
        bn(f"bn{k}", inplanes)
        planes = p[k - 1]
        for i in range(LAYERS_34[k - 1]):
            cin = inplanes if i == 0 else planes
            conv(f"block{k}.{i}.conv1", 3, cin, planes)
            bn(f"block{k}.{i}.norm1", planes)
            conv(f"block{k}.{i}.conv2", 3, planes, planes)
            bn(f"block{k}.{i}.norm2", planes)
            if cin != planes:
                conv(f"block{k}.{i}.downsample.0", 1, cin, planes)
                bn(f"block{k}.{i}.downsample.1", planes)
        inplanes = planes
    skips = [p[2], p[1], p[0], init]
    for j, (k, stride) in enumerate(zip(range(4, 8), (16, 8, 4, 2))):
        planes = p[4 + j]
        conv(f"convtr{k}p{stride}s2", 2, inplanes, planes)
        bn(f"bntr{k}", planes)
        inplanes = planes + skips[j]
        for i in range(LAYERS_34[4 + j]):
            cin = inplanes if i == 0 else planes
            conv(f"block{k+1}.{i}.conv1", 3, cin, planes)
            bn(f"block{k+1}.{i}.norm1", planes)
            conv(f"block{k+1}.{i}.conv2", 3, planes, planes)
            bn(f"block{k+1}.{i}.norm2", planes)
            if cin != planes:
                conv(f"block{k+1}.{i}.downsample.0", 1, cin, planes)
                bn(f"block{k+1}.{i}.downsample.1", planes)
        inplanes = planes
    conv("final", 1, p[7], out_ch, bias=True)
    return sd


def test_offset_permutation_roundtrip():
    perm = me_offset_permutation(3, "x_fastest")
    assert sorted(perm.tolist()) == list(range(27))
    assert (me_offset_permutation(3, "z_fastest") == np.arange(27)).all()
    # center offset is fixed under axis reversal
    assert perm[13] == 13


def test_converted_tree_matches_flax_init():
    sd = fake_me_state_dict()
    converted = convert_res16unet(sd)

    batch, _ = FreeMaskCollator(voxel_size=0.12)(make_batch(1, num_points=1200))
    model = Res16UNet34C(out_channels=20)
    ref = model.init(jax.random.PRNGKey(0), batch.features, batch.graph)

    ref_shapes = jax.tree.map(lambda x: x.shape, ref["params"])
    conv_shapes = jax.tree.map(lambda x: x.shape, converted["params"])
    assert ref_shapes == conv_shapes, "param tree mismatch"
    bs_ref = jax.tree.map(lambda x: x.shape, ref["batch_stats"])
    bs_conv = jax.tree.map(lambda x: x.shape, converted["batch_stats"])
    assert bs_ref == bs_conv, "batch_stats tree mismatch"

    # forward runs with converted weights
    out, fpn, final = model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        batch.features, batch.graph, train=False,
    )
    assert bool(jnp.isfinite(out).all())
