"""Gradient accumulation: averaged-micro-batch update runs and is finite; a
single accumulated step over identical micro-batches matches the plain step's
gradient direction."""

import numpy as np
import jax
import jax.numpy as jnp

from unscene3d_tpu.data.collate import FreeMaskCollator
from unscene3d_tpu.data.synthetic import make_batch
from unscene3d_tpu.losses.criterion import SetCriterion
from unscene3d_tpu.losses.matcher import HungarianMatcher
from unscene3d_tpu.models.backbone import Res16UNet14A
from unscene3d_tpu.models.mask3d import Mask3D
from unscene3d_tpu.parallel.mesh import stack_shards
from unscene3d_tpu.train.loop import Trainer, make_optimizer


def test_accumulated_step_matches_plain_on_same_batch():
    batch, _ = FreeMaskCollator(voxel_size=0.12)(make_batch(1, num_points=1500))
    model = Mask3D(
        backbone=Res16UNet14A(out_channels=2), num_classes=3, hidden_dim=32,
        num_queries=8, num_heads=2, dim_feedforward=64, num_decoders=1,
        sample_sizes=(16, 32, 64, 128, 256), max_sample_size=True,
    )
    trainer = Trainer(model, SetCriterion(matcher=HungarianMatcher(), num_classes=3),
                      make_optimizer(lr=1e-3, total_steps=10, schedule="constant"))
    state = trainer.init_state(batch)

    plain = trainer.build_train_step()
    accum = trainer.build_accum_train_step(accum_steps=2)

    rng = jax.random.PRNGKey(0)
    # two identical micro-batches: the averaged gradient equals the plain one
    # (max_sample_size=True makes the forward deterministic)
    stacked = stack_shards([batch, batch])
    # both steps DONATE their input state (train/loop.py); give each its own
    # copy so the second call doesn't read deleted buffers
    state2 = jax.tree.map(lambda x: jnp.array(x), state)
    s_plain, l_plain = plain(state, batch, rng)
    s_accum, l_accum = accum(state2, stacked, rng)
    np.testing.assert_allclose(float(l_accum["total"]), float(l_plain["total"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_accum.params), jax.tree.leaves(s_plain.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)
    assert int(s_accum.step) == 1
