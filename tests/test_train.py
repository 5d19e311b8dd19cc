"""End-to-end train-step tests: single device + 8-device CPU mesh DP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unscene3d_tpu.data.collate import FreeMaskCollator
from unscene3d_tpu.data.synthetic import make_batch
from unscene3d_tpu.losses.criterion import SetCriterion
from unscene3d_tpu.losses.matcher import HungarianMatcher
from unscene3d_tpu.models.backbone import Res16UNet14A
from unscene3d_tpu.models.mask3d import Mask3D
from unscene3d_tpu.parallel.mesh import make_mesh, stack_shards
from unscene3d_tpu.train.loop import Trainer, make_optimizer


def tiny_model():
    return Mask3D(
        backbone=Res16UNet14A(out_channels=2),
        num_classes=3,
        hidden_dim=32,
        num_queries=10,
        num_heads=2,
        dim_feedforward=64,
        num_decoders=1,
        hlevels=(0, 1, 2, 3),
        sample_sizes=(32, 64, 128, 256, 512),
    )


def tiny_batch(seed=0, n_scenes=2):
    scenes = make_batch(n_scenes, num_points=1500, seed=seed)
    return FreeMaskCollator(voxel_size=0.12)(scenes)


def make_trainer(mesh=None, steps=50):
    model = tiny_model()
    criterion = SetCriterion(matcher=HungarianMatcher(), num_classes=3)
    tx = make_optimizer(lr=2e-3, total_steps=steps)
    return Trainer(model, criterion, tx, mesh=mesh)


def test_single_device_loss_decreases():
    batch, _ = tiny_batch()
    trainer = make_trainer(steps=60)
    state = trainer.init_state(batch)
    step = trainer.build_train_step()
    rng = jax.random.PRNGKey(0)
    loss0 = None
    for i in range(14):
        state, losses = step(state, batch, jax.random.fold_in(rng, i))
        if loss0 is None:
            loss0 = float(losses["total"])
    assert np.isfinite(float(losses["total"]))
    assert float(losses["total"]) < loss0 * 0.95, (loss0, float(losses["total"]))


def test_multichip_dp_step():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    # 8 single-scene shards collated with a unified pad plan
    collator = FreeMaskCollator(voxel_size=0.12)
    scene_lists = [make_batch(1, num_points=1500, seed=s) for s in range(8)]
    shards, _ = collator.collate_shards(scene_lists)
    shapes = [jax.tree.map(lambda x: x.shape, s) for s in shards]
    assert all(s == shapes[0] for s in shapes[1:]), "shards must share shapes"
    stacked = stack_shards(shards)

    trainer = make_trainer(mesh=mesh, steps=10)
    state = trainer.init_state(shards[0])
    step = trainer.build_train_step()
    rng = jax.random.PRNGKey(0)
    state1, losses = step(state, stacked, rng)
    state2, losses = step(state1, stacked, jax.random.fold_in(rng, 1))
    assert np.isfinite(float(losses["total"]))
    assert int(state2.step) == 2
    # params stay replicated and finite
    leaf = jax.tree.leaves(state2.params)[0]
    assert bool(jnp.isfinite(leaf).all())

    # DP-EQUIVALENCE ORACLE (VERDICT r4 next#4, finiteness alone cannot
    # detect a dropped pmean): the shard_mapped step must equal per-shard
    # grads -- with the step's own per-shard rng folding -- averaged on a
    # single device, then one optimizer update.
    import optax

    grad_fn = jax.jit(jax.value_and_grad(trainer._loss_fn, has_aux=True))
    mean_g, mean_bs, mean_losses = None, None, None
    for d, shard in enumerate(shards):
        (_, (ls, bs)), g = grad_fn(
            state.params, state.batch_stats, state.buffers, shard,
            jax.random.fold_in(rng, d))
        mean_g = g if mean_g is None else jax.tree.map(jnp.add, mean_g, g)
        mean_bs = bs if mean_bs is None else jax.tree.map(jnp.add, mean_bs, bs)
        mean_losses = (ls if mean_losses is None
                       else jax.tree.map(jnp.add, mean_losses, ls))
    mean_g = jax.tree.map(lambda x: x / 8, mean_g)
    mean_bs = jax.tree.map(lambda x: x / 8, mean_bs)
    mean_losses = jax.tree.map(lambda x: x / 8, mean_losses)
    updates, _ = trainer.tx.update(mean_g, state.opt_state, state.params)
    want = optax.apply_updates(state.params, updates)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    # losses and BN stats are pmean'd too
    np.testing.assert_allclose(float(mean_losses["total"]),
                               float(jax.device_get(
                                   step(state, stacked, rng)[1]["total"])),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(mean_bs),
                    jax.tree.leaves(state1.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_prefetcher_multiworker_order_and_equality():
    """Multi-worker prefetch must emit the same batches in the same order as
    single-worker (bitwise reproducibility), without deadlocking even when a
    low-index batch is much slower than its successors."""
    import time

    import numpy as np

    from unscene3d_tpu.train.experiment import Prefetcher

    def make(i):
        if i == 0:
            time.sleep(0.3)  # slow head batch: workers race far ahead
        return {"i": np.full((4,), i)}

    single = [b["i"].copy() for b in Prefetcher(make, 12, to_device=False,
                                                num_workers=1)]
    multi = [b["i"].copy() for b in Prefetcher(make, 12, to_device=False,
                                               num_workers=4)]
    assert len(multi) == 12
    for a, b in zip(single, multi):
        np.testing.assert_array_equal(a, b)


def test_epoch_ids_deterministic_draw():
    """Pre-drawn epoch ids traverse the dataset exactly once per epoch."""
    import numpy as np

    from unscene3d_tpu.train.experiment import _EpochSampler

    s = _EpochSampler(10, np.random.RandomState(0))
    ids = [i for _ in range(5) for i in s.next(2)]
    assert sorted(ids) == list(range(10))
    ids2 = [i for _ in range(5) for i in s.next(2)]
    assert sorted(ids2) == list(range(10))


def test_prefetcher_propagates_worker_failure():
    import pytest

    from unscene3d_tpu.train.experiment import Prefetcher

    def make(i):
        if i == 3:
            raise ValueError("boom")
        return {"i": i}

    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        list(Prefetcher(make, 8, to_device=False, num_workers=3))
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        list(Prefetcher(make, 8, to_device=False, num_workers=1))
