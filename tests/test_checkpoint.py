import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unscene3d_tpu.train.checkpoint import (
    latest_step,
    load_with_same_shape,
    restore_checkpoint,
    restore_partial,
    save_checkpoint,
)
from unscene3d_tpu.train.loop import TrainState


def small_state(head=4, seed=0):
    r = np.random.RandomState(seed)
    params = {
        "backbone": {"w": jnp.array(r.randn(8, 8), jnp.float32)},
        "head": {"w": jnp.array(r.randn(8, head), jnp.float32)},
    }
    return TrainState(
        step=jnp.asarray(3, jnp.int32),
        params=params,
        batch_stats={"bn": {"mean": jnp.zeros(8)}},
        buffers={"pe": {"gauss_B": jnp.array(r.randn(3, 4), jnp.float32)}},
        opt_state={"count": jnp.zeros(())},
    )


def test_save_restore_roundtrip(tmp_path):
    state = small_state()
    save_checkpoint(str(tmp_path / "ck"), state)
    assert latest_step(str(tmp_path / "ck")) == 3
    template = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(str(tmp_path / "ck"), template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_shape_tolerant_restore(tmp_path):
    state = small_state(head=4)
    save_checkpoint(str(tmp_path / "ck"), state)
    # model with a different head shape (e.g. changed num classes)
    template = small_state(head=7, seed=1)
    restored = restore_partial(str(tmp_path / "ck"), template, verbose=False)
    # backbone taken from checkpoint
    np.testing.assert_allclose(
        np.asarray(restored.params["backbone"]["w"]),
        np.asarray(state.params["backbone"]["w"]),
    )
    # mismatched head keeps template init
    np.testing.assert_allclose(
        np.asarray(restored.params["head"]["w"]),
        np.asarray(template.params["head"]["w"]),
    )
    # optimizer state/step stay fresh
    assert int(restored.step) == int(template.step)


def test_load_with_same_shape_missing_keys():
    tmpl = {"a": np.zeros((2, 2)), "b": np.zeros(3)}
    loaded = {"a": np.ones((2, 2)), "c": np.ones(9)}
    out = load_with_same_shape(tmpl, loaded)
    np.testing.assert_allclose(out["a"], 1.0)
    np.testing.assert_allclose(out["b"], 0.0)
