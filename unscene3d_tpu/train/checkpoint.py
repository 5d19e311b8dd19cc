"""Orbax checkpointing with shape-tolerant restore.

Parity with the reference's checkpoint utilities (utils/utils.py:58-192 and
main_instance_segmentation.py:46-70):
  * save/restore full train state (params, batch stats, buffers, opt state)
  * `load_state_with_same_shape`-style partial restore: only parameters whose
    name exists and whose shape matches are taken from the checkpoint --
    needed because self-train rounds change class-head shapes and because CSC
    backbone weights load into a differently-shaped model
  * `resume` resolution: find the latest checkpoint in a directory.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from unscene3d_tpu.train.loop import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int | None = None):
    ckpt_dir = os.path.abspath(ckpt_dir)
    step = int(state.step) if step is None else int(step)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> int | None:
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, template: TrainState,
                       step: int | None = None) -> TrainState:
    """Exact restore into a state template (same tree/shapes)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        return mgr.restore(step, args=ocp.args.StandardRestore(jax.device_get(template)))


def load_with_same_shape(template_tree: Any, loaded_tree: Any,
                         verbose: bool = False) -> Any:
    """Merge loaded params into a template, keeping only leaves whose path
    exists in both AND whose shapes match (reference utils/utils.py:146-192).
    Returns a tree shaped exactly like template_tree."""
    t_flat = dict(jax.tree_util.tree_flatten_with_path(template_tree)[0])
    l_flat = dict(jax.tree_util.tree_flatten_with_path(loaded_tree)[0])
    out = {}
    matched = 0
    for path, t_leaf in t_flat.items():
        l_leaf = l_flat.get(path)
        if l_leaf is not None and np.shape(l_leaf) == np.shape(t_leaf):
            out[path] = l_leaf
            matched += 1
        else:
            out[path] = t_leaf
            if verbose and l_leaf is not None:
                print(f"shape mismatch at {path}: "
                      f"{np.shape(l_leaf)} vs {np.shape(t_leaf)}")
    if verbose:
        print(f"restored {matched}/{len(t_flat)} matching tensors")
    treedef = jax.tree_util.tree_structure(template_tree)
    keys = [p for p, _ in jax.tree_util.tree_flatten_with_path(template_tree)[0]]
    return jax.tree_util.tree_unflatten(treedef, [out[k] for k in keys])


def restore_partial(ckpt_dir: str, template: TrainState,
                    step: int | None = None, verbose: bool = True) -> TrainState:
    """Shape-tolerant restore of params/batch_stats/buffers; optimizer state
    and step are kept from the template (fresh), matching how the reference
    reloads backbones across differently-shaped models."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        loaded = mgr.restore(step, args=ocp.args.StandardRestore())
    # orbax returns a nested dict pytree
    def pick(name, tmpl):
        src = loaded.get(name, {}) if isinstance(loaded, dict) else getattr(loaded, name)
        try:
            return load_with_same_shape(tmpl, src, verbose=verbose)
        except Exception:
            return tmpl

    return template.replace(
        params=pick("params", template.params),
        batch_stats=pick("batch_stats", template.batch_stats),
        buffers=pick("buffers", template.buffers),
    )
