"""Explicit train loop: optax AdamW + OneCycle, shard_map data parallelism.

Replaces the reference's pytorch-lightning Trainer + DDP
(main_instance_segmentation.py:86-93, trainer/trainer.py:99-163,953-966):
  * AdamW lr 1e-4 (5e-5 on self-train rounds) + OneCycleLR stepped per
    iteration (conf/optimizer/adamw*.yaml, conf/scheduler/onecyclelr.yaml)
  * gradient averaging / num_masks normalization over the 'data' mesh axis
    via lax.pmean (reference: NCCL all_reduce, models/criterion.py:258-260)
  * batch-norm running stats pmean-synced across shards (an improvement:
    torch DDP keeps per-rank stats)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from unscene3d_tpu.data.batch import SceneBatch
from unscene3d_tpu.losses.criterion import SetCriterion


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    buffers: Any
    opt_state: Any


def make_optimizer(
    lr: float = 1e-4,
    total_steps: int = 10000,
    schedule: str = "onecycle",
    weight_decay: float = 1e-2,
    gamma: float = 0.99999,
) -> optax.GradientTransformation:
    """AdamW + the reference's scheduler menu: 'onecycle'
    (conf/scheduler/onecyclelr.yaml, torch defaults: cos anneal, pct_start
    .3, div_factor 25, final_div 1e4), 'exponential'
    (conf/scheduler/exponentiallr.yaml, per-step gamma decay) or 'constant'
    (conf/scheduler/lambdalr.yaml's unreachable StepLR)."""
    if schedule == "onecycle":
        # optax's onecycle emits NaN learning rates when a phase boundary
        # rounds to a zero-width interval (e.g. total_steps=2 in smoke runs)
        sched = optax.cosine_onecycle_schedule(
            transition_steps=max(total_steps, 10),
            peak_value=lr,
            pct_start=0.3,
            div_factor=25.0,
            final_div_factor=1e4,
        )
    elif schedule == "exponential":
        sched = optax.exponential_decay(
            init_value=lr, transition_steps=1, decay_rate=gamma)
    elif schedule == "constant":
        sched = lr
    else:
        raise ValueError(schedule)
    return optax.adamw(sched, weight_decay=weight_decay)


class Trainer:
    """Owns the jitted/shard_mapped train and eval steps."""

    def __init__(
        self,
        model,
        criterion: SetCriterion,
        optimizer: optax.GradientTransformation,
        mesh: Mesh | None = None,
    ):
        self.model = model
        self.criterion = criterion
        self.tx = optimizer
        self.mesh = mesh
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------ init
    def init_state(self, example_batch: SceneBatch, seed: int = 0,
                   jit_init: bool = False) -> TrainState:
        from unscene3d_tpu.utils.runtime import init_on_cpu

        rngs = {"params": jax.random.PRNGKey(seed), "sample": jax.random.PRNGKey(seed + 1)}
        init_fn = self.model.init
        if jit_init:
            # compile (and persistently cache) the init instead of eager
            # op-by-op dispatch -- the dominant cost of the multichip dryrun
            init_fn = jax.jit(
                lambda rngs, batch: self.model.init(
                    rngs, batch, train=False, is_eval=True)
            )
            variables = init_on_cpu(init_fn, rngs, example_batch)
            variables = jax.tree.map(lambda x: x, variables)  # materialize
            params = variables["params"]
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=variables.get("batch_stats", {}),
                buffers=variables.get("buffers", {}),
                opt_state=self.tx.init(params),
            )
        variables = init_on_cpu(
            self.model.init, rngs, example_batch, train=False, is_eval=True
        )
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            buffers=variables.get("buffers", {}),
            opt_state=self.tx.init(params),
        )

    # ------------------------------------------------------------- train step
    def _loss_fn(self, params, batch_stats, buffers, batch: SceneBatch, rng):
        variables = {"params": params, "batch_stats": batch_stats, "buffers": buffers}
        outputs, mutated = self.model.apply(
            variables,
            batch,
            train=True,
            return_aux_vox=self.criterion.weight_noise_robust != 0.0,
            rngs={"sample": rng, "dropout": jax.random.fold_in(rng, 7)},
            mutable=["batch_stats"],
        )
        losses = self.criterion(outputs, batch, triplane=batch.triplane)
        return losses["total"], (losses, mutated["batch_stats"])

    def _step_core(self, state: TrainState, batch: SceneBatch, rng, axis: str | None):
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
        (_, (losses, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, state.buffers, batch, rng
        )
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            losses = jax.lax.pmean(losses, axis)
            new_bs = jax.lax.pmean(new_bs, axis)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, losses

    def build_train_step(self) -> Callable:
        """Single-device jit step (mesh=None) or shard_mapped DP step."""
        if self.mesh is None:
            if self._train_step is None:
                # donate the state: params + AdamW moments (~0.5GB at the
                # flagship width) update in place instead of live old+new
                # copies. Callers must reassign (state, _ = step(state, ...)).
                # The mesh path stays undonated: the multichip DP oracle
                # (__graft_entry__.dryrun_multichip) re-reads the old state.
                self._train_step = jax.jit(
                    lambda s, b, r: self._step_core(s, b, r, None),
                    donate_argnums=(0,),
                )
            return self._train_step

        if self._train_step is None:
            mesh = self.mesh

            def sharded(state, batches, rng):
                # batches: pytree with leading 'data'-sharded device axis
                batch = jax.tree.map(lambda x: x[0], batches)
                return self._step_core(state, batch, rng, "data")

            self._train_step = jax.jit(
                jax.shard_map(
                    sharded,
                    mesh=mesh,
                    in_specs=(P(), P("data"), P()),
                    out_specs=(P(), P()),
                    check_vma=False,
                )
            )
        return self._train_step

    def build_accum_train_step(self, accum_steps: int) -> Callable:
        """Gradient accumulation over `accum_steps` micro-batches (reference
        pseudo config accumulate_grad_batches): the step takes a pytree of
        micro-batches stacked on a leading axis and lax.scans the fwd+bwd,
        averaging gradients before one optimizer update. Lets a single chip
        train the reference's batch-8 schedule on large scenes."""

        def step(state: TrainState, batches, rng):
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)

            def micro(carry, inp):
                grads_acc, bs, rng = carry
                batch = inp
                rng, sub = jax.random.split(rng)
                (_, (losses, new_bs)), grads = grad_fn(
                    state.params, bs, state.buffers, batch, sub
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, new_bs, rng), losses

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_bs, _), losses = jax.lax.scan(
                micro, (zeros, state.batch_stats, rng), batches
            )
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_bs, opt_state=new_opt,
            )
            mean_losses = jax.tree.map(lambda x: x.mean(0), losses)
            return new_state, mean_losses

        return jax.jit(step, donate_argnums=(0,))

    # -------------------------------------------------------------- eval step
    def build_eval_step(self) -> Callable:
        if self._eval_step is None:

            def eval_step(state, batch):
                variables = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "buffers": state.buffers,
                }
                return self.model.apply(variables, batch, train=False, is_eval=True)

            self._eval_step = jax.jit(eval_step)
        return self._eval_step

    def build_eval_step_device_post(self) -> Callable:
        """Eval step with ON-DEVICE post-processing: binarized masks are
        bit-packed and per-query sigmoid mask scores reduced on device, so a
        200k-voxel scene transfers ~2.6MB instead of ~80MB of f32 logits
        (the dev tunnel at ~50MB/s made host post-processing the eval
        bottleneck; on pods it still cuts PCIe + host softmax/sigmoid work).
        Returns dict(probs (Q, C), mask_scores (Q,), packed (ceil(N/8), Q)
        uint8 MSB-first like np.packbits, n_vox_used)."""
        if getattr(self, "_eval_step_post", None) is None:

            def eval_step(state, batch):
                variables = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "buffers": state.buffers,
                }
                out = self.model.apply(variables, batch, train=False,
                                       is_eval=True)
                logits = out["pred_logits"][-1][0]             # (Q, C)
                vox = out["pred_masks_vox"][-1]                # (N_pad, Q)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                # exclude padding rows (the host path slices [:n_vox] first)
                vmask = batch.graph.levels[0].valid[:, None]
                binary = (vox > 0) & vmask
                heat = jax.nn.sigmoid(vox.astype(jnp.float32))
                pos = binary.sum(0).astype(jnp.float32)
                mask_scores = (heat * binary).sum(0) / (pos + 1e-6)
                n_pad = binary.shape[0]
                n8 = (n_pad + 7) // 8
                bits = jnp.zeros((n8 * 8, binary.shape[1]), jnp.uint8)
                bits = bits.at[:n_pad].set(binary.astype(jnp.uint8))
                weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
                packed = jnp.einsum(
                    "nkq,k->nq",
                    bits.reshape(n8, 8, -1).astype(jnp.uint32),
                    weights.astype(jnp.uint32)).astype(jnp.uint8)
                return {"probs": probs, "mask_scores": mask_scores,
                        "packed": packed}

            self._eval_step_post = jax.jit(eval_step)
        return self._eval_step_post
