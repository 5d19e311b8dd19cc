"""Worker for scripts/multihost_smoke.sh: one of N `jax.distributed`
processes running a data-parallel train step over the GLOBAL mesh.

Exercises the full multi-host wiring of parallel/distributed.py -- runtime
formation, per-host shard slicing, `make_array_from_process_local_data`
batch assembly, and shard_map + lax.pmean gradient collectives crossing the
process boundary -- the role the Lightning DDP launcher plays in the
reference (main_instance_segmentation.py:86-93). The model is a small MLP so
the smoke runs in seconds on one CPU core; the production train step
(train/loop.py) uses the identical mesh/collective/feed mechanics.
"""

import faulthandler
import sys
from pathlib import Path

faulthandler.enable()
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

from unscene3d_tpu.parallel.distributed import (  # noqa: E402
    global_batch_from_local,
    initialize_from_env,
    local_slice,
)


def main():
    assert initialize_from_env(), "set UNSCENE3D_* env vars (see smoke script)"
    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import PartitionSpec as P

    from unscene3d_tpu.parallel.mesh import make_mesh

    n_global = jax.device_count()
    pi = jax.process_index()
    print(f"[proc {pi}] processes={jax.process_count()} "
          f"global_devices={n_global} local={jax.local_device_count()}")
    assert jax.process_count() > 1

    mesh = make_mesh()

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Dense(32)(x))
            return nn.Dense(1)(x)

    model = MLP()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    # every process draws the same deterministic global per-device shards,
    # then feeds only its local slice (the Experiment._train_batch_from path)
    rng = np.random.RandomState(0)
    all_shards = [dict(x=rng.randn(16, 8).astype(np.float32),
                       y=rng.randn(16, 1).astype(np.float32))
                  for _ in range(n_global)]
    local = jax.tree.map(lambda *xs: np.stack(xs), *local_slice(all_shards))
    batch = global_batch_from_local(local, mesh)

    def loss_fn(params, batch):
        pred = model.apply(params, batch["x"])
        return jnp.mean((pred - batch["y"]) ** 2)

    def step(params, opt_state, batches):
        batch = jax.tree.map(lambda x: x[0], batches)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        grads = jax.lax.pmean(grads, "data")      # crosses processes
        loss = jax.lax.pmean(loss, "data")
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.jit(jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ))
    params2, opt_state, loss = sharded(params, opt_state, batch)
    total = float(np.asarray(jax.device_get(loss)))
    print(f"[proc {pi}] DP step OK: global loss={total:.4f}")
    assert np.isfinite(total)
    # parameters must have moved
    d = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), params, params2))
    assert max(d) > 0


if __name__ == "__main__":
    main()
