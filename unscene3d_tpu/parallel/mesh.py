"""Device mesh + data-parallel sharding helpers.

The reference's entire distributed story is pytorch-lightning DDP over NCCL
with a single explicit all_reduce (models/criterion.py:258-260,
SURVEY.md §2.4). The TPU-native equivalent: a 1-D `jax.sharding.Mesh` over
the 'data' axis (ICI within a pod, DCN across slices -- XLA picks the
transport), replicated parameters, per-device self-contained batch shards,
and `lax.pmean` collectives inside a `shard_map`-ped train step.

Batch shards are stacked on a leading device axis on the host; every shard
must share identical padded shapes (the collator's bucketing guarantees this
when shards are built with common bucket sizes).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def stack_shards(shards: list):
    """Stack per-device pytrees on a new leading 'data' axis (host-side)."""
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *shards)


def shard_leading_axis(tree, mesh: Mesh):
    """Device-put a stacked pytree with its leading axis sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
