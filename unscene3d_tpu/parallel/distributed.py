"""Multi-host (multi-process) data-parallel wiring.

The reference scales out via pytorch-lightning's DDP launcher, which spawns
one process per GPU and wires NCCL behind the scenes
(main_instance_segmentation.py:86-93 in /root/reference). The TPU-native
equivalent (SURVEY.md §2.4): every host runs THIS program;
`jax.distributed.initialize` forms the global runtime; the 1-D 'data' mesh
spans all global devices, so the existing `lax.pmean` collectives in the
train step are already globally correct. Each host feeds only the batch
shards of its OWN local devices (`jax.make_array_from_process_local_data`
assembles the global array), and all hosts draw the same deterministic
scene-id stream so the per-device assignment needs no communication.

Launch (one command per host):

  UNSCENE3D_COORDINATOR=host0:8476 \
  UNSCENE3D_NUM_PROCESSES=4 \
  UNSCENE3D_PROCESS_ID=<0..3> \
  python main_instance_segmentation.py ...

On Cloud TPU pods the three variables may be omitted:
`jax.distributed.initialize()` auto-discovers the topology from the TPU
metadata (pass UNSCENE3D_DISTRIBUTED=1 to request initialization).
"""

from __future__ import annotations

import os

import jax
import numpy as np

_INITIALIZED = [False]


def initialize_from_env() -> bool:
    """Initialize `jax.distributed` when the environment requests it.

    Returns True when a multi-process runtime was initialized (or already
    was). Safe to call more than once and in single-process runs.
    """
    if _INITIALIZED[0]:
        return jax.process_count() > 1
    coord = os.environ.get("UNSCENE3D_COORDINATOR")
    nproc = os.environ.get("UNSCENE3D_NUM_PROCESSES")
    pid = os.environ.get("UNSCENE3D_PROCESS_ID")
    auto = os.environ.get("UNSCENE3D_DISTRIBUTED")
    if coord and nproc and int(nproc) > 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid or 0),
        )
        _INITIALIZED[0] = True
        return True
    if auto:
        # TPU-pod auto-discovery path
        jax.distributed.initialize()
        _INITIALIZED[0] = True
        return jax.process_count() > 1
    return False


def local_slice(per_device_lists: list) -> list:
    """This host's slice of a per-GLOBAL-device list (e.g. the per-shard
    scene-id lists every host draws identically)."""
    ld = jax.local_device_count()
    pi = jax.process_index()
    if jax.process_count() == 1:
        return per_device_lists
    assert len(per_device_lists) == jax.device_count(), (
        f"expected one entry per global device "
        f"({jax.device_count()}), got {len(per_device_lists)}")
    return per_device_lists[pi * ld:(pi + 1) * ld]


def global_batch_from_local(local_stacked, mesh):
    """Assemble the global 'data'-sharded batch pytree from this host's
    (local_devices, ...) stacked shards. Single-process: returns the input
    unchanged (jit resharding handles the placement)."""
    if jax.process_count() == 1:
        return local_stacked
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        local_stacked)
