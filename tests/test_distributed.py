"""Host-side multi-host wiring logic (parallel/distributed.py).

The cross-process path itself is exercised by scripts/multihost_smoke.sh
(2-process CPU `jax.distributed` run); these tests pin the single-process
behavior and the shard-slicing contract.
"""

import jax
import numpy as np

from unscene3d_tpu.parallel.distributed import (
    global_batch_from_local,
    initialize_from_env,
    local_slice,
)
from unscene3d_tpu.parallel.mesh import make_mesh


def test_initialize_noop_without_env(monkeypatch):
    monkeypatch.delenv("UNSCENE3D_COORDINATOR", raising=False)
    monkeypatch.delenv("UNSCENE3D_DISTRIBUTED", raising=False)
    assert initialize_from_env() is False


def test_local_slice_single_process_identity():
    lists = [[1], [2], [3]]
    assert local_slice(lists) is lists


def test_global_batch_single_process_passthrough():
    mesh = make_mesh()
    tree = {"a": np.ones((len(jax.devices()), 4), np.float32)}
    out = global_batch_from_local(tree, mesh)
    assert out is tree
