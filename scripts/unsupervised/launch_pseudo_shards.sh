#!/bin/bash
# Sharded pseudo-mask generation across hosts (the reference launches this
# via hydra submitit_slurm, pseudo_masks/config/default.yaml:124-125).
# Usage: launch_pseudo_shards.sh NUM_SHARDS [extra hydra overrides...]
# Run one invocation per host with SHARD=<i>; per-scene outputs are
# idempotent so shards never conflict and crashed shards can simply re-run.
set -e
NUM_SHARDS=${1:?usage: launch_pseudo_shards.sh NUM_SHARDS [overrides...]}
shift
SHARD=${SHARD:-0}
exec python pseudo_masks_main.py \
    misc.num_shards="${NUM_SHARDS}" misc.shard="${SHARD}" "$@"
