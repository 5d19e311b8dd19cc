#!/usr/bin/env bash
# 2-process CPU jax.distributed smoke: both processes form one runtime,
# build the global 'data' mesh, and run one DP train step on tiny synthetic
# scenes. Verifies the multi-host wiring (parallel/distributed.py) without
# TPU pod hardware.
set -e
cd "$(dirname "$0")/.."
PORT=${PORT:-8476}
run_proc() {
  UNSCENE3D_COORDINATOR=127.0.0.1:$PORT \
  UNSCENE3D_NUM_PROCESSES=2 \
  UNSCENE3D_PROCESS_ID=$1 \
  JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=2" \
  python -u tests/multihost_smoke_worker.py > /tmp/mh_worker_$1.log 2>&1
}
run_proc 1 &
W1=$!
run_proc 0
RC0=$?
wait $W1
RC1=$?
grep "DP step OK" /tmp/mh_worker_0.log /tmp/mh_worker_1.log
test $RC0 -eq 0 -a $RC1 -eq 0
echo "multihost smoke OK"
