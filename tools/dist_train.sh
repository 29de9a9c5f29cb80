#!/usr/bin/env bash
# Multi-process training launcher — the equivalent of the reference's
# torch.distributed.launch wrapper (/root/reference/tools/dist_train.sh:9-11),
# speaking this repo's JAX env protocol (occnet_tpu/parallel/multihost.py).
#
#   tools/dist_train.sh <config> <num_processes> [extra train.py args...]
#
# Spawns <num_processes> local processes (one per host in a real fleet —
# there, run the same command on every host with JAX_PROCESS_ID set to the
# host's rank and JAX_COORDINATOR_ADDRESS pointing at host 0).
set -euo pipefail

CONFIG=$1
NPROC=$2
shift 2
PORT=${PORT:-28509}

export JAX_COORDINATOR_ADDRESS=${JAX_COORDINATOR_ADDRESS:-127.0.0.1:$PORT}
export JAX_NUM_PROCESSES=$NPROC

pids=()
for ((i = 0; i < NPROC; i++)); do
  JAX_PROCESS_ID=$i PYTHONPATH="$(dirname "$0")/..:${PYTHONPATH:-}" \
    python "$(dirname "$0")/train.py" --config "$CONFIG" --distributed \
    --seed 0 "$@" &
  pids+=($!)
done
rc=0
for p in "${pids[@]}"; do wait "$p" || rc=$?; done
exit $rc
