#!/usr/bin/env bash
# Multi-process eval/submission launcher — equivalent of the reference's
# /root/reference/tools/dist_test.sh:9-11 under this repo's JAX env protocol.
#
#   tools/dist_test.sh <config> <checkpoint> <num_processes> [extra args...]
#
# e.g.  tools/dist_test.sh base_occ work/ckpt 8 --format-only --out sub.gz
set -euo pipefail

CONFIG=$1
CKPT=$2
NPROC=$3
shift 3
PORT=${PORT:-29503}

export JAX_COORDINATOR_ADDRESS=${JAX_COORDINATOR_ADDRESS:-127.0.0.1:$PORT}
export JAX_NUM_PROCESSES=$NPROC

pids=()
for ((i = 0; i < NPROC; i++)); do
  JAX_PROCESS_ID=$i PYTHONPATH="$(dirname "$0")/..:${PYTHONPATH:-}" \
    python "$(dirname "$0")/test.py" --config "$CONFIG" --checkpoint "$CKPT" \
    --distributed "$@" &
  pids+=($!)
done
rc=0
for p in "${pids[@]}"; do wait "$p" || rc=$?; done
exit $rc
