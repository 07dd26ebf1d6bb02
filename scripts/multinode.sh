#!/usr/bin/env bash
# Multi-host training launch for a TPU pod slice (or any jax.distributed
# cluster). TPU-native counterpart of reference multinode.sh (SLURM +
# torchrun --rdzv-backend=c10d --max_restarts 3): run this SAME script on
# every host; each host runs ONE process and the train step is a single SPMD
# program over the global mesh.
#
# Cloud TPU (GCE) — coordination comes from the TPU metadata service:
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
#     --command="cd /path/to/repo && MCQUIC_MULTIHOST=auto scripts/multinode.sh configs/v5e_8.yaml"
#
# Generic cluster — set the rendezvous explicitly per host:
#   MCQUIC_COORDINATOR=host0:8476 MCQUIC_NUM_PROCESSES=4 MCQUIC_PROCESS_ID=$RANK \
#     scripts/multinode.sh configs/v5e_8.yaml
set -uo pipefail

CONFIG=${1:?usage: multinode.sh <config.yaml> [-G]}
shift || true
MAX_RESTARTS=${MAX_RESTARTS:-3}
export MCQUIC_MULTIHOST=${MCQUIC_MULTIHOST:-auto}

cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-$PWD}

attempt=0
while :; do
    python -m mcquic_tpu train "$@" "$CONFIG" && exit 0
    rc=$?
    attempt=$((attempt + 1))
    if [ "$attempt" -gt "$MAX_RESTARTS" ]; then
        echo "[multinode] giving up after $MAX_RESTARTS restarts (rc=$rc)" >&2
        exit "$rc"
    fi
    # All hosts must restart together; jax.distributed re-rendezvouses on
    # relaunch and training auto-resumes from saveDir/latest.
    echo "[multinode] run failed (rc=$rc); restart $attempt/$MAX_RESTARTS" >&2
    sleep 10
done
