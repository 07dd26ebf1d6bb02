#!/usr/bin/env bash
# Single-host training launch with elastic restarts.
# TPU-native counterpart of reference singlenode.sh (SLURM + torchrun
# --max_restarts 3): one process drives the whole local chip slice via SPMD,
# so there is no per-device process fan-out; restarts rely on the trainer's
# auto-resume from saveDir/latest (train/cli.py).
#
# usage: scripts/singlenode.sh <config.yaml> [-G] [extra mcquic-train args...]
set -uo pipefail

CONFIG=${1:?usage: singlenode.sh <config.yaml> [-G]}
shift || true
MAX_RESTARTS=${MAX_RESTARTS:-3}

cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-$PWD}

attempt=0
while :; do
    python -m mcquic_tpu train "$@" "$CONFIG" && exit 0
    rc=$?
    attempt=$((attempt + 1))
    if [ "$attempt" -gt "$MAX_RESTARTS" ]; then
        echo "[singlenode] giving up after $MAX_RESTARTS restarts (rc=$rc)" >&2
        exit "$rc"
    fi
    echo "[singlenode] run failed (rc=$rc); restart $attempt/$MAX_RESTARTS (auto-resume from latest/)" >&2
    sleep 5
done
