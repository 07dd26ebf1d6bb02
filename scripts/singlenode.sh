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

# One launcher per config: a forgotten second restart loop keeps respawning
# trainers against the same saveDir (postmortem in NOTES.md round-4 — the
# trainer's own saveDir flock refuses the duplicate, but the loop would
# retry forever). flock is released on any death, including SIGKILL.
exec 9> "${CONFIG}.launch.lock"
if ! flock -n 9; then
    echo "[singlenode] $CONFIG is already driven by another launcher — exiting" >&2
    exit 2
fi

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
