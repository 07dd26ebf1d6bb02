#!/usr/bin/env bash
# Resume a preempted run (reference resume_training.sh): training always
# auto-resumes from saveDir/latest/saved.ckpt.npz when present, so resuming
# IS relaunching. This wrapper just sanity-checks the checkpoint exists.
#
# usage: scripts/resume_training.sh <config.yaml> [-G]
set -euo pipefail

CONFIG=${1:?usage: resume_training.sh <config.yaml> [-G]}
SAVE_DIR=$(python - "$CONFIG" <<'EOF'
import sys, yaml
print(yaml.safe_load(open(sys.argv[1]))["train"]["saveDir"])
EOF
)
if [ ! -f "$SAVE_DIR/latest/saved.ckpt.npz" ]; then
    echo "[resume] no checkpoint at $SAVE_DIR/latest/saved.ckpt.npz — starting fresh" >&2
fi
exec "$(dirname "$0")/singlenode.sh" "$@"
