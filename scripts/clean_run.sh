#!/usr/bin/env bash
# Fresh run: back up any existing saveDir/latest (reference clean_run.sh
# backs up saved/latest before relaunch), then launch.
#
# usage: scripts/clean_run.sh <config.yaml> [-G]
set -euo pipefail

CONFIG=${1:?usage: clean_run.sh <config.yaml> [-G]}
SAVE_DIR=$(python - "$CONFIG" <<'EOF'
import sys, yaml
print(yaml.safe_load(open(sys.argv[1]))["train"]["saveDir"])
EOF
)
if [ -d "$SAVE_DIR/latest" ]; then
    BACKUP="$SAVE_DIR/backup_$(date +%Y%m%d_%H%M%S)"
    echo "[clean_run] backing up $SAVE_DIR/latest -> $BACKUP" >&2
    mv "$SAVE_DIR/latest" "$BACKUP"
fi
exec "$(dirname "$0")/singlenode.sh" "$@"
