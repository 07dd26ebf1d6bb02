#!/usr/bin/env bash
# Round-4 campaign queue, phase 3: the lpips-proxy A/B CONTROL arm.
# rd4_queue_v2's snapshot-based control assumed a step-10000 rotated
# checkpoint of the rateA run would exist, but an UNINTERRUPTED supervised
# run never rotates (saves overwrite latest/ in place) — so the control is
# a fresh schedule-identical 10k run instead (configs/rd4/
# rateA_qp2_ctrl_10k.yaml; deterministic seeds make it the same trajectory
# as rateA's first 10k steps). Waits for queue2 to finish before touching
# the chip. Idempotent; safe to relaunch any time.
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
SC=$REPO/.scratch
RES=$SC/rd4/results
mkdir -p "$SC" "$RES"
ENV="env PYTHONPATH=/root/.axon_site:$REPO JAX_PLATFORMS=axon MCQUIC_JAX_CACHE=$SC/jaxcache MCQUIC_SAVE_FREQ=1000"

say() { echo "[queue3 $(date +%H:%M:%S)] $*"; }

ckpt_step() {
  python - "$1" <<'EOF' 2>/dev/null || echo 0
import sys, zipfile, numpy as np, io
try:
    with zipfile.ZipFile(sys.argv[1]) as z:
        with z.open("step.npy") as f:
            print(int(np.load(io.BytesIO(f.read()))))
except Exception:
    print(0)
EOF
}

train_done() { [ "$(ckpt_step "$1")" -ge "$2" ]; }

wait_foreign_supervisor() {
  while ! flock -n "$1.lock" true 2>/dev/null; do
    say "waiting: $1 is supervised by a live foreign process"
    sleep 60
  done
}

run_train() { # $1 name  $2 config  $3 ckpt  $4 totalStep  $5 extra-env
  local name=$1 cfg=$2 ckpt=$3 total=$4 extra=${5:-}
  if train_done "$ckpt" "$total"; then say "$name: already at step >= $total — skip"; return 0; fi
  local log=$SC/${name}_train.log
  wait_foreign_supervisor "$log"
  if train_done "$ckpt" "$total"; then say "$name: completed by foreign run — skip"; return 0; fi
  say "$name: launching supervised training ($cfg)"
  python scripts/supervise.py --log "$log" --stale 900 --grace 2400 --max-restarts 10 -- \
    $ENV $extra python -m mcquic_tpu train -r "$cfg"
  local rc=$?
  if [ $rc -ne 0 ] && ! train_done "$ckpt" "$total"; then
    say "$name: FAILED (rc=$rc, step=$(ckpt_step "$ckpt")) — aborting queue"; exit 1
  fi
  say "$name: done (step $(ckpt_step "$ckpt"))"
}

rd_eval() { # $1 name  $2 trainer-ckpt
  local name=$1 ckpt=$2
  local out=$RES/${name}_rd.json
  local exp=$SC/rd4/exports/${name}.npz
  [ -s "$out" ] && { say "eval $name: exists — skip"; return 0; }
  mkdir -p "$SC/rd4/exports"
  say "eval $name: export + rd_sweep (per-image, multieval)"
  $ENV python -m mcquic_tpu validate -e "$exp" "$ckpt" "$SC/photo_ds/val" > "$RES/${name}_validate.json" || { say "eval $name: validate FAILED"; return 1; }
  local expFile
  expFile=$(ls -t "$SC"/rd4/exports/${name}*.npz 2>/dev/null | head -1)
  $ENV python examples/rd_sweep.py "$SC/multieval" "$expFile" --per-image > "$out.tmp" && mv "$out.tmp" "$out" || { say "eval $name: rd_sweep FAILED"; return 1; }
  say "eval $name: done -> $out"
}

### ---- wait for queue2 (pid-based: its log line is the weaker signal) ----
while pgrep -x bash >/dev/null 2>&1 && ps -eo args | grep -q "^bash scripts/rd4_queue_v2.sh$"; do
  say "waiting for rd4_queue_v2.sh to finish"
  sleep 120
done
say "queue2 gone — starting phase 3"

run_train rateA10k configs/rd4/rateA_qp2_ctrl_10k.yaml "$SC/rd4/rateA10k/latest/saved.ckpt.npz" 10000
rd_eval rateA10k "$SC/rd4/rateA10k/latest/saved.ckpt.npz" || say "rateA10k eval failed (non-fatal)"

say "QUEUE3 COMPLETE"
