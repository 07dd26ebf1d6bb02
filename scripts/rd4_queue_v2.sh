#!/usr/bin/env bash
# Round-4 campaign queue, phase 2 (rebalanced mid-round — see
# configs/rd4/rateB_low_8k.yaml header): picks up after the running rateA
# 20k supervisor finishes. Jobs:
#   rateA eval (20k)             -> per-image RD over multieval
#   rateB 8k   + eval            -> second point on the rate axis
#   proxy 10k  + eval            -> lpips-proxy treatment arm
#   rateA@10k snapshot eval      -> schedule-identical A/B control
# Idempotent like v1; safe to relaunch any time.
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
SC=$REPO/.scratch
RES=$SC/rd4/results
mkdir -p "$SC" "$RES"
ENV="env PYTHONPATH=/root/.axon_site:$REPO JAX_PLATFORMS=axon MCQUIC_JAX_CACHE=$SC/jaxcache MCQUIC_SAVE_FREQ=1000"

say() { echo "[queue2 $(date +%H:%M:%S)] $*"; }

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

run_train() { # $1 name  $2 config  $3 ckpt  $4 totalStep  $5 extra-env  $6 flags
  local name=$1 cfg=$2 ckpt=$3 total=$4 extra=${5:-} flags=${6:-}
  if train_done "$ckpt" "$total"; then say "$name: already at step >= $total — skip"; return 0; fi
  local log=$SC/${name}_train.log
  wait_foreign_supervisor "$log"
  if train_done "$ckpt" "$total"; then say "$name: completed by foreign run — skip"; return 0; fi
  say "$name: launching supervised training ($cfg)"
  python scripts/supervise.py --log "$log" --stale 900 --grace 2400 --max-restarts 10 -- \
    $ENV $extra python -m mcquic_tpu train -r $flags "$cfg"
  local rc=$?
  if [ $rc -ne 0 ] && ! train_done "$ckpt" "$total"; then
    say "$name: FAILED (rc=$rc, step=$(ckpt_step "$ckpt")) — aborting queue"; exit 1
  fi
  say "$name: done (step $(ckpt_step "$ckpt"))"
}

rd_eval() { # $1 name  $2 trainer-ckpt
  local name=$1 ckpt=$2
  local out=$RES/${name}_rd.json exp=$SC/rd4/exports/${name}.npz
  [ -s "$out" ] && { say "eval $name: exists — skip"; return 0; }
  mkdir -p "$SC/rd4/exports"
  say "eval $name: export + rd_sweep (per-image, multieval)"
  $ENV python -m mcquic_tpu validate -e "$exp" "$ckpt" "$SC/photo_ds/val" > "$RES/${name}_validate.json" || { say "eval $name: validate FAILED"; return 1; }
  local expFile
  expFile=$(ls -t "$SC"/rd4/exports/${name}*.npz 2>/dev/null | head -1)
  $ENV python examples/rd_sweep.py "$SC/multieval" "$expFile" --per-image > "$out.tmp" && mv "$out.tmp" "$out" || { say "eval $name: rd_sweep FAILED"; return 1; }
  say "eval $name: done -> $out"
}

# snapshot with an exact step among a saveDir's rotated checkpoints
find_snapshot() { # $1 saveDir  $2 step
  local d
  for d in "$1"/*/; do
    [ -f "$d/saved.ckpt.npz" ] || continue
    if [ "$(ckpt_step "$d/saved.ckpt.npz")" -eq "$2" ]; then
      echo "$d/saved.ckpt.npz"; return 0
    fi
  done
  return 1
}

### ---- queue ----
RATEA_CKPT=$SC/rd4/rateA/latest/saved.ckpt.npz
run_train rateA configs/rd4/rateA_qp2_20k.yaml "$RATEA_CKPT" 20000
rd_eval rateA "$RATEA_CKPT" || say "rateA eval failed (non-fatal)"

run_train rateB configs/rd4/rateB_low_8k.yaml "$SC/rd4/rateB/latest/saved.ckpt.npz" 8000
rd_eval rateB "$SC/rd4/rateB/latest/saved.ckpt.npz" || say "rateB eval failed (non-fatal)"

run_train rateAproxy configs/rd4/rateA_qp2_proxy_10k.yaml "$SC/rd4/rateAproxy/latest/saved.ckpt.npz" 10000 "MCQUIC_LPIPS_PROXY=1"
rd_eval rateAproxy "$SC/rd4/rateAproxy/latest/saved.ckpt.npz" || say "proxy eval failed (non-fatal)"

if snap=$(find_snapshot "$SC/rd4/rateA" 10000); then
  say "A/B control: rateA@10000 snapshot at $snap"
  rd_eval rateA10k "$snap" || say "rateA10k eval failed (non-fatal)"
else
  say "A/B control: NO rateA snapshot at step 10000 found (non-fatal)"
fi

say "QUEUE2 COMPLETE"
