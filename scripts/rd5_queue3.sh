#!/usr/bin/env bash
# Round-5 recovery queue: the campaign stages orphaned when the primary
# queue's supervisor stall-killed the (legitimately compiling) neonB run in
# a loop — see scripts/supervise.py `allowance` (the grace now covers the
# whole init/compile window) and tests/test_supervise.py for the incident.
# Idempotent; stages sorted by value; MCQUIC_RD5_DEADLINE (epoch secs) stops
# chip work early enough that the driver's end-of-round bench.py gets an
# uncontended chip.
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
SC=$REPO/.scratch
RES=$SC/rd5/results
mkdir -p "$RES"
ENV="env PYTHONPATH=/root/.axon_site:$REPO JAX_PLATFORMS=axon MCQUIC_JAX_CACHE=$SC/jaxcache MCQUIC_SAVE_FREQ=1000"
DEADLINE=${MCQUIC_RD5_DEADLINE:-0}

say() { echo "[rd5c $(date +%H:%M:%S)] $*"; }

fits() { # $1 estimated seconds
  [ "$DEADLINE" -eq 0 ] && return 0
  [ $(( $(date +%s) + $1 )) -le "$DEADLINE" ]
}

ckpt_step() {
  python - "$1" <<'PYEOF' 2>/dev/null || echo 0
import sys, zipfile, numpy as np, io
try:
    with zipfile.ZipFile(sys.argv[1]) as z:
        with z.open("step.npy") as f:
            print(int(np.load(io.BytesIO(f.read()))))
except Exception:
    print(0)
PYEOF
}

train_done() { [ "$(ckpt_step "$1")" -ge "$2" ]; }

run_train() { # $1 name  $2 config  $3 ckpt  $4 totalStep  $5 extra-flags
  local name=$1; local cfg=$2; local ckpt=$3; local total=$4; local extra=${5:-}
  if train_done "$ckpt" "$total"; then say "$name: already at step >= $total — skip"; return 0; fi
  local log=$SC/${name}_train.log
  say "$name: launching supervised training ($cfg)"
  python scripts/supervise.py --log "$log" --stale 900 --grace 2400 --max-restarts 6 -- \
    $ENV python -m mcquic_tpu train -r $extra "$cfg"
  local rc=$?
  if [ $rc -ne 0 ] && ! train_done "$ckpt" "$total"; then
    say "$name: FAILED (rc=$rc, step=$(ckpt_step "$ckpt")) — aborting queue"; exit 1
  fi
  say "$name: done (step $(ckpt_step "$ckpt"))"
}

traj() { # $1 arm-logname
  local log=$SC/$1_train.log
  local out=$RES/$1_trajectory.json
  [ -s "$out" ] && return 0
  [ -s "$log" ] && python examples/train_trajectory.py "$log" --every 2 > "$out" \
    && say "trajectory: $out" || say "trajectory $1: no log (skipped)"
}

rd_eval() { # $1 name  $2 trainer-ckpt
  local name=$1; local ckpt=$2
  local out=$RES/${name}_rd.json
  [ -s "$out" ] && { say "eval $name: exists — skip"; return 0; }
  mkdir -p "$SC/rd5/exports"
  say "eval $name: export + rd_sweep (per-image, multieval)"
  $ENV python -m mcquic_tpu validate -e "$SC/rd5/exports/${name}.npz" "$ckpt" "$SC/photo_ds/val" > "$RES/${name}_validate.json" || { say "eval $name: validate FAILED"; return 1; }
  local expFile
  expFile=$(ls -t "$SC"/rd5/exports/${name}*.npz 2>/dev/null | head -1)
  $ENV python examples/rd_sweep.py "$SC/multieval" "$expFile" --per-image > "$out.tmp" && mv "$out.tmp" "$out" || { say "eval $name: rd_sweep FAILED"; return 1; }
  say "eval $name: done -> $out"
}

### ---- 1. the converged budget-sized Neon (verdict r4 item 5) ----
run_train rd5_neonB configs/rd5/neon_v2_cad1k_12k.yaml "$SC/rd5/neonB/latest/saved.ckpt.npz" 12000
traj rd5_neonB
rd_eval neonB "$SC/rd5/neonB/latest/saved.ckpt.npz" || say "neonB eval failed (non-fatal)"

### ---- 2. stage-2 generator on the converged tokenizer + samples ----
GENB_CKPT=$SC/rd5/genB/latest/saved.ckpt.npz
if fits 2400; then
  run_train rd5_genB configs/rd5/gen_stage2_neonB.yaml "$GENB_CKPT" 6000 "-G"
  dir=$RES/genB_samples
  if [ ! -s "$dir/grid.png" ]; then
    say "genB: sampling 9 classes through the generate CLI"
    mkdir -p "$dir"
    $ENV python -m mcquic_tpu generate -c 0,1,2,3,4,5,6,7,8 --top-k 64 "$GENB_CKPT" "$dir" \
      && python examples/sample_grid.py "$dir" "$dir/grid.png" --cols 3 \
      || say "genB sampling failed (non-fatal)"
  fi
  [ -s "$RES/genB_trajectory.json" ] || \
    python examples/gen_trajectory.py "$SC/rd5_genB_train.log" > "$RES/genB_trajectory.json" 2>/dev/null || true
else
  say "SKIP genB: would overrun MCQUIC_RD5_DEADLINE"
fi

### ---- 3. cadence-3k comparator arm ----
if fits 2700; then
  run_train rd5_neonC3k configs/rd5/neon_v2_cad3k_6k.yaml "$SC/rd5/neonC3k/latest/saved.ckpt.npz" 6000
  traj rd5_neonC3k
else
  say "SKIP neonC3k: would overrun MCQUIC_RD5_DEADLINE"
fi

say "RD5 QUEUE3 COMPLETE"
