#!/usr/bin/env bash
# Round-5 follow-up queue: the stages that depend on rd5_queue.sh's outputs.
# Waits for the primary queue, then (time-guarded, idempotent, in
# value-per-hour order):
#   3. neonB usage trajectory (log-only, free)
#   4. stage-2 generator retrained on the converged neonB tokenizer
#      + sample grid + CE trajectory (verdict r4 item 5's second half)
#   5. cad-3k comparator arm (6k steps, shares seeds + 12k cosine with
#      neonB) -> the paired codeUsage-vs-step A/B over [0, 6k]
# MCQUIC_RD5_DEADLINE (epoch secs) guards the expensive stages: a stage
# whose typical cost would overrun the deadline is skipped loudly instead
# of leaving a mid-cycle checkpoint.
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
SC=$REPO/.scratch
RES=$SC/rd5/results
mkdir -p "$RES"
ENV="env PYTHONPATH=/root/.axon_site:$REPO JAX_PLATFORMS=axon MCQUIC_JAX_CACHE=$SC/jaxcache MCQUIC_SAVE_FREQ=1000"
DEADLINE=${MCQUIC_RD5_DEADLINE:-0}

say() { echo "[rd5b $(date +%H:%M:%S)] $*"; }

fits() { # $1 estimated seconds — true if no deadline or it fits
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
  python scripts/supervise.py --log "$log" --stale 900 --grace 2400 --max-restarts 10 -- \
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

### ---- 0. wait for the primary rd5 queue ----
while ps -eo args | grep -q "^bash scripts/rd5_queue.sh$"; do
  say "waiting for rd5_queue.sh to finish"
  sleep 120
done
say "primary queue done — starting follow-up stages"

### ---- 3. neonB usage trajectory (free) ----
traj rd5_neonB

### ---- 4. stage-2 generator on the converged tokenizer + samples ----
# round-4 measured ~6.9 steps/s at 596 tokens; 426 tokens / 6k steps ~ 15-20 min
GENB_CKPT=$SC/rd5/genB/latest/saved.ckpt.npz
if fits 1800; then
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

### ---- 5. cadence-3k comparator (the paired A/B's other arm) ----
# neonB measured ~2.6 steps/s on this class of chip -> 6k steps ~ 40 min
if fits 2700; then
  run_train rd5_neonC3k configs/rd5/neon_v2_cad3k_6k.yaml "$SC/rd5/neonC3k/latest/saved.ckpt.npz" 6000
  traj rd5_neonC3k
else
  say "SKIP neonC3k: would overrun MCQUIC_RD5_DEADLINE"
fi

say "RD5 QUEUE2 COMPLETE"
