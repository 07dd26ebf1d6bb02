#!/usr/bin/env bash
# Round-5 campaign queue (verdict r4 items 1/3/5): serialized single-chip
# schedule, idempotent — safe to relaunch any time; each stage skips itself
# if its artifact already exists.
# FINAL-SESSION reorder (~4h of chip left; stages sorted by value/hour):
#   1.  bench.py with the uint16 transfer path (no dataset dependency)
#   0.  rebuild datasets if the driver wiped .scratch
#   2b. rateC: third v1 rate point (m 4) + eval — completes the 3-rate curve
#   1b. thin-head pallas full-decode A/B probe
#   2.  neonB: cadence-1k A/B arm, 12k steps (codeUsage-vs-step evidence)
#   4b. rd_eval neonB
# DROPPED vs the original plan: rateA10k control (its §4 A/B table is
# already committed — docs/evidence/rd4_rateA10k_*), neonA 60k + stage-2
# retrain (a 60k Neon is 4-5h of chip at the measured 2.6 steps/s and
# cannot fit the final session).
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
SC=$REPO/.scratch
RES=$SC/rd5/results
mkdir -p "$SC/rd5" "$RES"
ENV="env PYTHONPATH=/root/.axon_site:$REPO JAX_PLATFORMS=axon MCQUIC_JAX_CACHE=$SC/jaxcache MCQUIC_SAVE_FREQ=1000"

say() { echo "[rd5 $(date +%H:%M:%S)] $*"; }

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

wait_foreign_supervisor() {
  while ! flock -n "$1.lock" true 2>/dev/null; do
    say "waiting: $1 is supervised by a live foreign process"
    sleep 60
  done
}

run_train() { # $1 name  $2 config  $3 ckpt  $4 totalStep
  local name=$1 cfg=$2 ckpt=$3 total=$4
  if train_done "$ckpt" "$total"; then say "$name: already at step >= $total — skip"; return 0; fi
  local log=$SC/${name}_train.log
  wait_foreign_supervisor "$log"
  if train_done "$ckpt" "$total"; then say "$name: completed by foreign run — skip"; return 0; fi
  say "$name: launching supervised training ($cfg)"
  python scripts/supervise.py --log "$log" --stale 900 --grace 2400 --max-restarts 10 -- \
    $ENV python -m mcquic_tpu train -r "$cfg"
  local rc=$?
  if [ $rc -ne 0 ] && ! train_done "$ckpt" "$total"; then
    say "$name: FAILED (rc=$rc, step=$(ckpt_step "$ckpt")) — aborting queue"; exit 1
  fi
  say "$name: done (step $(ckpt_step "$ckpt"))"
}

rd_eval() { # $1 name  $2 trainer-ckpt
  local name=$1 ckpt=$2
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

### ---- 0. wait for rd4 queue3 ----
while ps -eo args | grep -q "^bash scripts/rd4_queue3.sh$"; do
  say "waiting for rd4_queue3.sh to finish"
  sleep 120
done
say "chip free — starting round-5 stages"

### ---- 1. bench with uint16 transfers (no dataset dependency: first) ----
if [ ! -s "$RES/bench_uint16.json" ]; then
  say "bench: uint16 transfer path"
  ( cd "$REPO" && timeout 3600 python bench.py > "$RES/bench_uint16.json.tmp" 2> "$RES/bench_uint16.err" \
      && mv "$RES/bench_uint16.json.tmp" "$RES/bench_uint16.json" ) \
    || say "bench FAILED (non-fatal, continuing)"
else
  say "bench: exists — skip"
fi

### ---- 0a. datasets (driver restarts wipe .scratch) ----
[ -d "$SC/photo_ds/shards" ] || {
  say "rebuild photo_ds (crops + tar shards)"
  $ENV python examples/prepare_photo_dataset.py "$SC/photo_ds" || exit 1
  # prepare_photo_dataset only writes crops; the trainer consumes tar shards
  # from the dataset CLI (launching training before these exist poisons the
  # schedule-identical control's sample order — seen live this round).
  # -j 1 EXACTLY: shard layout feeds the loader's sample order, and the
  # committed rd4 trajectories were trained from a single-writer build
  # (-j 2 reproducibly shifts step-200 loss 0.24718 -> 0.22276).
  env JAX_PLATFORMS=cpu PYTHONPATH=$REPO python -m mcquic_tpu dataset -j 1 \
    "$SC/photo_ds/train_imgs" "$SC/photo_ds/shards" || exit 1
}
[ -d "$SC/gen_ds" ] || { say "rebuild gen_ds"; $ENV python examples/prepare_gen_dataset.py "$SC/gen_ds" || exit 1; }
[ -d "$SC/multieval" ] || { say "rebuild multieval"; $ENV python examples/prepare_multieval.py "$SC/multieval" || exit 1; }

### ---- 2b. third v1 rate point (multi-rate RD curve needs >= 3 rates) ----
run_train rd5_rateC configs/rd5/rateC_high_8k.yaml "$SC/rd5/rateC/latest/saved.ckpt.npz" 8000
rd_eval rateC "$SC/rd5/rateC/latest/saved.ckpt.npz" || say "rateC eval failed (non-fatal)"

### ---- 1b. thin-head pallas decode A/B (same fori_loop protocol) ----
if [ ! -s "$RES/thinhead_ab.json" ]; then
  say "probe: full-decode A/B, MCQUIC_THINHEAD default vs pallas"
  {
    echo '{"arm": "xla"}'
    timeout 1200 $ENV python scripts/decode_breakdown.py full
    echo '{"arm": "pallas"}'
    timeout 1200 $ENV MCQUIC_THINHEAD=pallas python scripts/decode_breakdown.py full
  } > "$RES/thinhead_ab.json.tmp" 2> "$RES/thinhead_ab.err" \
    && mv "$RES/thinhead_ab.json.tmp" "$RES/thinhead_ab.json" \
    || say "thinhead probe FAILED (non-fatal)"
else
  say "thinhead probe: exists — skip"
fi

### ---- 2. cadence-1k arm (answers the cadence question; budget-sized Neon) ----
run_train rd5_neonB configs/rd5/neon_v2_cad1k_12k.yaml "$SC/rd5/neonB/latest/saved.ckpt.npz" 12000

### ---- 4b. eval the cadence arm (usage + RD on the budget-sized geometry) ----
rd_eval neonB "$SC/rd5/neonB/latest/saved.ckpt.npz" || say "neonB eval failed (non-fatal)"

say "RD5 QUEUE COMPLETE"
