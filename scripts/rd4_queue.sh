#!/usr/bin/env bash
# Round-4 TPU campaign queue: serializes every training/eval job of
# docs/RD_RESULTS_r04.md on the single chip, each training under the
# hang-aware supervisor (scripts/supervise.py), with idempotent done-checks
# so the queue can be relaunched after any session/driver restart.
#
#   neon   (in-flight or resumed) -> neon eval/export
#   gen    stage-2 generator      -> CE trajectory + samples + grid
#   rateA  v1 qp-2 20k            -> per-image RD eval
#   rateB  v1 low-rate 20k        -> per-image RD eval
#   rateAp v1 qp-2 + lpips proxy  -> per-image RD eval (A/B treatment)
#
# usage: nohup bash scripts/rd4_queue.sh > .scratch/rd4_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
SC=$REPO/.scratch
RES=$SC/rd4/results
mkdir -p "$SC" "$RES"
ENV="env PYTHONPATH=/root/.axon_site:$REPO JAX_PLATFORMS=axon MCQUIC_JAX_CACHE=$SC/jaxcache MCQUIC_SAVE_FREQ=1000"

say() { echo "[queue $(date +%H:%M:%S)] $*"; }

# step recorded in a trainer checkpoint (0 if unreadable/absent)
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

train_done() { # $1 ckpt  $2 totalStep
  [ "$(ckpt_step "$1")" -ge "$2" ]
}

wait_foreign_supervisor() { # $1 logfile — wait while another process holds its lock
  while ! flock -n "$1.lock" true 2>/dev/null; do
    say "waiting: $1 is supervised by a live foreign process"
    sleep 60
  done
}

run_train() { # $1 name  $2 config  $3 ckpt  $4 totalStep  $5 extra-env  $6 extra train flags
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

datasets() {
  [ -d "$SC/photo_ds/shards" ] || { say "rebuild photo_ds"; $ENV python examples/prepare_photo_dataset.py "$SC/photo_ds" || exit 1; }
  [ -d "$SC/gen_ds" ] || { say "rebuild gen_ds"; $ENV python examples/prepare_gen_dataset.py "$SC/gen_ds" || exit 1; }
  [ -d "$SC/multieval" ] || { say "rebuild multieval"; $ENV python examples/prepare_multieval.py "$SC/multieval" || exit 1; }
}

rd_eval() { # $1 name  $2 trainer-ckpt — export deploy model + per-image RD over multieval
  # NOTE: ${name} must be referenced in a SEPARATE `local` statement — all
  # words of one `local` command expand before any assignment lands (set -u).
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

### ---- queue ----
datasets

NEON_CKPT=$SC/rd3/neon_saved/latest/saved.ckpt.npz
run_train neon configs/rd3/neon_tokenizer.yaml "$NEON_CKPT" 20000
rd_eval neon "$NEON_CKPT" || say "neon eval failed (non-fatal, continuing)"

gen_artifacts() { # $1 name  $2 ckpt  $3 trainlog — sample grid + CE trajectory
  local name=$1 ckpt=$2 trainlog=$3
  local dir=$RES/${name}_samples
  if [ ! -s "$dir/grid.png" ]; then
    say "$name: sampling 9 classes through the generate CLI"
    mkdir -p "$dir"
    $ENV python -m mcquic_tpu generate -c 0,1,2,3,4,5,6,7,8 --top-k 64 "$ckpt" "$dir" \
      && python examples/sample_grid.py "$dir" "$dir/grid.png" --cols 3 \
      || say "$name sampling failed (non-fatal)"
  fi
  [ -s "$RES/${name}_trajectory.json" ] || \
    python examples/gen_trajectory.py "$trainlog" > "$RES/${name}_trajectory.json" 2>/dev/null || true
}

# Control: the reference's FusedLAMB recipe — ran 3,200 steps to uniform CE
# (LAMB trust-ratio vs tiny-init logits head; scripts/gen_overfit_probe.py).
# Kept as the A-side of the optimizer finding; no sampling (uniform logits).
GEN_CKPT=$SC/rd3/gen_saved/latest/saved.ckpt.npz
run_train gen configs/rd3/gen_stage2.yaml "$GEN_CKPT" 3200 "" "-G"
[ -s "$RES/gen_trajectory.json" ] || \
  python examples/gen_trajectory.py "$SC/gen_train.log" > "$RES/gen_trajectory.json" 2>/dev/null || true

# Fixed recipe: Adam at the same lr (see configs/rd4/gen_stage2_adam.yaml).
GEN_ADAM_CKPT=$SC/rd4/gen_adam/latest/saved.ckpt.npz
run_train gen_adam configs/rd4/gen_stage2_adam.yaml "$GEN_ADAM_CKPT" 10000 "" "-G"
gen_artifacts gen_adam "$GEN_ADAM_CKPT" "$SC/gen_adam_train.log"

run_train rateA configs/rd4/rateA_qp2_20k.yaml "$SC/rd4/rateA/latest/saved.ckpt.npz" 20000
rd_eval rateA "$SC/rd4/rateA/latest/saved.ckpt.npz" || true

run_train rateB configs/rd4/rateB_low_20k.yaml "$SC/rd4/rateB/latest/saved.ckpt.npz" 20000
rd_eval rateB "$SC/rd4/rateB/latest/saved.ckpt.npz" || true

run_train rateAproxy configs/rd4/rateA_qp2_20k_proxy.yaml "$SC/rd4/rateAproxy/latest/saved.ckpt.npz" 20000 "MCQUIC_LPIPS_PROXY=1"
rd_eval rateAproxy "$SC/rd4/rateAproxy/latest/saved.ckpt.npz" || true

say "QUEUE COMPLETE"
