#!/usr/bin/env python
"""Hang-aware training supervisor.

TPU-native counterpart of the failure-detection half of the reference's
torchrun launcher (reference singlenode.sh / multinode.sh: torchrun
--max_restarts 3 restarts CRASHED ranks, and c10d heartbeats turn a HUNG
rank into a crash). On a single-controller JAX deployment there is no
rendezvous daemon to time out for us: a dropped RPC connection to the
device service leaves the training process alive but asleep forever, which
a plain restart loop (scripts/singlenode.sh) never notices. This
supervisor closes that gap:

  * launches the training command in its own process group, output
    appended to --log;
  * polls the log's mtime — trainers log every `train.logFreq` steps, so a
    stale log means a stalled process, not a quiet one;
  * on staleness (default 15 min) SIGKILLs the process group and
    relaunches — safe because the Trainer/GenTrainer auto-resume from
    saveDir/latest (train/trainer.py), same contract torchrun restarts
    rely on;
  * on a nonzero exit, relaunches up to --max-restarts (a clean exit 0
  ends supervision).

usage:
  python scripts/supervise.py --log run.log [--stale 900] [--max-restarts 8] \
      -- env FOO=1 python -m mcquic_tpu train config.yaml
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def _mtime(path: str) -> float:
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def allowance(stale: float, grace: float, launched: float, now: float) -> float:
    """Silence allowance at time `now` for a process launched at `launched`.

    The grace covers the whole init/compile WINDOW after (re)launch, not
    just "no bytes yet": trainers print startup banners within seconds, and
    gating the grace on `mtime <= launched` collapsed the allowance to
    --stale right after the banner — a >15 min XLA compile then got
    stall-killed in a loop (seen live round 5: two Neon launches SIGKILLed
    at banner+~900 s while legitimately compiling)."""
    return stale + (grace if now - launched < grace + stale else 0.0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True, help="file the run appends to; its mtime is the liveness signal")
    ap.add_argument("--stale", type=float, default=900.0, help="seconds of log silence before the run is declared hung")
    ap.add_argument("--max-restarts", type=int, default=8)
    ap.add_argument("--poll", type=float, default=30.0)
    ap.add_argument("--grace", type=float, default=1800.0, help="extra allowance after (re)launch for init/compile before staleness applies")
    ap.add_argument("cmd", nargs=argparse.REMAINDER, help="-- command to run")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (put it after --)")

    # One supervisor per log: a second supervisor stacked on the same run
    # doubles the trainer (observed corrupting a 20k-step run; the trainer's
    # own saveDir flock is the second line of defense).
    import fcntl
    lock = open(args.log + ".lock", "w")
    try:
        fcntl.flock(lock, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        print(f"[supervise] {args.log} already supervised by another process — exiting", flush=True)
        return 2
    lock.write(str(os.getpid()))
    lock.flush()

    restarts = 0
    while True:
        with open(args.log, "ab") as logf:
            logf.write(f"\n[supervise] launch (restart {restarts}): {' '.join(cmd)}\n".encode())
            logf.flush()
            proc = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT, start_new_session=True)
        launched = time.time()
        print(f"[supervise] pid {proc.pid} (pgid {proc.pid}), log {args.log}", flush=True)
        killed_for_stall = False
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            mtime = _mtime(args.log)
            now = time.time()
            silent = now - max(mtime, launched)
            allowed = allowance(args.stale, args.grace, launched, now)
            if silent > allowed:
                print(f"[supervise] log silent {silent:.0f}s > {allowed:.0f}s — killing pgid {proc.pid}", flush=True)
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                killed_for_stall = True
                rc = -9
                break
            time.sleep(args.poll)
        if rc == 0:
            print("[supervise] clean exit", flush=True)
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[supervise] giving up after {args.max_restarts} restarts (rc={rc})", flush=True)
            return 1
        why = "stall" if killed_for_stall else f"rc={rc}"
        print(f"[supervise] relaunch {restarts}/{args.max_restarts} ({why}); auto-resume from latest/", flush=True)
        time.sleep(10)


if __name__ == "__main__":
    sys.exit(main())
