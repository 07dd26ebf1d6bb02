"""Supervisor staleness semantics (scripts/supervise.py).

Regression for a live round-5 incident: the compile grace was gated on
"no log bytes since launch", but trainers print startup banners within
seconds, so the allowance collapsed to --stale right after the banner and
two legitimately-compiling Neon launches (>15 min XLA compile) were
SIGKILLed at banner+~900 s in a loop. The grace must cover the whole
init/compile window after (re)launch. (Failure-detection half of the
reference torchrun launcher, reference singlenode.sh/multinode.sh.)
"""
import importlib.util
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "supervise", REPO / "scripts" / "supervise.py")
supervise = importlib.util.module_from_spec(spec)
spec.loader.exec_module(supervise)


def test_grace_covers_compile_window_even_after_banner():
    # banner written 10 s in (mtime > launched), still compiling at t=1000 s:
    # the allowance must still include the grace, not collapse to stale.
    assert supervise.allowance(900, 2400, launched=0, now=1000) == 3300


def test_allowance_drops_to_stale_after_the_window():
    assert supervise.allowance(900, 2400, launched=0, now=3300) == 900
    assert supervise.allowance(900, 2400, launched=0, now=10_000) == 900


def test_supervisor_restarts_crashed_process_and_exits_clean(tmp_path):
    """End-to-end over the real script: a command that fails once then
    succeeds is relaunched and supervision ends 0."""
    log = tmp_path / "run.log"
    marker = tmp_path / "ran_once"
    cmd = [sys.executable, str(REPO / "scripts" / "supervise.py"),
           "--log", str(log), "--stale", "30", "--grace", "30",
           "--poll", "0.2", "--max-restarts", "2", "--",
           sys.executable, "-c",
           "import pathlib,sys;"
           f"m=pathlib.Path(r'{marker}');"
           "sys.exit(0) if m.exists() else (m.touch(), sys.exit(3))[1]"]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "relaunch 1/2" in proc.stdout
    assert time.time() - t0 < 120
