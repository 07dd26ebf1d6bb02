"""Saver concurrency lock + empty-latest resume fallback.

Regression tests for a live incident (NOTES.md round-4): a supervisor
relaunch raced a still-alive trainer on the same saveDir — the second
process found `latest/` empty (first had rotated it at init but not yet
saved), silently restarted from step 0, and both interleaved saves into
the same file. Reference counterpart: torchrun owns the only rank-0 so the
race cannot happen there (reference train/utils.py:63-77).
"""
import numpy as np
import pytest

from mcquic_tpu.train.saver import Saver, saveTree


def _writeCkpt(saver, step):
    saver.save({"step": np.asarray(step, np.int32),
                "params": {"w": np.zeros((2, 2), np.float32)}})


def test_same_process_savers_share_the_lock(tmp_path):
    # Sequential in-process Savers (save->resume tests, notebook reruns) are
    # one owner's deliberate pattern — they must NOT trip the guard. The
    # refcount keeps the flock held until the last holder closes.
    first = Saver(str(tmp_path))
    second = Saver(str(tmp_path))  # shares, no RuntimeError
    second.close()
    assert Saver._held, "first holder still open -> lock still held"
    first.close()
    assert str(tmp_path.resolve()) not in Saver._held
    third = Saver(str(tmp_path))
    third.close()


def test_foreign_process_holding_lock_is_refused(tmp_path):
    import subprocess
    import sys
    import time

    # A foreign process takes the lock and sleeps; our Saver must refuse.
    child = subprocess.Popen(
        [sys.executable, "-c",
         "import sys, time\n"
         "from mcquic_tpu.train.saver import Saver\n"
         "s = Saver(sys.argv[1])\n"
         "print('LOCKED', flush=True)\n"
         "time.sleep(60)\n",
         str(tmp_path)],
        stdout=subprocess.PIPE, text=True)
    try:
        assert child.stdout.readline().strip() == "LOCKED"
        with pytest.raises(RuntimeError, match="locked by another live trainer"):
            Saver(str(tmp_path))
        # kernel releases the flock on ANY death, including SIGKILL
        child.kill()
        child.wait(timeout=30)
        deadline = time.time() + 10
        while True:
            try:
                s = Saver(str(tmp_path))
                break
            except RuntimeError:
                if time.time() > deadline:
                    raise
                time.sleep(0.2)
        s.close()
    finally:
        if child.poll() is None:
            child.kill()
            child.wait()


def test_resume_falls_back_to_rotated_history_when_latest_empty(tmp_path):
    # run 1 trains and saves step 7
    s1 = Saver(str(tmp_path))
    _writeCkpt(s1, 7)
    s1.close()
    # run 2 starts (rotates latest/ into a timestamped dir) and CRASHES
    # before its first save — latest/ is left empty
    s2 = Saver(str(tmp_path))
    assert s2.PreviousCkpt is not None  # normal rotation path
    s2.close()
    assert not any((tmp_path / "latest").iterdir())
    # run 3 must resume from the rotated step-7 checkpoint, not restart
    s3 = Saver(str(tmp_path))
    prev = s3.PreviousCkpt
    assert prev is not None, "empty latest/ with history must fall back"
    tree, _ = Saver.load(prev)
    assert int(tree["step"]) == 7
    s3.close()


def test_fresh_dir_has_no_resume_point(tmp_path):
    s = Saver(str(tmp_path / "new"))
    assert s.PreviousCkpt is None
    s.close()
