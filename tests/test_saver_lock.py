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


def test_sequential_in_process_savers_allowed_concurrent_refused(tmp_path):
    # Sequential in-process Savers (save -> close -> resume: tests, notebook
    # reruns) are one owner's deliberate pattern — they must NOT trip the
    # guard. A second Saver while the first is still OPEN is the same
    # interleaved-save corruption the cross-process flock exists for, so it
    # is refused (ADVICE r4).
    first = Saver(str(tmp_path))
    with pytest.raises(RuntimeError, match="already owned by a live Saver"):
        Saver(str(tmp_path))
    first.close()
    assert str(tmp_path.resolve()) not in Saver._held
    second = Saver(str(tmp_path))
    second.close()


def test_unclosed_dropped_saver_does_not_wedge_the_dir(tmp_path):
    # A holder dropped without close() (crashed notebook cell) must not
    # permanently wedge the saveDir for this process: once the object is
    # collected, a new Saver adopts the process's flock fd.
    import gc
    s = Saver(str(tmp_path))
    del s
    gc.collect()
    adopted = Saver(str(tmp_path))  # no RuntimeError
    adopted.close()


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


def test_bf16_leaves_roundtrip_dtype(tmp_path):
    # A training checkpoint containing bf16 leaves must resume with the
    # SAME dtypes it was saved with (ADVICE r4: the old float32 restore
    # made fresh vs resumed runs diverge/recompile); deploy consumers
    # upcast explicitly via upcastBf16.
    import ml_dtypes

    from mcquic_tpu.train.saver import loadTree, upcastBf16
    tree = {"w32": np.ones((2, 2), np.float32),
            "w16": np.ones((2, 2)).astype(ml_dtypes.bfloat16),
            "step": np.asarray(3, np.int32)}
    saveTree(tmp_path / "t.npz", tree)
    got, _ = loadTree(tmp_path / "t.npz")
    assert got["w32"].dtype == np.float32
    assert got["w16"].dtype == ml_dtypes.bfloat16
    assert got["step"].dtype == np.int32
    up = upcastBf16(got)
    assert up["w16"].dtype == np.float32 and up["step"].dtype == np.int32
