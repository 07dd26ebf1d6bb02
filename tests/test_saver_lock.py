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


def test_second_saver_on_same_dir_refused(tmp_path):
    first = Saver(str(tmp_path))
    with pytest.raises(RuntimeError, match="locked by another live trainer"):
        Saver(str(tmp_path))
    first.close()
    # released lock: a new trainer may take over
    second = Saver(str(tmp_path))
    second.close()


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
