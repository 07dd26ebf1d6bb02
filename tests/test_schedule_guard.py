"""Schedule-vs-budget guard (round-2 hardware trap, NOTES.md): a cosine
cycle sized smaller than TotalStep — typically after a resume with a raised
budget — trains at lr~0 for most of the run. Reference culture is
strict-config (`mcquic/config.py` raises on unknown keys); here the trap is
warned on by default and refused under MCQUIC_STRICT_SCHEDULE=1."""
import logging

import pytest

from mcquic_tpu.train.lrSchedulers import (checkScheduleCoversBudget,
                                           getSchedule,
                                           scheduleFlatlineFraction)

BASE_LR = 3e-4


def _cosine(firstCycle, lrScaleRatio=0.0, gamma=1.0):
    return getSchedule("CosineAnnealingWarmupRestarts", BASE_LR,
                       dict(first_cycle_steps=firstCycle, warmup_steps=30,
                            lrScaleRatio=lrScaleRatio, gamma=gamma))


def test_healthy_schedule_passes():
    # cycle sized to the budget: lr stays well above 1% of base for most steps
    sched = _cosine(2000)
    assert scheduleFlatlineFraction(sched, BASE_LR, 0, 2000) < 0.25
    assert checkScheduleCoversBudget(sched, BASE_LR, 0, 2000)


def test_resume_with_raised_total_step_warns(caplog):
    # The exact observed trap: 600-step cycle, resumed at step 600 with
    # TotalStep raised to 2000 and gamma decaying each restart to ~0.
    sched = _cosine(600, gamma=0.05)
    with caplog.at_level(logging.WARNING, logger="mcquic_tpu.train"):
        ok = checkScheduleCoversBudget(sched, BASE_LR, 600, 2000)
    assert not ok
    assert any("lr~0" in r.message or "below 1%" in r.message
               for r in caplog.records)


def test_strict_mode_refuses():
    sched = _cosine(600, gamma=0.05)
    with pytest.raises(ValueError, match="below 1% of the base lr"):
        checkScheduleCoversBudget(sched, BASE_LR, 600, 2000, strict=True)


def test_placeholder_constant_schedule_is_healthy():
    sched = getSchedule("Placeholder", BASE_LR, {})
    assert checkScheduleCoversBudget(sched, BASE_LR, 0, 100000)


def test_trainer_train_invokes_guard(monkeypatch, tmp_path):
    # End-to-end: Trainer.train() refuses under strict mode with the
    # flatlining config BEFORE touching the loader.
    import numpy as np

    from mcquic_tpu.config import Config
    from mcquic_tpu.train.trainer import Trainer

    cfg = Config.deserialize({
        "model": {"key": "Compressor",
                  "params": {"channel": 8, "m": 1, "k": [16, 8]}},
        "train": {"totalStep": 2000, "batchSize": 1, "epoch": 1,
                  "valFreq": 1000, "trainSet": str(tmp_path),
                  "valSet": str(tmp_path), "saveDir": "",
                  "target": "MsSSIM",
                  "optim": {"key": "Adam", "params": {"lr": BASE_LR}},
                  "schdr": {"key": "CosineAnnealingWarmupRestarts",
                            "params": {"first_cycle_steps": 300,
                                       "warmup_steps": 10, "gamma": 0.05}},
                  "gpu": {"gpus": 1, "vRam": -1, "wantsMore": False}}})
    monkeypatch.setenv("MCQUIC_STRICT_SCHEDULE", "1")
    trainer = Trainer(cfg, lpipsFn=False, inputShape=(32, 32))

    def loader():
        raise AssertionError("guard must fire before the loader is consumed")

    with pytest.raises(ValueError, match="below 1% of the base lr"):
        trainer.train(loader, onStep=lambda *_: None)
