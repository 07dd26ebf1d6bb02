"""LR schedules + value tuners + hook assembly."""
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.config import General
from mcquic_tpu.train.hooks import CodebookReassign, getAllHooks, HookType
from mcquic_tpu.train.lrSchedulers import (cosineAnnealingWarmupRestarts, cyclicLR,
                                           getSchedule, multiStepLRWithWarmUp, placeholder)
from mcquic_tpu.train.valueTuners import (CosineValue, CosineValueWithEnd, CyclicValue,
                                          ExponentialValue, JumpValue, StepValue)


def test_placeholder_constant():
    s = placeholder(1e-3)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(10000)) == pytest.approx(1e-3)


def test_cosine_warmup_restarts_shape():
    s = cosineAnnealingWarmupRestarts(1e-3, first_cycle_steps=1000,
                                      warmup_steps=100, lrScaleRatio=0.01)
    # warmup rises
    assert float(s(0)) < float(s(50)) < float(s(99))
    # peak right after warmup
    assert float(s(100)) == pytest.approx(1e-3, rel=1e-2)
    # decays to min at cycle end
    assert float(s(999)) == pytest.approx(1e-5, rel=0.3)
    # restarts
    assert float(s(1100)) == pytest.approx(float(s(100)), rel=1e-2)


def test_cosine_warmup_gamma_decay():
    s = cosineAnnealingWarmupRestarts(1e-3, first_cycle_steps=100,
                                      warmup_steps=10, gamma=0.5)
    peak0 = float(s(10))
    peak1 = float(s(110))
    assert peak1 == pytest.approx(peak0 * 0.5, rel=0.05)


def test_multistep_with_warmup():
    s = multiStepLRWithWarmUp(1.0, milestones=[100, 200], gamma=0.1)
    assert float(s(50)) == pytest.approx(0.5)
    assert float(s(150)) == pytest.approx(0.1)
    assert float(s(250)) == pytest.approx(0.01)


def test_cyclic_lr_triangular():
    s = cyclicLR(0.0, max_lr=1.0, step_size_up=10, step_size_down=10)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(20)) == pytest.approx(0.0, abs=1e-6)


def test_get_schedule_registry():
    s = getSchedule("CosineAnnealingWarmupRestarts", 1e-4,
                    {"first_cycle_steps": 100, "warmup_steps": 10})
    assert float(s(10)) > 0


def test_value_tuners():
    assert ExponentialValue(1.0, 0.5).calc(2) == pytest.approx(0.25)
    assert StepValue(1.0, 0.1, 10).calc(25) == pytest.approx(0.01)
    cv = CosineValue(maxValue=1.0, minValue=0.0, totalStep=100)
    assert cv.calc(0) == pytest.approx(1.0)
    assert cv.calc(100) == pytest.approx(0.0, abs=1e-6)
    cve = CosineValueWithEnd(maxValue=1.0, minValue=0.2, totalStep=100)
    assert cve.calc(500) == pytest.approx(0.2)
    jv = JumpValue(10.0, 0.9, 1, 0.01)
    assert jv.calc(0) == pytest.approx(10.0)
    cyc = CyclicValue(1.0)
    assert cyc.calc(0) == pytest.approx(1.0)
    # ValueTuner stateful surface
    assert cv.Value == pytest.approx(1.0)
    cv.step()
    assert cv.Value < 1.0


def test_hook_assembly():
    hooks = getAllHooks([General("CodebookReassign", {"freq": 5}),
                         General("NoSuchHook", {})])
    stepHooks = hooks[HookType.StepFinishHook]
    assert len(stepHooks) == 1
    assert isinstance(stepHooks[0], CodebookReassign)


def test_reassign_skips_terminal_step():
    """A reassign that fires exactly at totalStep would ship a perturbed
    codebook with no steps left to re-adapt (observed on TPU: +24% bpp on
    the exported model) — the hook must skip it."""
    calls = []

    class FakeTrainer:
        totalStep = 20

        def reassignCodebooks(self):
            calls.append(True)
            return 0.1

    hook = CodebookReassign(freq=10)
    t = FakeTrainer()
    hook(t, 5)       # off-frequency: no call
    hook(t, 10)      # mid-training firing: reassigns
    hook(t, 20)      # terminal step: skipped
    assert len(calls) == 1
