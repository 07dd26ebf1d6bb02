"""LR schedules as pure step→lr functions (optax-style).

Parity with reference `mcquic/train/lrSchedulers.py` (registered:
`Placeholder`, `MultiStepLRWithWarmUp` `:22-68`, `CyclicLR` `:71-302`,
`CosineAnnealingWarmupRestarts` `:306-481`). Each factory takes the base lr
plus the reference's ctor kwargs and returns `f(step) -> lr`; functional
schedules compose directly with optax and jit (no stateful .step()).
"""
import math

import jax.numpy as jnp

from mcquic_tpu.utils.registry import LrSchedulerRegistry


@LrSchedulerRegistry.register(key="Placeholder")
def placeholder(baseLr: float, **_):
    def schedule(step):
        return jnp.asarray(baseLr, jnp.float32)
    return schedule


@LrSchedulerRegistry.register(key="MultiStepLRWithWarmUp")
def multiStepLRWithWarmUp(baseLr: float, milestones=(), gamma: float = 0.1, **_):
    """Linear warmup until the first milestone, then step decay by gamma."""
    milestones = sorted(int(m) for m in milestones)
    first = milestones[0] if milestones else 0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = baseLr * jnp.clip(step / max(first, 1), 0.0, 1.0)
        decayPow = jnp.zeros(())
        for m in milestones:
            decayPow = decayPow + (step >= m).astype(jnp.float32)
        decayed = baseLr * (gamma ** decayPow)
        return jnp.where(step <= first, warm, decayed)
    return schedule


@LrSchedulerRegistry.register(key="CyclicLR")
def cyclicLR(baseLr: float, max_lr: float = None, step_size_up: int = 2000,
             step_size_down: int = None, mode: str = "triangular",
             gamma: float = 1.0, **_):
    """Triangular cyclic LR (reference `lrSchedulers.py:71-302`, CLR port)."""
    maxLr = max_lr if max_lr is not None else baseLr * 10
    down = step_size_down if step_size_down is not None else step_size_up
    total = step_size_up + down

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1 + step / total)
        pos = step - (cycle - 1) * total
        frac = jnp.where(pos < step_size_up, pos / step_size_up,
                         1.0 - (pos - step_size_up) / down)
        scale = jnp.where(jnp.asarray(mode == "triangular2"),
                          1.0 / (2.0 ** (cycle - 1)),
                          jnp.where(jnp.asarray(mode == "exp_range"),
                                    gamma ** step, 1.0))
        return baseLr + (maxLr - baseLr) * jnp.maximum(frac, 0.0) * scale
    return schedule


@LrSchedulerRegistry.register(key="CosineAnnealingWarmupRestarts")
def cosineAnnealingWarmupRestarts(baseLr: float, first_cycle_steps: int,
                                  cycle_mult: float = 1.0,
                                  lrScaleRatio: float = 0.001,
                                  warmup_steps: int = 0, gamma: float = 1.0, **_):
    """Warmup + cosine cycles with restarts (reference `lrSchedulers.py:306-481`).

    max lr decays by `gamma` per cycle; min lr = baseLr * lrScaleRatio.
    Only cycle_mult == 1 needs the closed form to stay jit-friendly;
    cycle_mult != 1 uses a log-based cycle solve.
    """
    minLr = baseLr * lrScaleRatio

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if cycle_mult == 1.0:
            cycle = jnp.floor(step / first_cycle_steps)
            stepInCycle = step - cycle * first_cycle_steps
            cycleSteps = jnp.asarray(first_cycle_steps, jnp.float32)
        else:
            # n: number of completed cycles; geometric cycle lengths.
            ratio = step * (cycle_mult - 1) / first_cycle_steps + 1
            cycle = jnp.floor(jnp.log(jnp.maximum(ratio, 1.0)) / math.log(cycle_mult))
            consumed = first_cycle_steps * (cycle_mult ** cycle - 1) / (cycle_mult - 1)
            stepInCycle = step - consumed
            cycleSteps = first_cycle_steps * (cycle_mult ** cycle)
        maxLr = baseLr * (gamma ** cycle)
        warm = minLr + (maxLr - minLr) * stepInCycle / max(warmup_steps, 1)
        cosine = minLr + (maxLr - minLr) * 0.5 * (
            1 + jnp.cos(jnp.pi * (stepInCycle - warmup_steps) /
                        jnp.maximum(cycleSteps - warmup_steps, 1.0)))
        return jnp.where(stepInCycle < warmup_steps, warm, cosine)
    return schedule


def getSchedule(key: str, baseLr: float, params: dict):
    return LrSchedulerRegistry.get(key)(baseLr, **params)


def scheduleFlatlineFraction(schedule, baseLr: float, startStep: int,
                             totalStep: int, samples: int = 256) -> float:
    """Fraction of the remaining [startStep, totalStep) budget whose lr is
    below 1% of baseLr.

    Guard for the observed-on-hardware trap (NOTES.md round-2): a cosine
    cycle sized smaller than the step budget (e.g. first_cycle_steps=600,
    TotalStep=2000, or a resume with a raised TotalStep) silently trains at
    lr~0 for most of the run. The reference accepts such configs silently
    too; its strict-config culture (config.py raises on unknown keys) says
    this deserves at least a loud warning.
    """
    import numpy as np
    if totalStep <= startStep:
        return 0.0
    steps = np.linspace(startStep, totalStep - 1, min(samples, totalStep - startStep))
    lrs = np.asarray([float(schedule(int(s))) for s in steps])
    return float(np.mean(lrs < 0.01 * abs(baseLr)))


def checkScheduleCoversBudget(schedule, baseLr: float, startStep: int,
                              totalStep: int, threshold: float = 0.25,
                              strict: bool = False) -> bool:
    """Warn (or raise under strict) when the schedule flatlines at ~0 for
    more than `threshold` of the remaining step budget. Returns True when
    the schedule is healthy."""
    import logging
    frac = scheduleFlatlineFraction(schedule, baseLr, startStep, totalStep)
    if frac <= threshold:
        return True
    msg = (f"LR schedule spends {frac:.0%} of the remaining budget "
           f"(steps {startStep}..{totalStep}) below 1% of the base lr "
           f"({baseLr:g}) — size the schedule (e.g. first_cycle_steps) to "
           "the final TotalStep, especially after a resume with a raised "
           "budget, or most of the run trains at lr~0.")
    if strict:
        raise ValueError(msg)
    logging.getLogger("mcquic_tpu.train").warning(msg)
    return False
