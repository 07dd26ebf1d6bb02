"""Training hook system.

Parity with reference `mcquic/train/hooks.py`: phase-typed hooks assembled
from the config's `hooks:` list via the HookRegistry (`hooks.py:19-68,
182-256`), with the builtin `CodebookReassign` (`:100-121`). Hooks are plain
callables `(trainer, step) -> None` dispatched at their phase.
"""
import enum
import logging
from typing import Callable, Dict, List

from mcquic_tpu.utils.registry import HookRegistry

logger = logging.getLogger("mcquic_tpu.hooks")


class HookType(enum.Enum):
    BeforeRunHook = "beforeRun"
    AfterRunHook = "afterRun"
    EpochStartHook = "epochStart"
    EpochFinishHook = "epochFinish"
    StepStartHook = "stepStart"
    StepFinishHook = "stepFinish"


class FrequencyHook:
    """Run `fn(trainer, step)` every `freq` steps (reference EpochFrequencyHook,
    train/utils.py:363-366)."""

    def __init__(self, fn: Callable, freq: int):
        self._fn = fn
        self._freq = max(int(freq), 1)

    def __call__(self, trainer, step: int):
        if step % self._freq == 0:
            self._fn(trainer, step)


@HookRegistry.register
class CodebookReassign:
    """Dead-codeword reassignment every `freq` steps (hooks.py:100-121)."""

    hookType = HookType.StepFinishHook

    def __init__(self, freq: int = 10000):
        self._freq = max(int(freq), 1)

    def __call__(self, trainer, step: int):
        if step % self._freq != 0:
            return
        # Never reassign on the terminal step: the checkpoint is written
        # immediately after, so the perturbed codebook/frequency tables ship
        # with no training left to re-adapt them (measured on hardware: a
        # reassign at step==totalStep regressed the exported model's rate
        # 0.111 -> 0.138 bpp at unchanged PSNR; docs/RD_RESULTS_r03.md).
        if step >= getattr(trainer, "totalStep", step + 1):
            logger.info("step %d: skipping codebook reassignment on the "
                        "terminal step (checkpoint ships un-readapted)", step)
            return
        prop = trainer.reassignCodebooks()
        logger.info("step %d: codebook reassigned, proportion=%.4f", step, prop)


def getAllHooks(hookConfigs) -> Dict[HookType, List[Callable]]:
    """Assemble hooks grouped by phase from `General{key, params}` configs
    (reference splitHooks/getAllHooks, hooks.py:182-256)."""
    out: Dict[HookType, List[Callable]] = {t: [] for t in HookType}
    for cfg in hookConfigs or []:
        if cfg.Key not in HookRegistry:
            logger.warning("Unknown hook %s ignored", cfg.Key)
            continue
        hook = HookRegistry.get(cfg.Key)(**cfg.Params)
        phase = getattr(hook, "hookType", HookType.StepFinishHook)
        out[phase].append(hook)
    return out
