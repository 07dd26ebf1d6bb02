"""Metrics sinks: wandb (optional) + EMA display smoothing.

Parity with the reference observability surface (`trainer.py:319-344,
430-493`): wandb projects mcquic-stage-1/2, scalar losses/lr/grad-norm,
per-level code-frequency histograms, code usage. wandb is optional in this
environment; the logger degrades to the Python logging module.
"""
import logging
from typing import Optional

import numpy as np

logger = logging.getLogger("mcquic_tpu.metrics")


class EMATracker:
    """Display smoothing (reference validate/utils.py:15-28)."""

    def __init__(self, momentum: float = 0.9):
        self._momentum = momentum
        self._value: Optional[float] = None

    def step(self, x: float) -> float:
        if self._value is None:
            self._value = float(x)
        else:
            self._value = self._momentum * self._value + (1 - self._momentum) * float(x)
        return self._value

    @property
    def Value(self) -> Optional[float]:
        return self._value


class MetricsLogger:
    """wandb when available, stdlib logging always."""

    def __init__(self, project: str = "mcquic-stage-1", config: Optional[dict] = None,
                 enabled: bool = True):
        self._wandb = None
        if enabled:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=project, config=config or {})
            except Exception:
                logger.info("wandb unavailable; falling back to stdlib logging")
        self._ema = EMATracker()

    def log(self, step: int, metrics: dict):
        if "loss" in metrics:
            metrics = dict(metrics)
            metrics["lossSmooth"] = self._ema.step(metrics["loss"])
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        logger.info("step %d %s", step, {k: round(float(v), 5)
                                         for k, v in metrics.items()
                                         if np.isscalar(v) or getattr(v, "ndim", 1) == 0})

    def histogram(self, step: int, name: str, values):
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Histogram(np.asarray(values))}, step=step)

    def images(self, step: int, name: str, images):
        """Log a list of uint8 HWC arrays (reference raw/restored grids and
        code-map visualizations, trainer.py:463-493)."""
        if self._wandb is not None:
            self._wandb.log({name: [self._wandb.Image(np.asarray(img))
                                    for img in images]}, step=step)
        else:
            logger.info("step %d %s: %d image(s)", step, name, len(images))

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
