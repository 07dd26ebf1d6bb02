"""Compound loss assembly.

Parity with reference `mcquic/modules/compound.py:18-68`: bundles the
compressor forward with distortion + MSE + LPIPS(224-bilinear) terms and the
codebook-refresh entry point. In this functional build, the bundling lives in
`train.state.makeTrainStep` (the jitted step computes all three terms) and
refresh in `train.state.refreshCodebooks`; this module provides the same
surface as an object for API-compatible callers.
"""
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mcquic_tpu.loss import Distortion


class Compound:
    def __init__(self, module, distortion: Distortion,
                 lpipsFn: Optional[Callable] = None):
        self._module = module
        self._distortion = distortion
        self._lpipsFn = lpipsFn

    @property
    def Compressor(self):
        return self._module

    def __call__(self, variables, x, rngGumbel, train: bool = True):
        """Returns (xHat, (distortion, mse, lpips), codes, logits[, newCoder])."""
        out = self._module.apply(
            variables, x, train=train, rngs={"gumbel": rngGumbel},
            mutable=["coder"] if train else False)
        if train:
            (xHat, yHat, codes, logits), mut = out
        else:
            xHat, yHat, codes, logits = out
            mut = None
        distortion = self._distortion(xHat, x, codes, logits)
        mse = jnp.mean((xHat - x) ** 2)
        lpips = self._lpipsFn(xHat, x) if self._lpipsFn is not None else jnp.asarray(0.0)
        return xHat, (distortion, mse, lpips), codes, logits, mut

    def formatDistortion(self, loss):
        return self._distortion.formatDistortion(loss)
