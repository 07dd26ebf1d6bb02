"""Training losses.

Parity with reference `mcquic/loss/__init__.py`:
  * `MsSSIM` distortion: `1 - msssim(xHat+1, x+1)` with data_range 2 and
    Decibel(1.0) formatting (`loss/__init__.py:47-55`).
  * `PSNR` distortion: plain MSE with Decibel(2.0) formatting (`:57-62`).
  * `BasicRate`: cosine inter-codeword repulsion penalty (`:27-44`).
"""
from typing import Callable, Sequence

import jax.numpy as jnp

from mcquic_tpu.utils.registry import LossRegistry
from mcquic_tpu.validate.metrics import msSSIM


def decibel(upperBound: float) -> Callable:
    """Format a distortion loss in dB (reference validate/utils.py:6-12)."""
    ub2 = upperBound ** 2

    def fmt(x):
        return -10 * jnp.log10(jnp.maximum(x / ub2, 1e-12))

    return fmt


class Distortion:
    formatDistortion = staticmethod(lambda x: x)

    def __call__(self, restored, image, codes=None, logits=None):
        raise NotImplementedError


@LossRegistry.register
class MsSSIM(Distortion):
    formatDistortion = staticmethod(decibel(1.0))

    def __call__(self, restored, image, codes=None, logits=None):
        return 1.0 - msSSIM(restored + 1, image + 1, dataRange=2.0)


@LossRegistry.register
class PSNR(Distortion):
    formatDistortion = staticmethod(decibel(2.0))

    def __call__(self, restored, image, codes=None, logits=None):
        return jnp.mean((restored - image) ** 2)


class BasicRate:
    """gamma * sum of positive off-diagonal codeword cosines (loss/__init__.py:27-44)."""

    def __init__(self, gamma: float = 0.0):
        self._gamma = gamma

    def __call__(self, logits, codebooks: Sequence[jnp.ndarray]):
        if self._gamma == 0.0:
            return jnp.asarray(0.0)
        total = 0.0
        for codebook in codebooks:
            for c in codebook:  # [k, d] per group
                pairwise = c @ c.T
                norm = jnp.sum(c * c, -1)
                cos = pairwise / jnp.sqrt(norm[:, None] * norm)
                upper = jnp.triu(jnp.clip(cos, 0.0, 2.0), 1)
                total = total + jnp.sum(upper)
        return self._gamma * total
