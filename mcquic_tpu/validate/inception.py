"""Inception Score handler (reference `validate/handlers.py:193-258`).

Computes IS = exp(E_x KL(p(y|x) || p(y))) over generated images using an
InceptionV3 classifier. Gated: InceptionV3 weights cannot be downloaded in
this environment; the handler accepts any callable `classifierFn:
uint8 [n,299,299,3] -> logits [n,1000]` (e.g. a flax port fed by converted
torchvision weights) and raises a clear error when none is provided.
"""
from typing import Callable, List, Optional

import numpy as np


class InceptionScoreHandler:
    def __init__(self, classifierFn: Optional[Callable] = None, splits: int = 10):
        if classifierFn is None:
            # auto-assemble the flax InceptionV3 when torchvision weights are
            # locatable (MCQUIC_INCEPTION_WEIGHTS), mirroring the LPIPS gate
            from mcquic_tpu.validate.inception_v3 import makeInceptionClassifier
            classifierFn = makeInceptionClassifier()
        self._classifierFn = classifierFn
        self._splits = splits
        self._probs: List[np.ndarray] = []

    def reset(self):
        self._probs = []

    def __call__(self, *, restored, **_):
        if self._classifierFn is None:
            raise RuntimeError(
                "InceptionScore needs a classifier: pass classifierFn "
                "(InceptionV3 weights are not bundled — convert torchvision's "
                "inception_v3 where available).")
        imgs = self._resize(restored)
        logits = np.asarray(self._classifierFn(imgs))
        e = np.exp(logits - logits.max(-1, keepdims=True))
        self._probs.append(e / e.sum(-1, keepdims=True))

    @staticmethod
    def _resize(imgs: np.ndarray, size: int = 299) -> np.ndarray:
        from PIL import Image
        out = np.stack([np.asarray(Image.fromarray(im).resize((size, size),
                                                              Image.BILINEAR))
                        for im in imgs])
        return out

    def result(self) -> float:
        """IS mean over splits (reference handlers.py:240-256 construction)."""
        if not self._probs:
            return float("nan")
        probs = np.concatenate(self._probs, 0)
        n = probs.shape[0]
        scores = []
        for part in np.array_split(probs, min(self._splits, n)):
            marginal = part.mean(0, keepdims=True)
            kl = (part * (np.log(part + 1e-12) - np.log(marginal + 1e-12))).sum(-1)
            scores.append(float(np.exp(kl.mean())))
        return float(np.mean(scores))
