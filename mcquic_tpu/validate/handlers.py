"""Validation meters.

Parity with reference `mcquic/validate/handlers.py` (vlutils Meters handlers:
MsSSIM, PSNR, BPP `:45-58`, Visualization, IdealBPP `:110-190`): simple
accumulate/summary handlers the Validator drives per image.
"""
from typing import Dict, List

import numpy as np

from mcquic_tpu.validate.metrics import msSSIM, psnr


class Handler:
    """Accumulates per-batch results; `.result()` is the running mean."""

    def __init__(self):
        self._values: List[float] = []

    def reset(self):
        self._values = []

    def result(self) -> float:
        return float(np.mean(self._values)) if self._values else float("nan")

    def __call__(self, **kwargs):
        raise NotImplementedError


class MsSSIMHandler(Handler):
    """uint8-domain MS-SSIM (reference handlers.py MsSSIM)."""

    def __call__(self, *, images, restored, **_):
        self._values.append(float(msSSIM(images.astype(np.float32),
                                         restored.astype(np.float32),
                                         dataRange=255.0)))


class PSNRHandler(Handler):
    """dB on uint8 domain (reference handlers.py PSNR)."""

    def __call__(self, *, images, restored, **_):
        self._values.append(float(psnr(images.astype(np.float32),
                                       restored.astype(np.float32),
                                       dataRange=255.0)))


class BPPHandler(Handler):
    """Actual-binary-length bits per pixel (reference handlers.py:45-58)."""

    def __call__(self, *, binaries, pixels, **_):
        self._values.append(sum(len(b) for b in binaries) * 8 / pixels)


class IdealBPPHandler(Handler):
    """Empirical per-level entropy bound (reference handlers.py:110-190)."""

    def __call__(self, *, codes, normalizedFreqs, pixels, batch=1, **_):
        totalBits = 0.0
        for code, freq in zip(codes, normalizedFreqs):
            m = code.shape[1]
            for g in range(m):
                p = np.maximum(freq[g], 1e-12)
                sym = code[:, g].ravel()
                totalBits += float(np.sum(-np.log2(p[sym])))
        self._values.append(totalBits / (pixels * batch))


class ImageCollector(Handler):
    """Collects (original, restored) pairs for visual logging
    (reference handlers.py ImageCollector/Visualization)."""

    def __init__(self, maxItems: int = 16):
        super().__init__()
        self._maxItems = maxItems
        self._images: List = []

    def reset(self):
        super().reset()
        self._images = []

    def __call__(self, *, images, restored, **_):
        if len(self._images) < self._maxItems:
            self._images.append((np.asarray(images[0]), np.asarray(restored[0])))

    def result(self):
        return self._images


class Meters:
    """Named handler collection (vlutils Meters shape)."""

    def __init__(self, handlers: Dict[str, Handler]):
        self._handlers = handlers

    def reset(self):
        for h in self._handlers.values():
            h.reset()

    def __call__(self, **kwargs):
        for h in self._handlers.values():
            h(**kwargs)

    def results(self) -> Dict[str, float]:
        return {name: h.result() for name, h in self._handlers.items()}

    def summary(self) -> str:
        return " | ".join(f"{k}: {v:.4f}" for k, v in self.results().items())
