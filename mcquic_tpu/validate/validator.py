"""Validator: real-coder eval loop + speed harness.

Parity with reference `mcquic/validate/validator.py`:
  * `validate` (`validator.py:40-58`): run every val image through the real
    compress→decompress path; report MS-SSIM, PSNR (on uint8 domain), BPP
    from actual binary lengths (handlers.py:45-58), and ideal BPP (the
    empirical entropy bound, handlers.py:110-190).
  * `speed` (`validator.py:60-97`): 50 iters x (10,768,512) batch through
    compress/decompress, wall-clocked with block_until_ready (the TPU stand-in
    for CUDA events) → Mpps.
"""
import time

import numpy as np

from mcquic_tpu.data.transforms import imageToModelInput, modelOutputToImage
from mcquic_tpu.models.engine import CompressorEngine
from mcquic_tpu.validate.handlers import (BPPHandler, IdealBPPHandler,
                                          ImageCollector, Meters,
                                          MsSSIMHandler, PSNRHandler)


def _hsvToRgbVec(hue: np.ndarray, s: float = 0.8, v: float = 0.95) -> np.ndarray:
    """Vectorized HSV->RGB at fixed saturation/value: [...] hue -> [..., 3]."""
    h6 = (hue % 1.0) * 6.0
    sector = np.floor(h6).astype(np.int64) % 6
    f = h6 - np.floor(h6)
    p = np.full_like(f, v * (1.0 - s))
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    vv = np.full_like(f, v)
    # per-sector channel pick: rows are (r,g,b) for sectors 0..5
    table = np.stack([np.stack([vv, t, p], -1), np.stack([q, vv, p], -1),
                      np.stack([p, vv, t], -1), np.stack([p, q, vv], -1),
                      np.stack([t, p, vv], -1), np.stack([vv, p, q], -1)])
    return np.take_along_axis(table, sector[None, ..., None], axis=0)[0]


def visualizeCodeMaps(codes) -> list:
    """Code-index maps -> uint8 RGB images (reference visualizeIntermediate,
    validator.py:30-38): indices are hashed into hues so neighboring codes
    get distinct colors; one image per (level, group). Fully vectorized
    (the per-pixel colorsys loop was O(pixels) Python)."""
    out = []
    for code in codes:  # [n, m, h, w]
        n, m, h, w = code.shape
        for g in range(m):
            idx = code[:, g].astype(np.int64)
            hue = (idx * 0.61803398875) % 1.0
            rgb = _hsvToRgbVec(hue)
            out.append((rgb * 255).astype(np.uint8))
    return out


class Validator:
    def __init__(self, engine: CompressorEngine, collectImages: int = 16):
        self._engine = engine
        self._meters = Meters({"msssim": MsSSIMHandler(), "psnr": PSNRHandler(),
                               "bpp": BPPHandler(), "idealBpp": IdealBPPHandler()})
        self._collector = ImageCollector(maxItems=collectImages)
        # post-validate observability payload: image pairs + last codes
        # (reference wandb image/code-map logging, trainer.py:463-493)
        self.collected: dict = {"pairs": [], "codes": None}

    def validate(self, valLoader) -> dict:
        """valLoader: generator yielding (uint8 [1,h,w,3], stem)."""
        self._meters.reset()
        self._collector.reset()
        total = 0
        codes = None
        for batch, stem in valLoader():
            x = imageToModelInput(batch)
            codes, binaries, headers = self._engine.compress(x)
            restored = self._engine.decompress(binaries, headers)
            restoredU8 = modelOutputToImage(restored)
            pixels = headers[0].ImageSize.Pixels
            kwargs = dict(images=batch, restored=restoredU8,
                          binaries=binaries[0], pixels=pixels, codes=codes,
                          normalizedFreqs=self._engine.coder.NormalizedFreq,
                          batch=codes[0].shape[0])
            self._meters(**kwargs)
            self._collector(**kwargs)
            total += 1
        self.collected = {"pairs": self._collector.result(), "codes": codes}
        return {"images": total, **self._meters.results()}

    def speed(self, iters: int = 50, batch: int = 10, h: int = 768, w: int = 512):
        """(encodeMpps, decodeMpps) under the reference protocol."""
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (batch, h, w, 3)).astype(np.float32)
        # warm up
        codes, binaries, headers = self._engine.compress(x)
        self._engine.decompress(binaries, headers)

        t0 = time.perf_counter()
        for _ in range(iters):
            codes, binaries, headers = self._engine.compress(x)
        tEnc = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(iters):
            self._engine.decompress(binaries, headers)
        tDec = time.perf_counter() - t0

        pixels = iters * batch * h * w
        return pixels / tEnc / 1e6, pixels / tDec / 1e6
