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
from mcquic_tpu.validate.metrics import msSSIM, psnr


def visualizeCodeMaps(codes) -> list:
    """Code-index maps -> uint8 RGB images (reference visualizeIntermediate,
    validator.py:30-38): indices are hashed into hues so neighboring codes
    get distinct colors; one image per (level, group)."""
    import colorsys
    out = []
    for code in codes:  # [n, m, h, w]
        n, m, h, w = code.shape
        for g in range(m):
            idx = code[:, g].astype(np.int64)
            hue = (idx * 0.61803398875) % 1.0
            rgb = np.stack([np.vectorize(lambda x, c=c: colorsys.hsv_to_rgb(x, 0.8, 0.95)[c])(hue)
                            for c in range(3)], -1)
            out.append((rgb * 255).astype(np.uint8))
    return out


class Validator:
    def __init__(self, engine: CompressorEngine):
        self._engine = engine

    def validate(self, valLoader) -> dict:
        """valLoader: generator yielding (uint8 [1,h,w,3], stem)."""
        msssims, psnrs, bpps, idealBpps = [], [], [], []
        total = 0
        for batch, stem in valLoader():
            x = imageToModelInput(batch)
            codes, binaries, headers = self._engine.compress(x)
            restored = self._engine.decompress(binaries, headers)
            restoredU8 = modelOutputToImage(restored)
            a = batch.astype(np.float32)
            b = restoredU8.astype(np.float32)
            msssims.append(float(msSSIM(a, b, dataRange=255.0)))
            psnrs.append(float(psnr(a, b, dataRange=255.0)))
            pixels = headers[0].ImageSize.Pixels
            bpps.append(sum(len(bin) for bin in binaries[0]) * 8 / pixels)
            idealBpps.append(self._idealBpp(codes, pixels))
            total += 1
        return {
            "images": total,
            "msssim": float(np.mean(msssims)),
            "psnr": float(np.mean(psnrs)),
            "bpp": float(np.mean(bpps)),
            "idealBpp": float(np.mean(idealBpps)),
        }

    def _idealBpp(self, codes, pixels: int) -> float:
        """Empirical per-level entropy estimate (reference handlers.py:110-190)."""
        totalBits = 0.0
        freqs = self._engine.coder.NormalizedFreq
        for code, freq in zip(codes, freqs):
            # code [n,m,h,w]; freq [m,k]
            m = code.shape[1]
            for g in range(m):
                p = np.maximum(freq[g], 1e-12)
                sym = code[:, g].ravel()
                totalBits += float(np.sum(-np.log2(p[sym])))
        return totalBits / (pixels * codes[0].shape[0])

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
