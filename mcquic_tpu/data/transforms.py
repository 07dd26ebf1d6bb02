"""Image alignment + training/eval transform pipelines.

Parity with reference `mcquic/data/transforms.py`:
  * `alignedPadding` (`transforms.py:81-99`): reflect-pad H/W up to multiples
    of `base` (default 128), centered.
  * `alignedCrop` (`transforms.py:57-78`): center-crop H/W down to multiples.
  * train transform (`transforms.py:37-43`): planckian jitter + flips +
    normalize — implemented as a jittable batch function (device-side, as the
    reference runs them on GPU) in data/augment.py.

These run host-side on numpy (shape-dependent) or as static-shape jnp ops.
"""
from typing import Tuple

import numpy as np


def paddingAmounts(h: int, w: int, base: int = 128) -> Tuple[int, int, int, int]:
    """(top, bottom, left, right) reflect-padding to multiples of base."""
    hPad = (-h) % base
    wPad = (-w) % base
    top = hPad // 2
    left = wPad // 2
    return top, hPad - top, left, wPad - left


def alignedPadding(x: np.ndarray, base: int = 128) -> np.ndarray:
    """Reflect-pad [n,h,w,c] (or [h,w,c]) to H/W multiples of base, centered."""
    h, w = x.shape[-3], x.shape[-2]
    top, bottom, left, right = paddingAmounts(h, w, base)
    if top == bottom == left == right == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 3) + [(top, bottom), (left, right), (0, 0)]
    return np.pad(x, pad, mode="reflect")


def alignedCrop(x: np.ndarray, base: int = 128) -> np.ndarray:
    """Center-crop [..., h, w, c] to H/W multiples of base."""
    h, w = x.shape[-3], x.shape[-2]
    hCrop = h - (h // base) * base
    wCrop = w - (w // base) * base
    top = hCrop // 2
    left = wCrop // 2
    return x[..., top:top + (h - hCrop), left:left + (w - wCrop), :]


def centerCropTo(x: np.ndarray, h: int, w: int) -> np.ndarray:
    """Center-crop padded output back to the original size
    (reference compressor.py:96-112 decompress cropping)."""
    H, W = x.shape[-3], x.shape[-2]
    top = (H - h) // 2
    left = (W - w) // 2
    return x[..., top:top + h, left:left + w, :]


def imageToModelInput(img: np.ndarray) -> np.ndarray:
    """uint8 HWC (or NHWC) image -> float32 in [-1, 1] (demo.py:109-122)."""
    x = img.astype(np.float32) / 255.0
    return (x - 0.5) * 2.0


def modelOutputToImage(x: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8, matching reference DeTransform (vision.py:135-146)."""
    return np.clip(np.round((x * 0.5 + 0.5) * 255.0), 0, 255).astype(np.uint8)
