"""Differentiable image metrics (JAX): SSIM, MS-SSIM, PSNR.

Parity with reference `mcquic/validate/metrics.py:22-274` (hand-rolled
1-D-separable-gaussian ssim/ms_ssim, psnr). NHWC layout; separable depthwise
convolutions lower to cheap XLA reduce-windows on TPU.
"""
from typing import Sequence

import jax
import jax.numpy as jnp

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _fspecialGauss1d(size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def _gaussianFilter(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise gaussian blur, valid padding. x: [n,h,w,c]."""
    c = x.shape[-1]
    size = win.shape[0]
    kh = win.reshape(size, 1, 1, 1)
    kw = win.reshape(1, size, 1, 1)
    kh = jnp.tile(kh, (1, 1, 1, c))
    kw = jnp.tile(kw, (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c)
    return x


def _ssimPerChannel(x, y, win, dataRange: float, k1=0.01, k2=0.03):
    c1 = (k1 * dataRange) ** 2
    c2 = (k2 * dataRange) ** 2
    mu1 = _gaussianFilter(x, win)
    mu2 = _gaussianFilter(y, win)
    mu1Sq, mu2Sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1Sq = _gaussianFilter(x * x, win) - mu1Sq
    sigma2Sq = _gaussianFilter(y * y, win) - mu2Sq
    sigma12 = _gaussianFilter(x * y, win) - mu12
    csMap = (2 * sigma12 + c2) / (sigma1Sq + sigma2Sq + c2)
    ssimMap = ((2 * mu12 + c1) / (mu1Sq + mu2Sq + c1)) * csMap
    ssimVal = jnp.mean(ssimMap, axis=(1, 2))   # [n, c]
    cs = jnp.mean(csMap, axis=(1, 2))
    return ssimVal, cs


def ssim(x, y, dataRange: float = 255.0, winSize: int = 11, winSigma: float = 1.5,
         sizeAverage: bool = True):
    """SSIM over NHWC batches (reference metrics.py:90-130)."""
    win = _fspecialGauss1d(winSize, winSigma)
    val, _ = _ssimPerChannel(x.astype(jnp.float32), y.astype(jnp.float32), win, dataRange)
    val = jnp.mean(val, -1)
    return jnp.mean(val) if sizeAverage else val


def msSSIM(x, y, dataRange: float = 255.0, winSize: int = 11, winSigma: float = 1.5,
           weights: Sequence[float] = _MS_WEIGHTS, sizeAverage: bool = True):
    """Multi-scale SSIM (reference metrics.py:133-193)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    win = _fspecialGauss1d(winSize, winSigma)
    # Truncate scales for small images (each level halves; the gaussian needs
    # winSize pixels) and renormalize the weights.
    minSide = min(x.shape[1], x.shape[2])
    maxLevels = 1
    side = minSide
    while side // 2 >= winSize and maxLevels < len(weights):
        maxLevels += 1
        side //= 2
    weights = list(weights[:maxLevels])
    weights = [w / sum(weights) for w in weights]
    weightsArr = jnp.asarray(weights, jnp.float32)
    levels = len(weights)
    # Clamp to a small positive floor instead of 0: d(x^w)/dx at x=0 is inf,
    # which NaNs training the moment any scale's contrast term goes negative
    # (early training always does). Forward-value deviation vs the hard relu
    # is at most eps^w ≈ 0.3 in the (already ~0) negative-cs regime.
    floor = 1e-4
    mcs = []
    for i in range(levels):
        ssimVal, cs = _ssimPerChannel(x, y, win, dataRange)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, floor))
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                                      "VALID") / 4.0
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                                      "VALID") / 4.0
    ssimVal = jnp.maximum(ssimVal, floor)                        # [n, c]
    mcsStack = jnp.stack(mcs + [ssimVal])                        # [lv, n, c]
    out = jnp.prod(mcsStack ** weightsArr[:, None, None], 0)     # [n, c]
    out = jnp.mean(out, -1)
    return jnp.mean(out) if sizeAverage else out


def psnr(x, y, dataRange: float = 255.0, sizeAverage: bool = True):
    """PSNR in dB (reference metrics.py:258-274)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mse = jnp.mean((x - y) ** 2, axis=(1, 2, 3))
    val = 10 * jnp.log10((dataRange ** 2) / jnp.maximum(mse, 1e-12))
    return jnp.mean(val) if sizeAverage else val
