"""Device-side batch augmentation (jittable).

Parity with reference GPU-side training transform (`data/transforms.py:37-43`):
RandomPlanckianJitter(p=1.0) + RandomHorizontalFlip + RandomVerticalFlip +
Normalize(0.5, 0.5), plus the CPU-side RandomGamma (`transforms.py:14-35`)
also expressed as a jittable op. The planckian coefficient table is the
published blackbody-locus data (Kornia, Apache-2.0), reproduced as physical
constants (reference `utils/vision.py:24-81`).
"""
import jax
import jax.numpy as jnp
import numpy as np

_PLANCKIAN_COEFFS = np.array([
    [0.6743, 0.4029, 0.0013], [0.6281, 0.4241, 0.1665], [0.5919, 0.4372, 0.2513],
    [0.5623, 0.4457, 0.3154], [0.5376, 0.4515, 0.3672], [0.5163, 0.4555, 0.4103],
    [0.4979, 0.4584, 0.4468], [0.4816, 0.4604, 0.4782], [0.4672, 0.4619, 0.5053],
    [0.4542, 0.4630, 0.5289], [0.4426, 0.4638, 0.5497], [0.4320, 0.4644, 0.5681],
    [0.4223, 0.4648, 0.5844], [0.4135, 0.4651, 0.5990], [0.4054, 0.4653, 0.6121],
    [0.3980, 0.4654, 0.6239], [0.3911, 0.4655, 0.6346], [0.3847, 0.4656, 0.6444],
    [0.3787, 0.4656, 0.6532], [0.3732, 0.4656, 0.6613], [0.3680, 0.4655, 0.6688],
    [0.3632, 0.4655, 0.6756], [0.3586, 0.4655, 0.6820], [0.3544, 0.4654, 0.6878],
    [0.3503, 0.4653, 0.6933], [0.5829, 0.4421, 0.2288], [0.5510, 0.4514, 0.2948],
    [0.5246, 0.4576, 0.3488], [0.5021, 0.4618, 0.3941], [0.4826, 0.4646, 0.4325],
    [0.4654, 0.4667, 0.4654], [0.4502, 0.4681, 0.4938], [0.4364, 0.4692, 0.5186],
    [0.4240, 0.4700, 0.5403], [0.4127, 0.4705, 0.5594], [0.4023, 0.4709, 0.5763],
    [0.3928, 0.4713, 0.5914], [0.3839, 0.4715, 0.6049], [0.3757, 0.4716, 0.6171],
    [0.3681, 0.4717, 0.6281], [0.3609, 0.4718, 0.6380], [0.3543, 0.4719, 0.6472],
    [0.3480, 0.4719, 0.6555], [0.3421, 0.4719, 0.6631], [0.3365, 0.4719, 0.6702],
    [0.3313, 0.4719, 0.6766], [0.3263, 0.4719, 0.6826], [0.3217, 0.4719, 0.6882],
], dtype=np.float32)

# (r/g, b/g) per illuminant, as the reference uses (vision.py:76-81).
# Kept as numpy on purpose: a module-level jnp array would be created under
# whatever trace/backend is active at first import (tracer-leak hazard when
# this module is imported lazily inside a jitted function).
_PLANCKIAN_RATIO = np.stack([_PLANCKIAN_COEFFS[:, 0] / _PLANCKIAN_COEFFS[:, 1],
                             _PLANCKIAN_COEFFS[:, 2] / _PLANCKIAN_COEFFS[:, 1]], 1)


def planckianJitter(key, x, p: float = 1.0):
    """x: [n,h,w,3] in [0,1]; random blackbody white-balance shift."""
    n = x.shape[0]
    kApply, kPick = jax.random.split(key)
    apply = jax.random.uniform(kApply, (n,)) < p
    idx = jax.random.randint(kPick, (n,), 0, _PLANCKIAN_RATIO.shape[0])
    coeffs = jnp.asarray(_PLANCKIAN_RATIO)[idx]          # [n, 2]
    rW = jnp.where(apply, coeffs[:, 0], 1.0)[:, None, None]
    bW = jnp.where(apply, coeffs[:, 1], 1.0)[:, None, None]
    r = x[..., 0] * rW
    g = x[..., 1]
    b = x[..., 2] * bW
    return jnp.clip(jnp.stack([r, g, b], -1), 0.0, 1.0)


def randomFlips(key, x, pH: float = 0.5, pV: float = 0.5):
    """Batch-wise independent horizontal/vertical flips (vision.py:150-197)."""
    kH, kV = jax.random.split(key)
    n = x.shape[0]
    doH = jax.random.uniform(kH, (n, 1, 1, 1)) < pH
    doV = jax.random.uniform(kV, (n, 1, 1, 1)) < pV
    x = jnp.where(doH, x[:, :, ::-1], x)
    x = jnp.where(doV, x[:, ::-1], x)
    return x


def srgbToLinear(x):
    return jnp.where(x < 0.0031308, 12.92 * x,
                     1.055 * jnp.power(jnp.abs(x), 1 / 2.4) - 0.055)


def linearToSrgb(x):
    return jnp.where(x < 0.04045, x / 12.92,
                     jnp.power(jnp.abs(x + 0.055) / 1.055, 2.4))


def randomGamma(key, x):
    """Pick one of {srgb->linear, linear->srgb, pow(gamma), identity}
    (vision.py:121-129)."""
    kChoice, kGamma = jax.random.split(key)
    choice = jax.random.randint(kChoice, (), 0, 4)
    gamma = jax.random.uniform(kGamma, ()) * 1.95 + 0.05
    branches = [
        lambda x: srgbToLinear(x),
        lambda x: linearToSrgb(x),
        lambda x: jnp.clip(jnp.power(jnp.maximum(x, 0.0), gamma), 0.0, 1.0),
        lambda x: x,
    ]
    return jax.lax.switch(choice, branches, x)


def trainingTransform(key, batchUint8, gen: bool = False):
    """uint8 [n,h,w,3] -> augmented float32 [-1,1] (transforms.py:37-43)."""
    x = batchUint8.astype(jnp.float32) / 255.0
    k1, k2, k3 = jax.random.split(key, 3)
    x = randomGamma(k1, x)
    x = planckianJitter(k2, x, p=1.0)
    if not gen:
        x = randomFlips(k3, x)
    return (x - 0.5) / 0.5


def randomAutocontrast(key, x, p: float = 0.5):
    """Per-image random autocontrast on [0,1] floats (vision.py RandomAutocontrast)."""
    n = x.shape[0]
    lo = jnp.min(x, axis=(1, 2), keepdims=True)
    hi = jnp.max(x, axis=(1, 2), keepdims=True)
    scale = jnp.where(hi - lo > 1e-6, 1.0 / jnp.maximum(hi - lo, 1e-6), 1.0)
    stretched = jnp.clip((x - lo) * scale, 0.0, 1.0)
    apply = jax.random.uniform(key, (n, 1, 1, 1)) < p
    return jnp.where(apply, stretched, x)


def patchWiseErasing(key, x, patch: int = 32, rate: float = 0.1, value: float = 0.0):
    """Randomly zero out patch-aligned blocks (vision.py:241-260 PatchWiseErasing)."""
    n, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    mask = jax.random.uniform(key, (n, gh, gw, 1)) < rate
    mask = jnp.repeat(jnp.repeat(mask, patch, 1), patch, 2)
    return jnp.where(mask, value, x)


def masking(key, x, rate: float = 0.5, value: float = 0.0):
    """Per-pixel random masking (vision.py Masking)."""
    keep = jax.random.uniform(key, x.shape[:3] + (1,)) >= rate
    return jnp.where(keep, x, value)


def evalTransform(x):
    """float/uint8 -> [-1,1] (transforms.py:49-54, crop handled by caller)."""
    x = x.astype(jnp.float32)
    x = jnp.where(jnp.max(x) > 1.5, x / 255.0, x)
    return (x - 0.5) / 0.5
