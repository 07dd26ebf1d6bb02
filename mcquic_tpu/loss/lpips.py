"""LPIPS perceptual loss (VGG16 backbone) in flax.

Parity with reference `mcquic/loss/lpips.py` (vendored VGG16-LPIPS with
bundled `lpips_vgg.pth` weights): five conv-stage feature taps, unit-
normalized channel features, learned 1x1 linear heads, spatial averaging.

This environment has no network egress, so weights are not bundled; use
`convertTorchLpips(pthPath)` to convert the reference's checkpoint (torch is
available CPU-side) into a params tree, or train-time code falls back to
lpipsWeight=0 with a warning when no weights are provided.
"""
import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

logger = logging.getLogger("mcquic_tpu.lpips")

# VGG16 conv plan: (channels, convs per stage); taps after each stage's ReLU.
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        idx = 0
        for stage, (ch, convs) in enumerate(_VGG_STAGES):
            for c in range(convs):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            taps.append(x)
            if stage < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Perceptual distance; inputs NHWC in [-1, 1]."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        xN = (x - shift) / scale
        yN = (y - shift) / scale
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fx = vgg(xN)
        fy = vgg(yN)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          name=f"lin{i}")(diff)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return jnp.mean(total)


def _bilinearResize(x, hw=(224, 224)):
    return jax.image.resize(x, (x.shape[0], *hw, x.shape[-1]), "bilinear")


def makeLpipsFn(params: Optional[dict], dtype=jnp.float32):
    """Returns lpips(xHat, x) -> scalar at 224x224 (reference compound.py:38-41),
    or None when no weights are available."""
    if params is None:
        logger.warning("LPIPS weights unavailable; perceptual term disabled "
                       "(provide a converted lpips params tree to enable).")
        return None
    module = LPIPS(dtype=dtype)

    def fn(xHat, x):
        return module.apply({"params": params},
                            _bilinearResize(xHat), _bilinearResize(x))

    return fn


def convertTorchLpips(linPthPath: str, vggStateDictPath: Optional[str] = None) -> dict:
    """Convert reference LPIPS weights into a flax params tree.

    The reference's bundled `lpips_vgg.pth` holds only the five `linN` 1x1
    heads (`loss/lpips.py:13-56`); the VGG16 backbone is torchvision's
    pretrained `vgg16` (downloaded at install time). Pass that state dict via
    `vggStateDictPath` when available; without it the backbone stays at init
    and the caller should disable the perceptual term.
    """
    import torch

    def toKernel(w):  # torch OIHW -> flax HWIO
        return np.transpose(w.numpy(), (2, 3, 1, 0))

    params: dict = {}
    sd = torch.load(linPthPath, map_location="cpu")
    linKeys = sorted(k for k in sd if "lin" in k and k.endswith(".weight"))
    for i, k in enumerate(linKeys):
        params[f"lin{i}"] = {"kernel": toKernel(sd[k])}

    if vggStateDictPath is not None:
        vsd = torch.load(vggStateDictPath, map_location="cpu")
        convKeys = sorted(
            (k for k in vsd if k.startswith("features.") and k.endswith(".weight")
             and vsd[k].dim() == 4),
            key=lambda k: int(k.split(".")[1]))
        vgg = {}
        for i, k in enumerate(convKeys):
            vgg[f"conv{i}"] = {"kernel": toKernel(vsd[k]),
                               "bias": vsd[k.replace(".weight", ".bias")].numpy()}
        params["vgg"] = vgg
    return params
