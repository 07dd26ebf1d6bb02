"""LPIPS perceptual loss (VGG16 backbone) in flax.

Parity with reference `mcquic/loss/lpips.py` (vendored VGG16-LPIPS with
bundled `lpips_vgg.pth` weights): five conv-stage feature taps, unit-
normalized channel features, learned 1x1 linear heads, spatial averaging.

The reference bundles only the five 1x1 `linN` heads (`loss/lpips_vgg.pth`,
7 KB); those are converted and shipped here as `lpips_lin.npz`. The VGG16
backbone is torchvision's pretrained `vgg16` (downloaded at the reference's
install time) and has no offline source in this environment: provide it via
the `MCQUIC_VGG16_WEIGHTS` env var (path to a torch state dict) or
`~/.cache/mcquic_tpu/vgg16.pth`. Without the backbone the trainer falls back
to lpipsWeight=0 with a loud one-time warning (the published objective
weights this term 2x, reference trainer.py:276).
"""
import logging
import os
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


BUNDLED_LIN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "lpips_lin.npz")
_warnedOnce = False


def loadBundledLinHeads() -> dict:
    """The reference's bundled lin heads (loss/lpips_vgg.pth), pre-converted
    to flax HWIO at build time (see convertTorchLpips)."""
    data = np.load(BUNDLED_LIN)
    return {name: {"kernel": data[name]} for name in data.files}


def findVggWeights() -> Optional[str]:
    """Locate a torchvision-style VGG16 state dict (features.N.{weight,bias})."""
    candidates = [os.environ.get("MCQUIC_VGG16_WEIGHTS", "")]
    candidates.append(os.path.expanduser("~/.cache/mcquic_tpu/vgg16.pth"))
    for path in candidates:
        if path and os.path.exists(path):
            return path
    return None


def convertVggStateDict(vsd) -> dict:
    """torchvision `vgg16().state_dict()` (or its `features.` subset) ->
    flax VGG16Features params."""
    def toKernel(w):
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    convKeys = sorted(
        (k for k in vsd if k.startswith("features.") and k.endswith(".weight")
         and getattr(vsd[k], "ndim", len(getattr(vsd[k], "shape", ()))) == 4),
        key=lambda k: int(k.split(".")[1]))
    vgg = {}
    for i, key in enumerate(convKeys):
        vgg[f"conv{i}"] = {"kernel": toKernel(vsd[key]),
                           "bias": np.asarray(vsd[key.replace(".weight", ".bias")])}
    return vgg


def makeProxyLpipsFn(dtype=jnp.float32, seed: int = 3407):
    """Random-feature perceptual proxy: the LPIPS architecture with a SEEDED
    random VGG16 backbone and channel-averaging (uniform) lin heads.

    Untrained/random deep features are a known, surprisingly strong perceptual
    distance (Amir & Weiss 2021, "Understanding and Simplifying Perceptual
    Distances"): the multi-scale conv pyramid + unit-normalized feature diffs
    do most of the work, not the ImageNet weights. This is NOT the reference
    objective's trained LPIPS (`mcquic/loss/lpips.py:13-56`) — it exists so
    the 2x-weighted perceptual slot in `0.5*recon + 0.5*mse + 2*lpips`
    (reference trainer.py:276) can be A/B'd at all in this zero-egress
    environment. Opt in with MCQUIC_LPIPS_PROXY=1; results must be labeled
    "proxy", never "LPIPS".
    """
    module = LPIPS(dtype=dtype)
    rng = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params = module.init(rng, x0, x0)["params"]
    # uniform lin heads: plain channel mean of the squared unit-feature diff
    for name in list(params):
        if name.startswith("lin"):
            k = params[name]["kernel"]
            params[name] = {"kernel": jnp.full(k.shape, 1.0 / k.shape[2],
                                               k.dtype)}
    return makeLpipsFn(params, dtype=dtype)


def makeDefaultLpipsFn(dtype=jnp.float32):
    """Assemble the full LPIPS fn from the bundled lin heads + a locatable
    VGG16 backbone; None (with ONE loud warning) when the backbone is absent.

    The reference trains `0.5*recon + 0.5*mse + 2*lpips` (trainer.py:276);
    without the backbone the dominant term is silently zero, hence the noise.
    MCQUIC_LPIPS_PROXY=1 substitutes the seeded random-feature proxy
    (makeProxyLpipsFn) into the perceptual slot instead of zeroing it.
    """
    global _warnedOnce
    vggPath = findVggWeights()
    if vggPath is None:
        if os.environ.get("MCQUIC_LPIPS_PROXY", ""):
            banner = ("LPIPS PROXY ACTIVE: seeded random-feature perceptual "
                      "distance in the lpips slot (MCQUIC_LPIPS_PROXY=1). "
                      "This is NOT the reference's trained VGG16-LPIPS.")
            logger.warning(banner)
            print(banner, flush=True)
            return makeProxyLpipsFn(dtype=dtype)
        if not _warnedOnce:
            _warnedOnce = True
            banner = (
                "\n" + "!" * 78 + "\n"
                "! LPIPS DISABLED: no VGG16 backbone weights found.\n"
                "! The published objective is 0.5*recon + 0.5*mse + 2*lpips — the\n"
                "! 2x-weighted perceptual term will train as ZERO.\n"
                "! Provide torchvision vgg16 weights via MCQUIC_VGG16_WEIGHTS or\n"
                "! ~/.cache/mcquic_tpu/vgg16.pth to restore the reference loss.\n"
                + "!" * 78)
            logger.warning(banner)
            print(banner, flush=True)
        return None
    import torch

    params = loadBundledLinHeads()
    params["vgg"] = convertVggStateDict(torch.load(vggPath, map_location="cpu"))
    logger.info("LPIPS enabled: lin heads (bundled) + VGG16 backbone from %s",
                vggPath)
    return makeLpipsFn(params, dtype=dtype)


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
        vsd = {k: v.numpy() for k, v in
               torch.load(vggStateDictPath, map_location="cpu").items()}
        params["vgg"] = convertVggStateDict(vsd)
    return params
