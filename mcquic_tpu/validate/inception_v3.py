"""InceptionV3 classifier in flax (torchvision layout) for InceptionScore.

The reference computes IS with torchvision's pretrained
`inception_v3(transform_input=False)` (reference validate/handlers.py:193-258).
Pretrained weights cannot be downloaded here; this module provides the exact
architecture plus a converter from a torchvision state dict, wired the same
way as LPIPS: point `MCQUIC_INCEPTION_WEIGHTS` at `inception_v3_*.pth` (or
drop it at ~/.cache/mcquic_tpu/inception_v3.pth) and
`makeInceptionClassifier()` returns a jitted `uint8 [n,299,299,3] ->
logits [n,1000]` callable; otherwise it returns None and InceptionScore
stays gated with a clear error.
"""
import logging
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

logger = logging.getLogger("mcquic_tpu.inception")

BN_EPS = 1e-3


class BasicConv2d(nn.Module):
    """conv(no bias) + folded BatchNorm + relu (torchvision BasicConv2d).

    BN is inference-only here: the converter folds running stats into a
    per-channel scale/shift, so params are `kernel`, `scale`, `shift`."""
    features: int
    kernel: Any = (3, 3)
    stride: int = 1
    padding: Any = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel if isinstance(self.kernel, tuple) else (self.kernel, self.kernel)
        pad = self.padding if isinstance(self.padding, tuple) else (self.padding, self.padding)
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, x.shape[-1], self.features), jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        shift = self.param("shift", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride, self.stride),
            padding=((pad[0], pad[0]), (pad[1], pad[1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.relu(y * scale + shift)


def _avgPool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _maxPool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    poolFeatures: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.poolFeatures, (1, 1), name="branch_pool")(_avgPool3(x))
        return jnp.concatenate([b1, b5, b3, bp], -1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxPool3s2(x)], -1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgPool3(x))
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxPool3s2(x)], -1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)], -1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)], -1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgPool3(x))
        return jnp.concatenate([b1, b3, bd, bp], -1)


class InceptionV3(nn.Module):
    """torchvision inception_v3 (transform_input=False, aux_logits dropped at
    inference). Input: float NHWC [-1,1] at 299x299. Output: [n,1000] logits."""
    numClasses: int = 1000

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _maxPool3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxPool3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        w = self.param("fc_kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.numClasses), jnp.float32)
        b = self.param("fc_bias", nn.initializers.zeros,
                       (self.numClasses,), jnp.float32)
        return x @ w + b


def convertTorchInception(stateDict) -> dict:
    """torchvision inception_v3 state dict -> flax params with BN folded.

    Accepts tensors or numpy arrays. Aux-classifier (`AuxLogits.*`) keys are
    ignored. BN fold: scale = gamma/sqrt(var+eps), shift = beta - mean*scale.
    """
    sd = {k: np.asarray(v) for k, v in stateDict.items()
          if not k.startswith("AuxLogits")}
    params: dict = {}

    def put(path, leaf):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    convPrefixes = sorted({k[:-len(".conv.weight")] for k in sd
                           if k.endswith(".conv.weight")})
    for prefix in convPrefixes:
        w = np.transpose(sd[f"{prefix}.conv.weight"], (2, 3, 1, 0))  # OIHW->HWIO
        gamma = sd[f"{prefix}.bn.weight"]
        beta = sd[f"{prefix}.bn.bias"]
        mean = sd[f"{prefix}.bn.running_mean"]
        var = sd[f"{prefix}.bn.running_var"]
        scale = gamma / np.sqrt(var + BN_EPS)
        shift = beta - mean * scale
        path = tuple(prefix.split("."))
        put((*path, "kernel"), w.astype(np.float32))
        put((*path, "scale"), scale.astype(np.float32))
        put((*path, "shift"), shift.astype(np.float32))
    put(("fc_kernel",), np.transpose(sd["fc.weight"], (1, 0)).astype(np.float32))
    put(("fc_bias",), sd["fc.bias"].astype(np.float32))
    return params


def findInceptionWeights() -> Optional[str]:
    for path in [os.environ.get("MCQUIC_INCEPTION_WEIGHTS", ""),
                 os.path.expanduser("~/.cache/mcquic_tpu/inception_v3.pth")]:
        if path and os.path.exists(path):
            return path
    return None


def makeInceptionClassifier():
    """uint8 [n,299,299,3] -> logits [n,1000] when weights are locatable;
    None otherwise (InceptionScore stays gated with its clear error)."""
    path = findInceptionWeights()
    if path is None:
        return None
    import torch

    params = convertTorchInception(torch.load(path, map_location="cpu"))
    module = InceptionV3()
    apply = jax.jit(lambda v, x: module.apply(v, x))

    def classifierFn(imgsU8: np.ndarray) -> np.ndarray:
        # reference preprocessing: float [-1,1] (handlers.py:231)
        x = jnp.asarray(imgsU8, jnp.float32) / 255.0 * 2.0 - 1.0
        return np.asarray(apply({"params": params}, x))

    logger.info("InceptionScore classifier enabled from %s", path)
    return classifierFn
