"""Residual / attention building blocks (NHWC flax modules).

Parity with reference `mcquic/nn/blocks.py`:
  * ResidualBlock           (`blocks.py:163-200`): SiLU-conv-SiLU/GN-conv + skip
  * ResidualBlockWithStride (`blocks.py:82-122`) : SiLU-conv↓-GDN-conv + conv skip
  * ResidualBlockShuffle    (`blocks.py:125-159`): SiLU-pixshuf↑-IGDN-conv + pixshuf skip
  * ResidualBlockMasked     (`blocks.py:204-242`)
  * AttentionBlock          (`blocks.py:246-288`): gated 3-resblock attention (Cheng2020)
  * NonLocalBlock           (`blocks.py:292-319`): QKV 1x1-conv attention w/ random masking
"""
from math import sqrt
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mcquic_tpu.nn.convs import Conv, MaskedConv, conv1x1, conv3x3, pixelShuffle3x3
from mcquic_tpu.nn.gdn import GenDivNorm, InvGenDivNorm
from mcquic_tpu.utils.registry import ModuleRegistry

Dtype = Any

__all__ = [
    "ResidualBlock", "ResidualBlockWithStride", "ResidualBlockShuffle",
    "ResidualBlockMasked", "AttentionBlock", "NonLocalBlock",
]


@ModuleRegistry.register
class ResidualBlock(nn.Module):
    """act-conv-act-conv + skip; GroupNorm middle act when denseNorm."""
    outChannels: int
    groups: int = 1
    denseNorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inChannels = x.shape[-1]
        y = nn.silu(x)
        y = conv3x3(self.outChannels, dtype=self.dtype)(y)
        if self.denseNorm:
            y = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, param_dtype=jnp.float32)(y)
        else:
            y = nn.silu(y)
        y = conv3x3(self.outChannels, dtype=self.dtype)(y)
        if inChannels != self.outChannels:
            x = conv1x1(self.outChannels, dtype=self.dtype)(x)
        return y + x


@ModuleRegistry.register
class ResidualBlockWithStride(nn.Module):
    """SiLU - conv3x3(stride) - GDN - conv3x3 + strided conv skip."""
    outChannels: int
    stride: int = 2
    groups: int = 1
    denseNorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inChannels = x.shape[-1]
        y = nn.silu(x)
        y = conv3x3(self.outChannels, stride=self.stride, dtype=self.dtype)(y)
        # NOTE: reference keeps GDN un-grouped regardless of `groups`
        # (blocks.py:116-122); `groups` only feeds the denseNorm GroupNorm.
        y = GenDivNorm(dtype=self.dtype)(y)
        y = conv3x3(self.outChannels, dtype=self.dtype)(y)
        if self.stride != 1:
            x = conv3x3(self.outChannels, stride=self.stride, dtype=self.dtype)(x)
        elif inChannels != self.outChannels:
            x = conv1x1(self.outChannels, dtype=self.dtype)(x)
        return y + x


@ModuleRegistry.register
class ResidualBlockShuffle(nn.Module):
    """SiLU - pixelShuffle3x3(up) - IGDN - conv3x3 + pixelShuffle skip."""
    outChannels: int
    upsample: int = 2
    groups: int = 1
    denseNorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.silu(x)
        y = pixelShuffle3x3(self.outChannels, rate=self.upsample, dtype=self.dtype)(y)
        y = InvGenDivNorm(dtype=self.dtype)(y)
        y = conv3x3(self.outChannels, dtype=self.dtype)(y)
        x = pixelShuffle3x3(self.outChannels, rate=self.upsample, dtype=self.dtype)(x)
        return y + x


@ModuleRegistry.register
class ResidualBlockMasked(nn.Module):
    """ReLU-MaskedConv(A)-ReLU-MaskedConv(B) + masked skip for causal decoding."""
    outChannels: int
    maskType: str = "A"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inChannels = x.shape[-1]
        y = nn.relu(x)
        y = MaskedConv(self.outChannels, kernel=5, maskType=self.maskType, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = MaskedConv(self.outChannels, kernel=5, maskType="B", dtype=self.dtype)(y)
        if inChannels != self.outChannels:
            x = MaskedConv(self.outChannels, kernel=5, maskType=self.maskType, dtype=self.dtype)(x)
        return y + x


@ModuleRegistry.register
class AttentionBlock(nn.Module):
    """main(3 resblocks) * sigmoid(side(3 resblocks + 1x1)) + skip."""
    groups: int = 1
    denseNorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        channel = x.shape[-1]
        a = x
        for _ in range(3):
            a = ResidualBlock(channel, self.groups, self.denseNorm, dtype=self.dtype)(a)
        b = x
        for _ in range(3):
            b = ResidualBlock(channel, self.groups, self.denseNorm, dtype=self.dtype)(b)
        b = conv1x1(channel, dtype=self.dtype)(b)
        return a * jax.nn.sigmoid(b) + x


@ModuleRegistry.register
class NonLocalBlock(nn.Module):
    """Global QKV attention over flattened spatial positions with 10% random
    logit masking during training (reference blocks.py:292-319)."""
    groups: int = 1
    maskRate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        n, h, w, c = x.shape
        half = c // 2
        hw = h * w
        scale = sqrt(hw)
        q = conv1x1(half, groups=self.groups, dtype=self.dtype)(x).reshape(n, hw, half)
        k = conv1x1(half, groups=self.groups, dtype=self.dtype)(x).reshape(n, hw, half)
        v = conv1x1(half, groups=self.groups, dtype=self.dtype)(x).reshape(n, hw, half)
        logits = jnp.einsum("nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32) / scale
        if train and self.maskRate > 0:
            key = self.make_rng("dropout")
            randomMask = jax.random.uniform(key, (n, hw, hw)) < self.maskRate
            logits = jnp.where(randomMask, -1e9, logits)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        z = jnp.einsum("nqk,nkc->nqc", weights, v).reshape(n, h, w, half)
        z = conv1x1(c, groups=self.groups, dtype=self.dtype)(z)
        return x + z
