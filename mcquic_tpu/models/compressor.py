"""Compressor models (flax, NHWC).

Parity with reference `mcquic/modules/compressor.py`:
  * `Compressor` (v1, `compressor.py:120-177`): 8x-downsampling conv/GDN/
    attention encoder, UMGM quantizer cascade with the six head stacks,
    mirrored pixel-shuffle decoder.
  * `Neon` (v2, `compressor.py:181-233`): 8x-downsampling encoder into an
    8-channel latent, ResidualBackwardQuantizer multi-scale residual VQ,
    mirrored decoder. Activation recomputation (reference fairscale
    checkpoint_wrapper, compressor.py:230-231) maps to `flax.linen.remat`.

These modules are pure functions of (params, input); padding/cropping and
entropy coding are host-side concerns handled by `models.engine`.
"""
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mcquic_tpu.nn import (AttentionBlock, ResidualBlock, ResidualBlockShuffle,
                           ResidualBlockWithStride, conv3x3, pixelShuffle3x3)
from mcquic_tpu.models.quantizer import ResidualBackwardQuantizer, UMGMQuantizer
from mcquic_tpu.utils.registry import ModelRegistry

Dtype = Any


class _V1Encoder(nn.Module):
    """conv3x3↓2, ResB, ResBStride↓2, Attn, ResB, ResBStride↓2, ResB (compressor.py:122-131)."""
    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channel
        x = conv3x3(c, stride=2, dtype=self.dtype)(x)
        x = ResidualBlock(c, dtype=self.dtype)(x)
        x = ResidualBlockWithStride(c, 2, dtype=self.dtype)(x)
        x = AttentionBlock(dtype=self.dtype)(x)
        x = ResidualBlock(c, dtype=self.dtype)(x)
        x = ResidualBlockWithStride(c, 2, dtype=self.dtype)(x)
        x = ResidualBlock(c, dtype=self.dtype)(x)
        return x


class _V1Decoder(nn.Module):
    """Mirror of _V1Encoder (compressor.py:132-140)."""
    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channel
        x = ResidualBlock(c, dtype=self.dtype)(x)
        x = ResidualBlockShuffle(c, 2, dtype=self.dtype)(x)
        x = AttentionBlock(dtype=self.dtype)(x)
        x = ResidualBlock(c, dtype=self.dtype)(x)
        x = ResidualBlockShuffle(c, 2, dtype=self.dtype)(x)
        x = ResidualBlock(c, dtype=self.dtype)(x)
        x = pixelShuffle3x3(3, rate=2, dtype=self.dtype)(x)
        return x


class _LatentStageEncoder(nn.Module):
    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResidualBlockWithStride(self.channel, 2, dtype=self.dtype)(x)
        x = ResidualBlock(self.channel, dtype=self.dtype)(x)
        x = AttentionBlock(dtype=self.dtype)(x)
        return x


class _QuantizationHead(nn.Module):
    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResidualBlock(self.channel, dtype=self.dtype)(x)
        x = AttentionBlock(dtype=self.dtype)(x)
        x = conv3x3(self.channel, dtype=self.dtype)(x)
        return x


class _LatentHead(nn.Module):
    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResidualBlock(self.channel, dtype=self.dtype)(x)
        x = AttentionBlock(dtype=self.dtype)(x)
        x = conv3x3(self.channel, dtype=self.dtype)(x)
        return x


class _RestoreHead(nn.Module):
    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = AttentionBlock(dtype=self.dtype)(x)
        x = ResidualBlock(self.channel, dtype=self.dtype)(x)
        x = ResidualBlockShuffle(self.channel, 2, dtype=self.dtype)(x)
        return x


class _DequantizationHead(nn.Module):
    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = AttentionBlock(dtype=self.dtype)(x)
        x = conv3x3(self.channel, dtype=self.dtype)(x)
        x = ResidualBlock(self.channel, dtype=self.dtype)(x)
        return x


class _SideHead(nn.Module):
    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = AttentionBlock(dtype=self.dtype)(x)
        x = conv3x3(self.channel, dtype=self.dtype)(x)
        x = ResidualBlock(self.channel, dtype=self.dtype)(x)
        return x


@ModelRegistry.register
class Compressor(nn.Module):
    """v1 multi-codebook codec (compressor.py:120-177)."""
    channel: int
    m: int
    k: Tuple[int, ...]
    permutationRate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        ch, dt = self.channel, self.dtype
        self._encoder = _V1Encoder(ch, dt)
        self._decoder = _V1Decoder(ch, dt)
        self._quantizer = UMGMQuantizer(
            channel=ch, m=self.m, k=tuple(self.k), permutationRate=self.permutationRate,
            components={
                "latentStageEncoder": lambda: _LatentStageEncoder(ch, dt),
                "quantizationHead": lambda: _QuantizationHead(ch, dt),
                "latentHead": lambda: _LatentHead(ch, dt),
                "dequantizationHead": lambda: _DequantizationHead(ch, dt),
                "sideHead": lambda: _SideHead(ch, dt),
                "restoreHead": lambda: _RestoreHead(ch, dt),
            }, dtype=dt)

    def __call__(self, x, train: bool = True):
        """x [n,h,w,3] in [-1,1] -> (xHat, yHat, codes, logits) (compressor.py:35-43)."""
        y = self._encoder(x)
        yHat, codes, logits = self._quantizer(y, train=train)
        xHat = self._decoder(yHat)
        return xHat, yHat, codes, logits

    def encode(self, x):
        """x (pre-padded) -> codes list [n,h,w,m] (compressor.py:79-88)."""
        y = self._encoder(x)
        return self._quantizer.encode(y)

    def decode(self, codes):
        """codes -> restored [n,H,W,3] (compressor.py:114-117)."""
        yHat = self._quantizer.decode(codes)
        return self._decoder(yHat)


@ModelRegistry.register
class Neon(nn.Module):
    """v2 tokenizer codec (compressor.py:181-233)."""
    channel: int
    k: int
    size: Tuple[int, ...]
    denseNorm: bool = False
    useRemat: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        enc = _NeonEncoder
        dec = _NeonDecoder
        if self.useRemat:
            enc = nn.remat(enc)
            dec = nn.remat(dec)
        self._encoder = enc(self.channel, self.denseNorm, self.dtype)
        self._decoder = dec(self.channel, self.denseNorm, self.dtype)
        self._quantizer = ResidualBackwardQuantizer(
            k=self.k, size=tuple(self.size), denseNorm=self.denseNorm, dtype=self.dtype)

    def __call__(self, x, train: bool = True):
        y = self._encoder(x)
        yHat, codes, logits = self._quantizer(y, train=train)
        xHat = self._decoder(yHat)
        return xHat, yHat, codes, logits

    def encode(self, x):
        y = self._encoder(x)
        return self._quantizer.encode(y)

    def decode(self, codes):
        yHat = self._quantizer.decode(codes)
        return self._decoder(yHat)

    def residual_forward(self, code, formerLevel, level: int):
        return self._quantizer.residual_forward(code, formerLevel, level)

    def residual_backward(self, code, level: int):
        return self._quantizer.residual_backward(code, level)


class _NeonEncoder(nn.Module):
    """compressor.py:186-207: 3 stride-2 stages into an 8-channel latent."""
    channel: int
    denseNorm: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c, dn, dt = self.channel, self.denseNorm, self.dtype
        g = 32
        x = conv3x3(c, dtype=dt)(x)
        x = AttentionBlock(g, dn, dtype=dt)(x)
        x = ResidualBlock(c, g, dn, dtype=dt)(x)
        x = ResidualBlock(c, g, dn, dtype=dt)(x)
        x = ResidualBlockWithStride(c, 2, g, dn, dtype=dt)(x)
        x = ResidualBlock(c, g, dn, dtype=dt)(x)
        x = ResidualBlockWithStride(c, 2, g, dn, dtype=dt)(x)
        x = ResidualBlock(c, g, dn, dtype=dt)(x)
        x = ResidualBlockWithStride(c, 2, g, dn, dtype=dt)(x)
        x = AttentionBlock(g, dn, dtype=dt)(x)
        x = ResidualBlock(2 * c, g, dn, dtype=dt)(x)
        x = ResidualBlock(2 * c, g, dn, dtype=dt)(x)
        x = ResidualBlock(2 * c, g, dn, dtype=dt)(x)
        x = ResidualBlock(2 * c, g, dn, dtype=dt)(x)
        x = ResidualBlock(ResidualBackwardQuantizer.channel, 1, dn, dtype=dt)(x)
        x = AttentionBlock(1, dn, dtype=dt)(x)
        return x


class _NeonDecoder(nn.Module):
    """compressor.py:208-228: mirror with 3 pixel-shuffle upsamples."""
    channel: int
    denseNorm: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c, dn, dt = self.channel, self.denseNorm, self.dtype
        g = 32
        x = AttentionBlock(1, dn, dtype=dt)(x)
        x = ResidualBlock(2 * c, 1, dn, dtype=dt)(x)
        x = ResidualBlock(2 * c, g, dn, dtype=dt)(x)
        x = ResidualBlock(2 * c, g, dn, dtype=dt)(x)
        x = ResidualBlock(2 * c, g, dn, dtype=dt)(x)
        x = ResidualBlock(c, g, dn, dtype=dt)(x)
        x = AttentionBlock(g, dn, dtype=dt)(x)
        x = ResidualBlock(c, g, dn, dtype=dt)(x)
        x = ResidualBlockShuffle(c, 2, g, dn, dtype=dt)(x)
        x = ResidualBlock(c, g, dn, dtype=dt)(x)
        x = ResidualBlockShuffle(c, 2, g, dn, dtype=dt)(x)
        x = ResidualBlock(c, g, dn, dtype=dt)(x)
        x = ResidualBlockShuffle(c, 2, g, dn, dtype=dt)(x)
        x = ResidualBlock(c, g, dn, dtype=dt)(x)
        x = ResidualBlock(c, g, dn, dtype=dt)(x)
        x = AttentionBlock(g, dn, dtype=dt)(x)
        # Small-init output head: the cascade of IGDNs amplifies the random-init
        # signal (y = x*sqrt(conv(x^2)+1) >= |x| per layer), giving the huge
        # early-loss transient observed in both this and the reference
        # construction. Scaling only the final projection's init variance by
        # 1e-4 (std x0.01) starts the decoder near a neutral output with an
        # unchanged parameter tree (checkpoint conversion unaffected) while
        # keeping step-0 gradients nonzero through the straight-through path
        # (a hard zero init would cut the codebook's reconstruction gradient).
        x = conv3x3(3, kernelInit=nn.initializers.variance_scaling(
            1e-4, "fan_in", "truncated_normal"), dtype=dt)(x)
        return x
