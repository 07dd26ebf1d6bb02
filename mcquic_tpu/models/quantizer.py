"""Quantizer assemblies (flax modules over the functional VQ core).

Parity map to reference `mcquic/modules/quantizer.py`:
  * UMGMQuantizer          (`quantizer.py:368-467`): v1 cascade of per-level
    codebooks with 6 component heads (latentStageEncoder, quantizationHead,
    latentHead, dequantizationHead, sideHead, restoreHead).
  * ResidualBackwardQuantizer (`quantizer.py:577-765`): v2 multi-scale
    residual VQ with a single shared codebook `[1, k, 8]`, top-down residual
    peeling on encode and bottom-up sum+upsample on decode; exposes
    `residual_forward` / `residual_backward` scaffolding for the stage-2
    generator (`quantizer.py:671-674, 705-712`).

State model (TPU-first): freqEMA lives in the flax `coder` variable
collection and is updated *inside* the training forward; under pjit the
cross-device frequency reduction (reference `dist.all_reduce`,
entropyCoder.py:314) is a plain global sum that GSPMD lowers to an ICI
all-reduce automatically. `syncCodebook` (reference broadcast,
quantizer.py:138-142) is a no-op under SPMD: parameters are replicated by
sharding spec and `reassignCodebook` is a deterministic jitted function of
the psum'd frequencies, so every host computes identical new codebooks.
"""
import math
from typing import Any, Callable, Mapping, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mcquic_tpu.consts import Consts
from mcquic_tpu.nn.functional import gumbelSoftmax, lowerBound
from mcquic_tpu.ops.vq import (groupLatent, randomDrop, vqDequantizeCodes,
                               vqDequantizeSoft, vqEncode, vqLogits)

Dtype = Any


def _codebookInit(std: float):
    def init(key, shape, dtype=jnp.float32):
        # SmallInit (Transformers without Tears): std = sqrt(2 / (5 d)).
        return std * jax.random.normal(key, shape, dtype)
    return init


def _truncCodebookInit(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


class _QuantizeCore:
    """Stateless sampling logic shared by both quantizer families.

    Mirrors `_multiCodebookQuantization._sample/forward` (quantizer.py:202-239):
    logits scaled by a bounded learnable temperature, frequency-biased random
    drop, hard gumbel-softmax straight-through.
    """

    @staticmethod
    def sample(rngGumbel, rngDrop, xGrouped, codebook, temperature, freqEMA, train: bool):
        logit = vqLogits(xGrouped, codebook)                     # [n,h,w,m,k]
        boundedT = lowerBound(temperature, jnp.asarray(Consts.Eps, temperature.dtype))
        logit = logit * boundedT[None, None, None, :, None]      # temp per group
        if train:
            logit = randomDrop(rngDrop, logit, freqEMA)
        sampled = gumbelSoftmax(rngGumbel, logit, 1.0, hard=True)
        code = jnp.argmax(logit, -1).astype(jnp.int32)           # [n,h,w,m]
        oneHot = jax.nn.one_hot(code, logit.shape[-1], dtype=logit.dtype)
        return sampled, code, oneHot, logit


def _emaCounts(oneHot: jax.Array) -> jax.Array:
    """[n,h,w,m,k] -> [m,k] counts. Global under pjit (GSPMD inserts psum)."""
    return jnp.sum(oneHot, axis=(0, 1, 2))


def _emaUpdate(old: jax.Array, counts: jax.Array, ema: float) -> jax.Array:
    normalized = counts / jnp.sum(counts, -1, keepdims=True)
    return (1 - ema) * normalized + ema * old


class UMGMQuantizer(nn.Module):
    """v1 cascaded multi-codebook quantizer (reference quantizer.py:368-467).

    `components` maps the six head names to flax-module factories; each level
    instantiates fresh heads. The last level has no latentHead / sideHead.
    """
    channel: int
    m: int
    k: Tuple[int, ...]
    permutationRate: float = 0.0
    components: Mapping[str, Callable[[], nn.Module]] = None
    ema: float = 0.9
    dtype: Dtype = jnp.float32

    def setup(self):
        levels = len(self.k)
        d = self.channel // self.m
        cbs, temps, freqs = [], [], []
        enc, qHead, lHead, deqHead, sHead, rHead = [], [], [], [], [], []
        for i, ki in enumerate(self.k):
            std = math.sqrt(2 / (5 * self.channel / self.m))
            cbs.append(self.param(f"codebook{i}", _codebookInit(std), (self.m, ki, d)))
            temps.append(self.param(f"temperature{i}", nn.initializers.ones, (self.m,)))
            freqs.append(self.variable("coder", f"freqEMA{i}",
                                       lambda k=ki: jnp.ones((self.m, k), jnp.float32) / k))
            enc.append(self.components["latentStageEncoder"]())
            qHead.append(self.components["quantizationHead"]())
            lHead.append(self.components["latentHead"]() if i < levels - 1 else None)
            deqHead.append(self.components["dequantizationHead"]())
            sHead.append(self.components["sideHead"]() if i < levels - 1 else None)
            rHead.append(self.components["restoreHead"]())
        self._codebooks = cbs
        self._temperatures = temps
        self._freqEMAs = freqs
        self._latentStageEncoders = enc
        self._quantizationHeads = qHead
        self._latentHeads = lHead
        self._dequantizationHeads = deqHead
        self._sideHeads = sHead
        self._restoreHeads = rHead

    @property
    def Codebooks(self):
        return list(self._codebooks)

    def encode(self, x):
        """x [n,h,w,c] -> list of codes [n,h,w,m] (quantizer.py:411-420)."""
        codes = []
        for i in range(len(self.k)):
            z = self._latentStageEncoders[i](x)
            q = self._quantizationHeads[i](z)
            code = vqEncode(groupLatent(q, self.m), self._codebooks[i])
            codes.append(code)
            if self._latentHeads[i] is not None:
                z = self._latentHeads[i](z)
                x = z - vqDequantizeCodes(code, self._codebooks[i])
        return codes

    def decode(self, codes):
        """list of codes -> yHat [n,h,w,c] (quantizer.py:422-428)."""
        formerLevel = None
        for i, code in zip(reversed(range(len(self.k))), reversed(list(codes))):
            q = self._dequantizationHeads[i](vqDequantizeCodes(code, self._codebooks[i]))
            if self._sideHeads[i] is not None and formerLevel is not None:
                q = q + self._sideHeads[i](formerLevel)
            formerLevel = self._restoreHeads[i](q)
        return formerLevel

    def __call__(self, x, train: bool = True):
        """Training forward: returns (yHat, codes, logits) (quantizer.py:443-467)."""
        quantizeds, codes, oneHots, logits = [], [], [], []
        for i in range(len(self.k)):
            z = self._latentStageEncoders[i](x)
            q = self._quantizationHeads[i](z)
            rngG = self.make_rng("gumbel")
            rngD = self.make_rng("gumbel")
            sampled, code, oneHot, logit = _QuantizeCore.sample(
                rngG, rngD, groupLatent(q, self.m), self._codebooks[i],
                self._temperatures[i], self._freqEMAs[i].value, train)
            quantized = vqDequantizeSoft(sampled, self._codebooks[i])
            quantizeds.append(quantized)
            codes.append(code)
            oneHots.append(oneHot)
            logits.append(logit)
            if self._latentHeads[i] is not None:
                x = self._latentHeads[i](z) - quantized
        formerLevel = None
        for i in reversed(range(len(self.k))):
            q = self._dequantizationHeads[i](quantizeds[i])
            if self._sideHeads[i] is not None and formerLevel is not None:
                q = q + self._sideHeads[i](formerLevel)
            formerLevel = self._restoreHeads[i](q)

        if train and self.is_mutable_collection("coder"):
            for i in range(len(self.k)):
                counts = _emaCounts(oneHots[i])
                self._freqEMAs[i].value = _emaUpdate(self._freqEMAs[i].value, counts, self.ema)
        return formerLevel, codes, logits


class ResidualBackwardQuantizer(nn.Module):
    """v2 shared-codebook multi-scale residual quantizer (quantizer.py:577-765).

    `size` is the per-level latent resolution from large to small-capable
    spec: each entry must equal or halve the previous (quantizer.py:596-650).
    Codes / freqEMA are ordered small→large (level 0 = smallest scale), the
    reverse of the construction order, matching the reference NOTE at
    quantizer.py:607.
    """
    k: int
    size: Tuple[int, ...]
    denseNorm: bool = False
    ema: float = 0.998
    dtype: Dtype = jnp.float32

    channel: int = 8

    def setup(self):
        ch = self.channel
        L = len(self.size)
        # The smallest level's backward is Identity (quantizer.py:616/641), so
        # its grid must equal the next level's — i.e. the size list must end
        # with an equal pair. A halving final entry would fail later with an
        # opaque broadcast error in the residual peeling loop (the reference
        # has the same latent constraint, unchecked).
        if L >= 2 and self.size[-1] != self.size[-2]:
            raise ValueError(
                f"size {tuple(self.size)} must end with an equal pair (e.g. ...,16,16): "
                f"the smallest level's backward is identity, so size[-1] must equal size[-2]")
        std = math.sqrt(2 / (5 * ch))
        self._codebook = self.param("codebook", _truncCodebookInit(std), (1, self.k, ch))
        self._temperatures = self.param("temperature", nn.initializers.ones, (L, 1))
        # [L, 1, k], level 0 = smallest scale.
        self._freqEMA = self.variable(
            "coder", "freqEMA", lambda: jnp.ones((L, 1, self.k), jnp.float32) / self.k)

        encoders, backwards, decoders = [], [], []
        lastSize = self.size[0] * 2
        for i, thisSize in enumerate(self.size):
            if thisSize == lastSize // 2:
                encoders.append(_SequentialEnc(ch, self.denseNorm, halving=True, dtype=self.dtype))
                backwards.append(_SequentialUp(ch, self.denseNorm, upsample=True, dtype=self.dtype)
                                 if i < L - 1 else None)
                decoders.append(_SequentialUp(ch, self.denseNorm, upsample=True, dtype=self.dtype))
            elif thisSize == lastSize:
                encoders.append(_SequentialEnc(ch, self.denseNorm, halving=False, dtype=self.dtype))
                backwards.append(_SequentialUp(ch, self.denseNorm, upsample=False, dtype=self.dtype)
                                 if i < L - 1 else None)
                decoders.append(_SequentialUp(ch, self.denseNorm, upsample=False, dtype=self.dtype))
            else:
                raise ValueError("The given size sequence does not half or equal from left to right.")
            lastSize = thisSize
        self._encoders = encoders      # construction order: large -> small
        self._backwards = backwards
        self._decoders = decoders

    @property
    def Codebooks(self):
        return [self._codebook] * len(self.size)

    # ---------------------------------------------------------------- encode
    def encode(self, x):
        """x [n,h,w,8] -> codes (small→large), each [n,h,w,1] (quantizer.py:676-693)."""
        allLatents = []
        for enc in self._encoders:
            x = enc(x)
            allLatents.append(x)
        codes = []
        currentLatent = jnp.zeros_like(allLatents[-1])
        for i in reversed(range(len(self.size))):
            residual = allLatents[i] - currentLatent
            code = vqEncode(groupLatent(residual, 1), self._codebook)
            quantized = vqDequantizeCodes(code, self._codebook)
            codes.append(code)
            # The last-constructed (smallest) level's backward is Identity in
            # the reference (quantizer.py:616/641), NOT a skip: currentLatent
            # becomes the quantized value itself.
            currentLatent = (self._backwards[i](quantized)
                             if self._backwards[i] is not None else quantized)
        return codes

    def decode(self, codes):
        """codes (small→large) -> latent [n,H,W,8] (quantizer.py:695-703)."""
        formerLevel = None
        L = len(self.size)
        for lv, code in enumerate(codes):
            i = L - 1 - lv  # decoder index (construction order)
            quantized = vqDequantizeCodes(code, self._codebook)
            if formerLevel is not None:
                quantized = quantized + formerLevel
            formerLevel = self._decoders[i](quantized)
        return formerLevel

    def residual_forward(self, code, formerLevel, level: int):
        """Generator scaffolding (quantizer.py:705-712). level 0 = smallest."""
        i = len(self.size) - 1 - level
        quantized = vqDequantizeCodes(code, self._codebook)
        if formerLevel is not None:
            quantized = quantized + formerLevel
        return self._decoders[i](quantized)

    def residual_backward(self, code, level: int):
        """(quantizer.py:671-674). level counts from 1 = smallest."""
        i = len(self.size) - level
        quantized = vqDequantizeCodes(code, self._codebook)
        if self._backwards[i] is None:  # Identity at the smallest level
            return quantized
        return self._backwards[i](quantized)

    # --------------------------------------------------------------- training
    def __call__(self, x, train: bool = True):
        """Returns (yHat, codes, logits) (quantizer.py:727-765)."""
        allLatents = []
        for enc in self._encoders:
            x = enc(x)
            allLatents.append(x)

        quantizeds, codes, oneHots, logits = [], [], [], []
        currentLatent = jnp.zeros_like(allLatents[-1])
        L = len(self.size)
        for lv, i in enumerate(reversed(range(L))):  # lv: small→large
            residual = allLatents[i] - currentLatent
            rngG = self.make_rng("gumbel")
            rngD = self.make_rng("gumbel")
            sampled, code, oneHot, logit = _QuantizeCore.sample(
                rngG, rngD, groupLatent(residual, 1), self._codebook,
                self._temperatures[L - 1 - i], self._freqEMA.value[lv], train)
            quantized = vqDequantizeSoft(sampled, self._codebook)
            quantizeds.append(quantized)
            codes.append(code)
            oneHots.append(oneHot)
            logits.append(logit)
            currentLatent = (self._backwards[i](quantized)
                             if self._backwards[i] is not None else quantized)

        formerLevel = jnp.zeros_like(quantizeds[0])
        for lv in range(L):
            i = L - 1 - lv
            formerLevel = self._decoders[i](formerLevel + quantizeds[lv])

        if train and self.is_mutable_collection("coder"):
            counts = jnp.stack([_emaCounts(oh) for oh in oneHots])  # [L,1,k]
            self._freqEMA.value = jax.vmap(_emaUpdate, in_axes=(0, 0, None))(
                self._freqEMA.value, counts, self.ema)
        return formerLevel, codes, logits


class _SequentialEnc(nn.Module):
    """latentStageEncoder stack (quantizer.py:600-630): ResB(ch→4ch), Attn,
    ResBStride/ResB, conv1x1(4ch→ch)."""
    ch: int
    denseNorm: bool
    halving: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from mcquic_tpu.nn import AttentionBlock, ResidualBlock, ResidualBlockWithStride, conv1x1
        ch = self.ch
        x = ResidualBlock(ch * 4, 1, self.denseNorm, dtype=self.dtype)(x)
        x = AttentionBlock(1, self.denseNorm, dtype=self.dtype)(x)
        if self.halving:
            x = ResidualBlockWithStride(ch * 4, 2, 1, self.denseNorm, dtype=self.dtype)(x)
        else:
            x = ResidualBlock(ch * 4, 1, self.denseNorm, dtype=self.dtype)(x)
        return conv1x1(ch, bias=False, dtype=self.dtype)(x)


class _SequentialUp(nn.Module):
    """backward / restoreHead stack (quantizer.py:611-648): conv1x1(ch→4ch),
    ResBShuffle/ResB, Attn, ResB(4ch→ch)."""
    ch: int
    denseNorm: bool
    upsample: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from mcquic_tpu.nn import AttentionBlock, ResidualBlock, ResidualBlockShuffle, conv1x1
        ch = self.ch
        x = conv1x1(ch * 4, bias=False, dtype=self.dtype)(x)
        if self.upsample:
            x = ResidualBlockShuffle(ch * 4, 2, 1, self.denseNorm, dtype=self.dtype)(x)
        else:
            x = ResidualBlock(ch * 4, 1, self.denseNorm, dtype=self.dtype)(x)
        x = AttentionBlock(1, self.denseNorm, dtype=self.dtype)(x)
        return ResidualBlock(ch, 1, self.denseNorm, dtype=self.dtype)(x)
