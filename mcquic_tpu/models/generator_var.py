"""VAR-style next-scale generator (flax) with KV-cached CFG sampling.

Parity with reference `mcquic/modules/generator_3_var.py` (GeneratorVAR
wrapping a vendored VAR transformer, `:595-883`):
  * word/class/positional/level embeddings (`:625-648`),
  * AdaLN self-attention blocks (`AdaLNSelfAttn`, cond-modulated 6-way),
    optional l2 qk-norm (`attn_l2_norm`),
  * level-causal attention bias (`attn_bias_for_masking`, `:678-683`),
  * classifier-free-guidance training (cond_drop_rate 0.1 → null class),
  * KV-cached `autoregressive_infer_cfg` with per-stage guidance ramp
    t = cfg * si/(S-1), top-k / top-p sampling (`:697-760`).

Deliberate repair vs the reference snapshot: GeneratorVAR's own feature
pyramid is commented out upstream (generator_3_var.py:100-135) leaving
`residual_forward` broken; here the teacher-forcing/AR scaffolding uses the
frozen compressor's `residual_forward` (8-channel features), which is the
working VAR construction (next-scale input = upsampled reconstruction).
"""
import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mcquic_tpu.models.compressor import Neon
from mcquic_tpu.utils.registry import GeneratorRegistry

Dtype = Any


def _truncInit(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


class VARAttention(nn.Module):
    """Self-attention with optional l2 qk-norm and external KV cache."""
    nHeads: int
    attnL2Norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attnBias=None, cache=None, offset: int = 0):
        """x [B, l, C]. cache: None (training, full seq) or (k, v) arrays
        [B, Lmax, H, hd] updated at [offset, offset+l). Returns (out, cache)."""
        B, l, C = x.shape
        hd = C // self.nHeads
        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, -1)
        q = q.reshape(B, l, self.nHeads, hd)
        k = k.reshape(B, l, self.nHeads, hd)
        v = v.reshape(B, l, self.nHeads, hd)
        if self.attnL2Norm:
            scaleLogit = self.param("scaleLogit",
                                    lambda kk, s: jnp.full(s, math.log(4.0)),
                                    (self.nHeads, 1, 1))
            scale = jnp.exp(scaleLogit)
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
            k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
            scaleQ = scale.transpose(1, 0, 2)[None]     # [1,1,H,1] -> broadcast
            q = q * scaleQ
            softmaxScale = 1.0
        else:
            softmaxScale = 1.0 / math.sqrt(hd)

        if cache is not None:
            ck, cv = cache
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, offset, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, offset, 0, 0))
            kAll = ck[:, :offset + l]
            vAll = cv[:, :offset + l]
            cache = (ck, cv)
        else:
            kAll, vAll = k, v

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kAll,
                            preferred_element_type=jnp.float32) * softmaxScale
        if attnBias is not None:
            logits = logits + attnBias[None, None]
        probs = jax.nn.softmax(logits, -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vAll).reshape(B, l, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        return out, cache


class VARBlock(nn.Module):
    """AdaLNSelfAttn (generator_3_var.py AdaLNSelfAttn blocks)."""
    nHeads: int
    mlpRatio: float = 4.0
    normEps: float = 1e-6
    attnL2Norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, attnBias=None, cache=None, offset: int = 0):
        C = x.shape[-1]
        ada = nn.Dense(6 * C, dtype=self.dtype, name="adaLN",
                       kernel_init=nn.initializers.zeros)(nn.silu(cond))
        g1, g2, s1, s2, sc1, sc2 = jnp.split(ada, 6, -1)
        ln1 = nn.LayerNorm(epsilon=self.normEps, use_bias=False, use_scale=False,
                           dtype=self.dtype, name="ln1")
        ln2 = nn.LayerNorm(epsilon=self.normEps, use_bias=False, use_scale=False,
                           dtype=self.dtype, name="ln2")
        attn = VARAttention(self.nHeads, self.attnL2Norm, self.dtype, name="attn")
        h = ln1(x) * (1 + sc1[:, None]) + s1[:, None]
        aOut, cache = attn(h, attnBias, cache, offset)
        x = x + g1[:, None] * aOut
        h = ln2(x) * (1 + sc2[:, None]) + s2[:, None]
        hidden = int(C * self.mlpRatio)
        h = nn.Dense(hidden, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(C, dtype=self.dtype, name="fc2")(h)
        x = x + g2[:, None] * h
        return x, cache


def levelCausalBias(patchNums: Sequence[int]) -> jnp.ndarray:
    """0 where allowed, -inf where masked (generator_3_var.py:678-683)."""
    d = np.concatenate([np.full(pn * pn, i) for i, pn in enumerate(patchNums)])
    bias = np.where(d[:, None] >= d[None, :], 0.0, -np.inf).astype(np.float32)
    return jnp.asarray(bias)


@GeneratorRegistry.register
class GeneratorVAR(nn.Module):
    """Frozen Neon tokenizer + VAR transformer (generator_3_var.py:47-353)."""
    channel: int
    k: int
    size: Tuple[int, ...]
    denseNorm: bool = False
    depth: int = 24
    embedDim: int = 1536
    nHeads: int = 16
    numClasses: int = 1000
    condDropRate: float = 0.1
    normEps: float = 1e-6
    attnL2Norm: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.compressor = Neon(channel=self.channel, k=self.k, size=tuple(self.size),
                               denseNorm=self.denseNorm, useRemat=False)
        C = self.embedDim
        # small-to-large patch schedule (reference passes size[::-1])
        self.patchNums = tuple(sorted(self.size))
        self.L = sum(pn * pn for pn in self.patchNums)
        self.firstL = self.patchNums[0] ** 2

        initStd = math.sqrt(1 / C / 3)
        tokenDim = self.compressor._quantizer.channel  # 8-channel scaffold feats
        self.wordEmbed = nn.Dense(C, dtype=self.dtype)
        self.classEmb = self.param("classEmb", _truncInit(initStd),
                                   (self.numClasses + 1, C))
        self.posStart = self.param("posStart", _truncInit(initStd), (1, self.firstL, C))
        self.pos1LC = self.param("pos1LC", _truncInit(initStd), (1, self.L, C))
        self.lvlEmbed = self.param("lvlEmbed", _truncInit(initStd),
                                   (len(self.patchNums), C))
        self.blocks = [VARBlock(self.nHeads, 4.0, self.normEps, self.attnL2Norm,
                                self.dtype) for _ in range(self.depth)]
        self.headNorm = nn.LayerNorm(epsilon=self.normEps, use_bias=False,
                                     use_scale=False, dtype=self.dtype)
        self.headAda = nn.Dense(2 * self.embedDim, dtype=self.dtype,
                                kernel_init=nn.initializers.zeros)
        self.head = nn.Dense(self.k, dtype=jnp.float32)

        lvlIdx = np.concatenate([np.full(pn * pn, i) for i, pn in enumerate(self.patchNums)])
        self._lvlIdx = jnp.asarray(lvlIdx, jnp.int32)
        self._bias = levelCausalBias(self.patchNums)

    def _getLogits(self, h, cond):
        shift, scale = jnp.split(self.headAda(nn.silu(cond)), 2, -1)
        h = self.headNorm(h.astype(jnp.float32)) * (1 + scale[:, None]) + shift[:, None]
        return self.head(h)

    # -------------------------------------------------------------- training
    def __call__(self, image, condition, train: bool = True):
        """Teacher-forced CFG training. Returns (logits, loss, codes, perLevel)."""
        codes = [jax.lax.stop_gradient(c)
                 for c in self.compressor.encode(image.astype(jnp.float32))]
        scaffolds = []
        former = None
        for level, code in enumerate(codes[:-1]):
            former = jax.lax.stop_gradient(
                self.compressor.residual_forward(code, former, level))
            scaffolds.append(former)

        B = image.shape[0]
        if train:
            dropKey = self.make_rng("gumbel")
            drop = jax.random.uniform(dropKey, (B,)) < self.condDropRate
            condition = jnp.where(drop, self.numClasses, condition)
        cond = self.classEmb[condition].astype(self.dtype)          # [B, C]

        sos = cond[:, None] + self.posStart.astype(self.dtype)     # [B, firstL, C]
        toks = [sos]
        for feat in scaffolds:
            n, h, w, c = feat.shape
            toks.append(self.wordEmbed(feat.reshape(n, h * w, c).astype(self.dtype)))
        x = jnp.concatenate(toks, 1)
        x = x + (self.lvlEmbed[self._lvlIdx] + self.pos1LC[0]).astype(self.dtype)

        for blk in self.blocks:
            x, _ = blk(x, cond, attnBias=self._bias)
        logits = self._getLogits(x, cond)                           # [B, L, k]

        losses, perLevel = [], []
        cur = 0
        for code in codes:
            n, h, w, _ = code.shape
            pre = logits[:, cur:cur + h * w]
            gt = code[..., 0].reshape(n, h * w)
            logp = jax.nn.log_softmax(pre, -1)
            nll = -jnp.take_along_axis(logp, gt[..., None], -1)[..., 0]
            losses.append(jnp.sum(nll))
            perLevel.append(jnp.mean(nll))
            cur += h * w
        loss = sum(losses) / (B * self.L)
        # greedy preview through the frozen decoder (keeps logging parity with
        # the self-attn variant and initializes the full decode path).
        cur = 0
        restoredCodes = []
        for code in codes:
            n, h, w, _ = code.shape
            pre = logits[:, cur:cur + h * w]
            restoredCodes.append(
                jax.lax.stop_gradient(jnp.argmax(pre, -1)).reshape(n, h, w, 1))
            cur += h * w
        restored = jax.lax.stop_gradient(self.compressor.decode(restoredCodes))
        return logits, loss, codes, restored, perLevel

    # ------------------------------------------------------------- inference
    def generate(self, condition, rng, cfg: float = 1.5, topK: int = 0,
                 topP: float = 0.0):
        """KV-cached CFG sampling (generator_3_var.py:697-760)."""
        B = condition.shape[0]
        C = self.embedDim
        hd = C // self.nHeads
        B2 = 2 * B
        labels = jnp.concatenate([condition,
                                  jnp.full_like(condition, self.numClasses)])
        cond = self.classEmb[labels].astype(self.dtype)             # [2B, C]

        caches = [(jnp.zeros((B2, self.L, self.nHeads, hd), self.dtype),
                   jnp.zeros((B2, self.L, self.nHeads, hd), self.dtype))
                  for _ in range(self.depth)]
        lvlPos = (self.lvlEmbed[self._lvlIdx] + self.pos1LC[0]).astype(self.dtype)

        nextTokenMap = (cond[:, None] + self.posStart.astype(self.dtype)
                        + lvlPos[None, :self.firstL])
        S = len(self.patchNums)
        curL = 0
        former = None
        predictions = []
        for si, pn in enumerate(self.patchNums):
            l = pn * pn
            x = nextTokenMap
            newCaches = []
            for blk, cache in zip(self.blocks, caches):
                x, cache = blk(x, cond, attnBias=None, cache=cache, offset=curL)
                newCaches.append(cache)
            caches = newCaches
            logits = self._getLogits(x, cond)                       # [2B, l, k]
            t = cfg * si / max(S - 1, 1)
            guided = (1 + t) * logits[:B] - t * logits[B:]

            rng, sub = jax.random.split(rng)
            guided = self._filterLogits(guided, topK, topP)
            idx = jax.random.categorical(sub, guided)               # [B, l]
            code = idx.reshape(B, pn, pn, 1).astype(jnp.int32)
            predictions.append(code)
            curL += l

            if si != S - 1:
                former = self.compressor.residual_forward(code, former, si)
                n, h, w, c = former.shape
                nxt = self.wordEmbed(former.reshape(n, h * w, c).astype(self.dtype))
                nxt = nxt + lvlPos[None, curL:curL + self.patchNums[si + 1] ** 2]
                nextTokenMap = jnp.concatenate([nxt, nxt], 0)       # CFG double batch

        restored = self.compressor.decode(predictions)
        return predictions, restored

    @staticmethod
    def _filterLogits(logits, topK: int, topP: float):
        if topK and topK > 0:
            kth = jnp.sort(logits, -1)[..., -topK][..., None]
            logits = jnp.where(logits < kth, -1e9, logits)
        if topP and 0.0 < topP < 1.0:
            sortIdx = jnp.argsort(-logits, -1)
            sorted_ = jnp.take_along_axis(logits, sortIdx, -1)
            probs = jax.nn.softmax(sorted_, -1)
            cum = jnp.cumsum(probs, -1)
            keepSorted = cum - probs < topP                          # keep until mass topP
            keep = jnp.zeros_like(keepSorted).at[
                jnp.arange(logits.shape[0])[:, None, None],
                jnp.arange(logits.shape[1])[None, :, None],
                sortIdx].set(keepSorted)
            logits = jnp.where(keep, logits, -1e9)
        return logits
