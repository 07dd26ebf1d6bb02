"""Stage-2 next-scale autoregressive generator (flax).

Parity with reference `mcquic/modules/generator_3_self_attn.py:47-387`
(class-conditional `GeneratorV3SelfAttention`, the working variant) plus the
AnyRes transformer core from `generator_3.py`:
  * AnyRes blocks (`generator_3.py:714-829`): adaLN(6x) modulation from the
    pooled condition, self-attention with additive learned position embeds +
    optional qk-norm, gated (tanh) cross-attention to condition features,
    SwiGLU FFN, RMSNorm sandwich.
  * `Transformer` (`generator_3.py:831-999`): token embedder, 64x-expanded
    sin-cos-free learned pos table, FinalLayer with adaLN -> k logits.
  * `AnyResolutionModel` (`generator_3.py:1020-1184`): first-level token from
    the condition via `cap_to_first_token` + centered canvas pos-embed crop,
    per-level level embeddings, block-causal mask over the concatenated
    multi-scale token sequence (`prepare_input_mask`, `:1078-1088`).
  * Generator scaffold (`generator_3_self_attn.py:101-137`): its own
    hidden-size codebook + per-scale restore heads providing
    `residual_forward` features; frozen Neon compressor supplies codes.

Deliberate repair vs the reference snapshot: the reference wires
`token_dim = channel` while its scaffold features are `hidden_size`-wide
(a latent crash in the unexercised path); here the scaffold and token dim
are both `hidden_size`, which is the only self-consistent reading.

TPU notes: the full multi-scale sequence (596 tokens at the 17-level config)
is processed in ONE forward (teacher forcing) — attention uses a static
block-causal mask; bf16 activations with fp32 logits/CE; the frozen
tokenizer runs fp32 (reference note.md:4).
"""
import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mcquic_tpu.models.compressor import Neon
from mcquic_tpu.nn.convs import conv3x3, pixelShuffle3x3
from mcquic_tpu.ops.vq import vqDequantizeCodes
from mcquic_tpu.utils.registry import GeneratorRegistry

Dtype = Any

IMAGENET_CLASSES = 1000


def _truncInit(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        norm = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + self.eps)
        return (norm * scale).astype(x.dtype)


class SwiGLU(nn.Module):
    """FeedForward w1/w2/w3 (generator_3.py:584-627)."""
    hiddenDim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        w1 = nn.Dense(self.hiddenDim, use_bias=False, dtype=self.dtype, name="w1")
        w2 = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="w2")
        w3 = nn.Dense(self.hiddenDim, use_bias=False, dtype=self.dtype, name="w3")
        return w2(nn.silu(w1(x)) * w3(x))


class AnyResAttention(nn.Module):
    """Self-attn + gated cross-attn to condition (generator_3.py:305-581)."""
    nHeads: int
    qkNorm: bool = True
    normEps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, yFeat, posEmbed, cache=None, offset: int = 0):
        """cache: optional (k, v) arrays [bs, Lmax, H, hd] for KV-cached
        sampling — new keys/values are written at [offset, offset+seq) and
        attention spans the whole cached prefix (block-causal structure makes
        a mask unnecessary during per-level decoding). Returns (out, cache)."""
        bs, seq, dim = x.shape
        headDim = dim // self.nHeads
        wq = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="wq")
        wk = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="wk")
        wv = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="wv")
        wo = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="wo")

        xq, xk, xv = wq(x), wk(x), wv(x)
        if self.qkNorm:
            xq = nn.LayerNorm(dtype=self.dtype, name="qNorm")(xq)
            xk = nn.LayerNorm(dtype=self.dtype, name="kNorm")(xk)
        xq = xq.reshape(bs, seq, self.nHeads, headDim)
        xk = xk.reshape(bs, seq, self.nHeads, headDim)
        xv = xv.reshape(bs, seq, self.nHeads, headDim)

        pos = posEmbed.reshape(1, seq, self.nHeads, headDim).astype(xq.dtype)
        xq = xq + pos
        xk = xk + pos

        scale = 1.0 / math.sqrt(headDim)
        if cache is not None:
            ck, cv = cache
            ck = jax.lax.dynamic_update_slice(ck, xk.astype(ck.dtype), (0, offset, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, xv.astype(cv.dtype), (0, offset, 0, 0))
            cache = (ck, cv)
            kAll = ck[:, :offset + seq]
            vAll = cv[:, :offset + seq]
            logits = jnp.einsum("bqhd,bkhd->bhqk", xq, kAll,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(logits, -1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, vAll)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", xq, xk,
                                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(mask[None, None].astype(bool), logits, -1e9)
            probs = jax.nn.softmax(logits, -1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, xv)

        # gated cross-attention to condition features [bs, yLen, yDim]
        yLen = yFeat.shape[1]
        wky = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="wkY")
        wvy = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="wvY")
        gate = self.param("gate", nn.initializers.zeros, (self.nHeads,), jnp.float32)
        yk = wky(yFeat)
        if self.qkNorm:
            yk = nn.LayerNorm(dtype=self.dtype, name="kyNorm")(yk)
        yk = yk.reshape(bs, yLen, self.nHeads, headDim)
        yv = wvy(yFeat).reshape(bs, yLen, self.nHeads, headDim)
        yLogits = jnp.einsum("bqhd,bkhd->bhqk", xq, yk,
                             preferred_element_type=jnp.float32) * scale
        yProbs = jax.nn.softmax(yLogits, -1).astype(self.dtype)
        yOut = jnp.einsum("bhqk,bkhd->bqhd", yProbs, yv)
        yOut = yOut * jnp.tanh(gate).astype(self.dtype)[None, None, :, None]
        out = (out + yOut).reshape(bs, seq, dim)
        return wo(out), cache


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


class AnyResBlock(nn.Module):
    """TransformerBlock (generator_3.py:714-829).

    With `useAda=False`, the block is the sandwich-norm ablation variant
    (generator_3_self_attn_wo_ada.py:732-814): no adaLN shift/scale/gates,
    condition enters the sequence only through the first-level token.
    """
    nHeads: int
    qkNorm: bool = True
    normEps: float = 1e-5
    useAda: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, yEmb, yFeat, posEmbed, cache=None, offset: int = 0):
        dim = x.shape[-1]
        attnNorm = RMSNorm(self.normEps, self.dtype, name="attentionNorm")
        attnNorm1 = RMSNorm(self.normEps, self.dtype, name="attentionNorm1")
        ffnNorm = RMSNorm(self.normEps, self.dtype, name="ffnNorm")
        ffnNorm1 = RMSNorm(self.normEps, self.dtype, name="ffnNorm1")
        yNorm = RMSNorm(self.normEps, self.dtype, name="attentionYNorm")

        if self.useAda:
            ada = nn.Dense(6 * dim, dtype=self.dtype, name="adaLN",
                           kernel_init=nn.initializers.zeros)(nn.silu(yEmb))
            sMsa, scMsa, gMsa, sMlp, scMlp, gMlp = jnp.split(ada, 6, axis=-1)
            attnIn = _modulate(attnNorm(x), sMsa, scMsa)
        else:
            attnIn = attnNorm(x)
        attnOut, cache = AnyResAttention(self.nHeads, self.qkNorm, self.normEps,
                                         self.dtype, name="attention")(
            attnIn, mask, yNorm(yFeat), posEmbed, cache=cache, offset=offset)
        if self.useAda:
            x = x + attnNorm1(gMsa[:, None] * attnOut)
            ffnOut = SwiGLU(4 * dim, self.dtype, name="ffn")(
                _modulate(ffnNorm(x), sMlp, scMlp))
            x = x + ffnNorm1(gMlp[:, None] * ffnOut)
        else:
            x = x + attnNorm1(attnOut)
            x = x + ffnNorm1(SwiGLU(4 * dim, self.dtype, name="ffn")(ffnNorm(x)))
        return x, cache


class AnyResTransformer(nn.Module):
    """Transformer (generator_3.py:831-999)."""
    canvasSize: int         # largest scale
    hiddenSize: int
    depth: int
    nHeads: int
    vocabSize: int
    qkNorm: bool = True
    normEps: float = 1e-5
    useAda: bool = True
    # Gradient rematerialization over each transformer block (training path
    # only). At AnyRes_L scale (hidden 1536 x depth 24, generator_3.py:1483)
    # the teacher-forced activations otherwise dominate single-chip HBM.
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, mask, capPooled, capCond, caches=None, offset: int = 0):
        """tokens [bs, L, hidden-dim-in]; capPooled/capCond [bs, hidden].

        With `caches` (per-block (k, v) arrays), runs in KV-cached decode mode
        over the token slice starting at `offset` and returns (logits, caches);
        without, runs the full block-causal teacher-forced pass.
        """
        hs = self.hiddenSize
        x = nn.LayerNorm(dtype=self.dtype, name="tokenNorm")(tokens)
        x = nn.Dense(hs, dtype=self.dtype, name="tokenEmbed")(x)

        numPatches = self.canvasSize * self.canvasSize * 64
        posTable = self.param("posEmbed", _truncInit(2 / (5 * hs)), (numPatches, hs))
        posAll = jax.lax.stop_gradient(posTable)
        if caches is None:
            posEmbed = posAll[:x.shape[1]]
        else:
            posEmbed = jax.lax.dynamic_slice_in_dim(posAll, offset, x.shape[1], 0)

        capEmbN = nn.LayerNorm(dtype=self.dtype, name="capNorm")(capPooled)
        capEmb = nn.Dense(hs, dtype=self.dtype, name="capEmbed",
                          kernel_init=nn.initializers.zeros)(capEmbN)
        capCondN = nn.LayerNorm(dtype=self.dtype, name="capCondNorm")(capCond)
        capCondEmb = nn.Dense(hs, dtype=self.dtype, name="capCondEmbed")(capCondN)
        yFeat = capCondEmb[:, None]  # single-token condition sequence

        newCaches = [] if caches is not None else None
        # KV-cached decode never uses remat (no backward pass; rematting it
        # would only recompute the cache write).
        Block = (nn.remat(AnyResBlock, prevent_cse=False)
                 if self.remat and caches is None else AnyResBlock)
        for i in range(self.depth):
            blk = Block(self.nHeads, self.qkNorm, self.normEps, self.useAda,
                        self.dtype, name=f"block{i}")
            x, cache = blk(x, mask, capEmb, yFeat, posEmbed,
                           cache=None if caches is None else caches[i],
                           offset=offset)
            if newCaches is not None:
                newCaches.append(cache)

        # FinalLayer (generator_3.py:650-712; plain norm+linear in the NoAda
        # ablation, generator_3_self_attn_wo_ada.py:700-729)
        x = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="finalNorm")(x)
        if self.useAda:
            ada = nn.Dense(2 * hs, dtype=self.dtype, name="finalAdaLN",
                           kernel_init=nn.initializers.zeros)(nn.silu(capEmb))
            shift, scale = jnp.split(ada, 2, -1)
            x = _modulate(x, shift, scale)
        logits = nn.Dense(self.vocabSize, dtype=jnp.float32, name="finalLinear",
                          kernel_init=_truncInit(0.02 * (2 / (5 * hs)) ** 0.5))(x)
        if newCaches is not None:
            return logits, newCaches
        return logits


def blockCausalMask(lengths: Sequence[int]) -> jnp.ndarray:
    """Lower-triangular + full blocks on the diagonal (generator_3.py:1078-1088)."""
    import numpy as np
    total = sum(lengths)
    m = np.tril(np.ones((total, total), np.float32))
    cur = 0
    for l in lengths:
        m[cur:cur + l, cur:cur + l] = 1.0
        cur += l
    return jnp.asarray(m)


@GeneratorRegistry.register
class GeneratorV3SelfAttention(nn.Module):
    """Class-conditional next-scale generator (generator_3_self_attn.py:47-387)."""
    channel: int
    k: int
    size: Tuple[int, ...]
    denseNorm: bool = False
    qk_norm: bool = True
    norm_eps: float = 1e-5
    hiddenSize: int = 1536
    depth: int = 24
    nHeads: int = 16
    numClasses: int = IMAGENET_CLASSES
    # Text conditioning (reference GeneratorV3, generator_3.py:60-86): the
    # CLIP encoder runs OUTSIDE the graph; condition is then a precomputed
    # caption embedding [n, capDim] instead of int class ids.
    textConditioned: bool = False
    capDim: int = 512
    useAda: bool = True
    # Remat each transformer block in the teacher-forced pass (see
    # AnyResTransformer.remat); required to train AnyRes_L on one chip.
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.compressor = Neon(channel=self.channel, k=self.k, size=tuple(self.size),
                               denseNorm=self.denseNorm, useRemat=False)
        hs = self.hiddenSize
        std = math.sqrt(2 / (5 * hs))
        if self.textConditioned:
            self.capProj = nn.Dense(hs, dtype=self.dtype)
        else:
            # +1 row: learned null/unconditional embedding (class id == -1 or
            # numClasses) — covers the reference's unconditional variant
            # (uc_generator.py) and CFG-style null conditioning.
            self.classEmbed = self.param("classEmbed", _truncInit(std),
                                         (self.numClasses + 1, hs))
        # Own scaffold: hidden-size codebook + per-scale restore heads
        # (generator_3_self_attn.py:101-137).
        self.scaffoldCodebook = self.param("scaffoldCodebook", _truncInit(std),
                                           (1, self.k, hs))
        decoders = []
        lastSize = self.size[0] * 2
        for thisSize in self.size:
            if thisSize == lastSize // 2:
                decoders.append(pixelShuffle3x3(hs, rate=2, dtype=self.dtype))
            elif thisSize == lastSize:
                decoders.append(conv3x3(hs, dtype=self.dtype))
            else:
                raise ValueError("size sequence must halve or repeat")
            lastSize = thisSize
        self._decoders = decoders

        canvas = max(self.size)
        self.transformer = AnyResTransformer(
            canvasSize=canvas, hiddenSize=hs, depth=self.depth, nHeads=self.nHeads,
            vocabSize=self.k, qkNorm=self.qk_norm, normEps=self.norm_eps,
            useAda=self.useAda, remat=self.remat, dtype=self.dtype)
        self.firstLevelPosEmbed = self.param(
            "firstLevelPosEmbed", _truncInit(std), (canvas * canvas, hs))
        self.levelEmbed = self.param("levelEmbed", _truncInit(std),
                                     (len(self.size), hs))
        self.capToFirstNorm = nn.LayerNorm(dtype=self.dtype)
        self.capToFirst = nn.Dense(hs, dtype=self.dtype)

        lengths = [s * s for s in sorted(self.size)]
        self._lengths = lengths
        self._mask = blockCausalMask(lengths)

    # ------------------------------------------------------------- scaffold
    def residual_forward(self, code, formerLevel, level: int):
        """Own feature pyramid (generator_3_self_attn.py:164-172); code
        [n,h,w,1], level 0 = smallest scale."""
        i = len(self.size) - 1 - level
        quantized = vqDequantizeCodes(code, self.scaffoldCodebook)
        if formerLevel is not None:
            quantized = quantized + formerLevel
        return self._decoders[i](quantized)

    def _centerPosEmbed(self, h, w):
        canvas = max(self.size)
        table = self.firstLevelPosEmbed.reshape(canvas, canvas, -1)
        top = (canvas - h) // 2
        left = (canvas - w) // 2
        return table[top:top + h, left:left + w].reshape(h * w, -1)

    def _assembleSequence(self, scaffolds, capPooled, bs):
        """Concatenate per-level inputs (generator_3.py:1114-1156).

        scaffolds: list (len = levels-1) of NHWC features for levels 1..L-1;
        level 0 input comes from the condition + canvas pos-embed crop.
        """
        parts = []
        h0 = w0 = int(math.isqrt(self._lengths[0]))
        first = self._centerPosEmbed(h0, w0)[None]                   # [1, hw, hs]
        first = first + self.capToFirst(self.capToFirstNorm(capPooled))[:, None]
        parts.append(first + self.levelEmbed[0])
        for level, feat in enumerate(scaffolds, start=1):
            n, h, w, c = feat.shape
            tok = feat.reshape(n, h * w, c) + self.levelEmbed[level]
            parts.append(tok.astype(first.dtype))
        return jnp.concatenate(
            [jnp.broadcast_to(p, (bs, *p.shape[1:])) for p in parts], 1)

    def _condEmbed(self, condition):
        """Pooled condition embedding: class table lookup, or caption
        projection when textConditioned (generator_3.py cap_embedder path)."""
        if self.textConditioned:
            return self.capProj(condition.astype(self.dtype))
        # id -1 (or numClasses) selects the null/unconditional embedding
        idx = jnp.where(condition < 0, self.numClasses, condition)
        return self.classEmbed[idx].astype(self.dtype)

    # -------------------------------------------------------------- training
    def __call__(self, image, condition, train: bool = True):
        """image [n,h,w,3] in [-1,1]; condition [n] int class ids.

        Returns (predictions, scalar loss, codes, restored preview, perLevelCE).
        """
        # frozen tokenizer (fp32, no grads; generator_3_self_attn.py:235-237)
        codes = [jax.lax.stop_gradient(c)
                 for c in self.compressor.encode(image.astype(jnp.float32))]
        # The scaffold/sequence lengths use `size` literally, so the declared
        # pyramid must match the tokenizer's actual code grids (a mismatch
        # otherwise surfaces as an opaque broadcasting error deep in
        # residual_forward).
        expect = sorted(self.size)
        for lv, code in enumerate(codes):
            if code.shape[1] != expect[lv] or code.shape[2] != expect[lv]:
                raise ValueError(
                    f"config size {tuple(self.size)} does not match the tokenizer: "
                    f"level {lv} code grid is {code.shape[1]}x{code.shape[2]}, expected "
                    f"{expect[lv]}x{expect[lv]} for input {image.shape[1]}x{image.shape[2]} "
                    f"(input -> latent is /8 and size[0] must equal latent/2, e.g. 256 -> 16)")

        scaffolds = []
        former = None
        for level, code in enumerate(codes[:-1]):
            former = self.residual_forward(code, former, level)
            scaffolds.append(former)

        bs = image.shape[0]
        capPooled = self._condEmbed(condition)
        seq = self._assembleSequence([s.astype(self.dtype) for s in scaffolds],
                                     capPooled, bs)
        logits = self.transformer(seq, self._mask, capPooled, capPooled)

        # per-level label-smoothed area-weighted CE
        # (generator_3_self_attn.py:282-310)
        losses, predictions = [], []
        cur = 0
        totalLen = sum(self._lengths)
        for lv, code in enumerate(codes):
            n, h, w, _ = code.shape
            pre = logits[:, cur:cur + h * w]                         # [n, hw, k]
            predictions.append(pre.reshape(n, h, w, self.k))
            gt = code[..., 0].reshape(n, h * w)
            logp = jax.nn.log_softmax(pre, -1)
            smooth = 0.1
            nll = -(1 - smooth) * jnp.take_along_axis(logp, gt[..., None], -1)[..., 0] \
                  - smooth * jnp.mean(logp, -1)
            losses.append((h * w, nll))
            cur += h * w
        loss = sum(hw * jnp.sum(l) for hw, l in losses) / bs / (cur + 1)
        perLevel = [jnp.mean(l) for _, l in losses]
        # greedy-decode preview through the frozen decoder (reference
        # generator_3_self_attn.py:300-307); also ensures decode params init.
        restoredCodes = [jax.lax.stop_gradient(jnp.argmax(p, -1))[..., None]
                         for p in predictions]
        restored = jax.lax.stop_gradient(self.compressor.decode(restoredCodes))
        return predictions, loss, codes, restored, perLevel

    # ------------------------------------------------------------- inference
    def generate(self, condition, rng=None, temperature: float = 1.0,
                 topK: int = 0, kvCache: bool = True):
        """AR next-scale sampling (generator_3_self_attn.py:315-387).

        Default: KV-cached per-level decoding (each level runs the
        transformer only over its own tokens; keys/values of earlier levels
        are cached — the block-causal structure makes this exact). With
        `kvCache=False`, re-runs the full growing prefix each level (the
        reference's behavior) — useful as an equivalence oracle.
        Returns (codes small→large, restored image from the frozen decoder).
        """
        bs = condition.shape[0]
        capPooled = self._condEmbed(condition)
        L = len(self._lengths)
        hs = self.hiddenSize
        hd = hs // self.nHeads
        total = sum(self._lengths)

        caches = None
        if kvCache:
            caches = [(jnp.zeros((bs, total, self.nHeads, hd), self.dtype),
                       jnp.zeros((bs, total, self.nHeads, hd), self.dtype))
                      for _ in range(self.depth)]

        def sampleTokens(levelLogits, rng):
            if rng is None:
                return jnp.argmax(levelLogits, -1), rng
            rng, sub = jax.random.split(rng)
            scaled = levelLogits / max(temperature, 1e-6)
            if topK > 0:
                kth = jnp.sort(scaled, -1)[..., -topK][..., None]
                scaled = jnp.where(scaled < kth, -1e9, scaled)
            return jax.random.categorical(sub, scaled), rng

        predictions = []
        scaffolds = []
        former = None
        offset = 0
        for level in range(L):
            hw = self._lengths[level]
            if kvCache:
                # per-level input tokens only (same construction as training's
                # _assembleSequence for this block)
                if level == 0:
                    h0 = w0 = int(math.isqrt(hw))
                    tok = self._centerPosEmbed(h0, w0)[None] \
                        + self.capToFirst(self.capToFirstNorm(capPooled))[:, None] \
                        + self.levelEmbed[0]
                    tok = jnp.broadcast_to(tok, (bs, hw, tok.shape[-1]))
                else:
                    n, h, w, c = former.shape
                    tok = (former.reshape(n, h * w, c)
                           + self.levelEmbed[level]).astype(jnp.float32)
                logits, caches = self.transformer(tok.astype(self.dtype), None,
                                                  capPooled, capPooled,
                                                  caches=caches, offset=offset)
                levelLogits = logits
            else:
                seq = self._assembleSequence(scaffolds, capPooled, bs)
                prefixLen = seq.shape[1]
                mask = self._mask[:prefixLen, :prefixLen]
                logits = self.transformer(seq, mask, capPooled, capPooled)
                levelLogits = logits[:, prefixLen - hw:]              # [bs, hw, k]

            token, rng = sampleTokens(levelLogits, rng)
            h = w = int(math.isqrt(hw))
            code = token.reshape(bs, h, w, 1).astype(jnp.int32)
            predictions.append(code)
            offset += hw
            if level < L - 1:
                former = self.residual_forward(code, former, level)
                scaffolds.append(former)

        restored = self.compressor.decode(predictions)
        return predictions, restored


@GeneratorRegistry.register
class GeneratorV3SelfAttentionNoAda(GeneratorV3SelfAttention):
    """Ablation variant without adaLN modulation
    (generator_3_self_attn_wo_ada.py:47): sandwich-norm transformer blocks,
    plain final norm+linear; the condition reaches the sequence only through
    the first-level token."""
    useAda: bool = False


def AnyResConfigs():
    """Size table (generator_3.py:1384-1428)."""
    return {
        "AnyRes_XL": dict(depth=28, hiddenSize=2304, nHeads=16),
        "AnyRes_L": dict(depth=24, hiddenSize=1536, nHeads=16),
        "AnyRes_B": dict(depth=20, hiddenSize=1152, nHeads=16),
        "AnyRes_S": dict(depth=16, hiddenSize=768, nHeads=16),
    }
