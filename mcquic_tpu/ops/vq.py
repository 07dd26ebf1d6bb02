"""Multi-codebook vector-quantization ops (functional core).

TPU-native equivalents of reference `mcquic/modules/quantizer.py:99-274`:
  * `vqDistance` / `vqLogits` — L2 distance between grouped latents and
    codebooks via one MXU einsum with fp32 accumulation
    (reference `_distance`, quantizer.py:153-179; the k-last-dim layout rule
    from quantizer.py:95-98 is the natural layout here: k rides the 128-wide
    lane dimension).
  * `vqEncode` — distance argmin (`quantizer.py:144-150`). A fused Pallas
    kernel (ops/vq_pallas.py) replaces the materialized [.., k] distance
    tensor on TPU for the inference hot path.
  * `vqDequantizeCodes` / `vqDequantizeSoft` — gather / soft decode
    (`quantizer.py:249-274`).
  * `randomDrop` — frequency-biased logit masking (`quantizer.py:194-200`).
  * `reassignCodebook` — dead-code reassignment (`quantizer.py:111-136`),
    re-expressed with static shapes (sort + cumsum ranking) so it jits.

Layout convention: latents NHWC `[n, h, w, m*d]`, grouped view `[n, h, w, m, d]`,
codes `[n, h, w, m]` (transposed to the reference `[n, m, h, w]` only at the
container/entropy-coder boundary).
"""
import math

import jax
import jax.numpy as jnp

from mcquic_tpu.consts import Consts


def groupLatent(x: jax.Array, m: int) -> jax.Array:
    """[n, h, w, m*d] -> [n, h, w, m, d]"""
    n, h, w, c = x.shape
    return x.reshape(n, h, w, m, c // m)


def ungroupLatent(x: jax.Array) -> jax.Array:
    """[n, h, w, m, d] -> [n, h, w, m*d]"""
    n, h, w, m, d = x.shape
    return x.reshape(n, h, w, m * d)


def vqDistance(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Squared L2 distance.

    Args:
        x: [n, h, w, m, d] grouped latent.
        codebook: [m, k, d].
    Returns:
        [n, h, w, m, k] distances (fp32).
    """
    x = x.astype(jnp.float32)
    c = codebook.astype(jnp.float32)
    x2 = jnp.sum(x * x, -1, keepdims=True)                       # [n,h,w,m,1]
    c2 = jnp.sum(c * c, -1)                                      # [m,k]
    inter = jnp.einsum("nhwmd,mkd->nhwmk", x, c,
                       preferred_element_type=jnp.float32)       # MXU
    return x2 + c2 - 2.0 * inter


def vqLogits(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """-distance / sqrt(k)  (reference `_logit`, quantizer.py:181-183)."""
    k = codebook.shape[1]
    return -vqDistance(x, codebook) / math.sqrt(k)


def _usePallasEncode(x: jax.Array, codebook: jax.Array) -> bool:
    import os
    if os.environ.get("MCQUIC_PALLAS") != "1":
        # Opt-in. vqEncodeFused routes to the VMEM-resident kernel for every
        # reference geometry (the codebook streams from HBM exactly once per
        # token tile grid, not once per tile — vq_pallas.py); measured
        # roughly at par with the chunked XLA scan on the throttled v5e
        # (2.36 vs 2.0 ms at qp-2 level 0, scripts/vq_probe.py), so the
        # chunked path — same no-materialization property — stays the
        # default. The old (T x K)-grid kernel that measured ~100x slower is
        # no longer reachable from here (only as the too-big-for-VMEM
        # fallback inside vqEncodeFused).
        return False
    if jax.default_backend() != "tpu":
        return False
    k, d = codebook.shape[1], codebook.shape[2]
    tokens = x.shape[0] * x.shape[1] * x.shape[2]
    return k >= 128 and d <= 512 and tokens >= 8


def vqEncodeChunked(x: jax.Array, codebook: jax.Array, chunk: int = 1024) -> jax.Array:
    """Nearest-codeword indices without materializing [.., k] distances.

    Scans codebook chunks with a running (min, argmin) carry — the XLA
    analogue of the fused Pallas kernel (ops/vq_pallas.py), used when Mosaic
    isn't available/enabled. Memory: O(T * chunk) instead of O(T * k).

    Args:
        x: [n, h, w, m, d]; codebook: [m, k, d].
    Returns:
        codes [n, h, w, m] int32.
    """
    n, h, w, m, d = x.shape
    k = codebook.shape[1]
    xT = x.reshape(n * h * w, m, d).transpose(1, 0, 2).astype(jnp.float32)  # [m,T,d]
    pad = (-k) % chunk
    cb = codebook.astype(jnp.float32)
    if pad:
        cb = jnp.pad(cb, ((0, 0), (0, pad), (0, 0)), constant_values=1e4)
    nChunks = cb.shape[1] // chunk
    cbChunks = cb.reshape(m, nChunks, chunk, d).transpose(1, 0, 2, 3)  # [C,m,chunk,d]

    T = n * h * w
    init = (jnp.full((m, T), jnp.inf, jnp.float32), jnp.zeros((m, T), jnp.int32))

    def body(carry, inp):
        best, barg = carry
        ci, cbC = inp
        c2 = jnp.sum(cbC * cbC, -1)                                  # [m,chunk]
        scores = jnp.einsum("mtd,mkd->mtk", xT, cbC,
                            preferred_element_type=jnp.float32)
        dist = c2[:, None, :] - 2.0 * scores                          # [m,T,chunk]
        localMin = jnp.min(dist, -1)
        localArg = jnp.argmin(dist, -1).astype(jnp.int32) + ci * chunk
        better = localMin < best
        return (jnp.where(better, localMin, best),
                jnp.where(better, localArg, barg)), None

    (best, barg), _ = jax.lax.scan(
        body, init, (jnp.arange(nChunks, dtype=jnp.int32), cbChunks))
    return barg.transpose(1, 0).reshape(n, h, w, m)


def vqEncode(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Nearest-codeword indices.

    Args:
        x: [n, h, w, m, d]; codebook: [m, k, d].
    Returns:
        codes [n, h, w, m] int32.

    Dispatch: fused Pallas kernel when MCQUIC_PALLAS=1 on TPU
    (ops/vq_pallas.py); chunked scan for large k (avoids the [.., k]
    materialization the reference suffers, quantizer.py:153-179); plain
    einsum + argmin for small shapes.

    Note: x2 is constant w.r.t. argmin, so it is omitted (saves a VPU pass).
    """
    if _usePallasEncode(x, codebook):
        from mcquic_tpu.ops.vq_pallas import vqEncodeFused
        return vqEncodeFused(x, codebook)
    k = codebook.shape[1]
    tokens = x.shape[0] * x.shape[1] * x.shape[2]
    if k > 1024 and tokens * x.shape[3] * k >= (1 << 24):
        return vqEncodeChunked(x, codebook)
    x = x.astype(jnp.float32)
    c = codebook.astype(jnp.float32)
    c2 = jnp.sum(c * c, -1)                                      # [m,k]
    inter = jnp.einsum("nhwmd,mkd->nhwmk", x, c,
                       preferred_element_type=jnp.float32)
    return jnp.argmin(c2 - 2.0 * inter, axis=-1).astype(jnp.int32)


def vqDequantizeCodes(codes: jax.Array, codebook: jax.Array) -> jax.Array:
    """Gather decode (reference quantizer.py:249-259).

    Args:
        codes: [n, h, w, m] int; codebook: [m, k, d].
    Returns:
        [n, h, w, m*d].
    """
    m, k, d = codebook.shape
    # Flat row gather: [m,k,d] -> [m*k,d], index = code + group offset.
    # Lowers to a single contiguous-row gather (cheaper than the nested
    # take_along_axis form).
    flat = codebook.reshape(m * k, d)
    idx = codes.astype(jnp.int32) + (jnp.arange(m, dtype=jnp.int32) * k)
    gathered = jnp.take(flat, idx, axis=0)                        # [n,h,w,m,d]
    return ungroupLatent(gathered)


def vqDequantizeSoft(sample: jax.Array, codebook: jax.Array) -> jax.Array:
    """Soft decode: [n,h,w,m,k] x [m,k,d] -> [n,h,w,m*d] (quantizer.py:262-274)."""
    out = jnp.einsum("nhwmk,mkd->nhwmd", sample.astype(jnp.float32),
                     codebook.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return ungroupLatent(out)


def randomDrop(key: jax.Array, logit: jax.Array, freqEMA: jax.Array) -> jax.Array:
    """Frequency-biased random logit suppression (quantizer.py:194-200).

    High-frequency codes are randomly masked out (logit += -1e9) with a rate
    that anneals with overall code usage: at 0 usage the exponent is `bits`
    (aggressive dropping), at full usage it is 1.

    Args:
        logit: [n, h, w, m, k]; freqEMA: [m, k] (normalized frequencies).
    """
    k = logit.shape[-1]
    bits = math.log2(k)
    codeUsage = jnp.clip(jnp.mean((freqEMA > Consts.Eps).astype(jnp.float32)), 0.0, 1.0)
    exponent = -(bits - 1) * (codeUsage ** 2) + bits
    u = jax.random.uniform(key, logit.shape, jnp.float32)
    mask = (u ** exponent) < freqEMA[None, None, None]
    return logit + jnp.where(mask, -1e9, 0.0)


def reassignCodebook(key: jax.Array, codebook: jax.Array, freq: jax.Array,
                     eps: float = Consts.Eps):
    """Dead-codeword reassignment, jit-safe (quantizer.py:111-136 semantics).

    For each group: codewords with (normalized) frequency < eps are replaced
    by the most-frequently-used codewords (in usage order). If more than half
    the codebook is dead, only a random half-codebook subset is replaced this
    round (the reference's random drop of excess dead slots).

    Args:
        codebook: [m, k, d]; freq: [m, k].
    Returns:
        (newCodebook [m,k,d], changedProportion scalar in [0,1])
    """
    m, k, d = codebook.shape

    def perGroup(key, cb, fr):
        neverAssigned = fr < eps
        total = jnp.sum(neverAssigned)
        # Random subset of size k//2 when too many dead: rank dead slots by a
        # random score and keep the k//2 smallest.
        r = jax.random.uniform(key, (k,))
        score = jnp.where(neverAssigned, r, jnp.inf)
        kth = jnp.sort(score)[k // 2 - 1]
        limited = neverAssigned & (score <= kth)
        replace = jnp.where(total > k // 2, limited, neverAssigned)

        # Most-used codewords in descending frequency order.
        argIdx = jnp.argsort(-fr)
        mostAssigned = cb[argIdx]
        # The i-th replaced slot (in index order) takes mostAssigned[i].
        rank = jnp.cumsum(replace.astype(jnp.int32)) - 1
        donor = mostAssigned[jnp.clip(rank, 0, k - 1)]
        newCb = jnp.where(replace[:, None], donor, cb)
        changed = jnp.sum((newCb - cb) ** 2, -1) > 1e-4
        return newCb, changed

    keys = jax.random.split(key, m)
    newCodebook, changed = jax.vmap(perGroup)(keys, codebook, freq)
    return newCodebook, jnp.mean(changed.astype(jnp.float32))
