"""Functional NN primitives with custom gradients.

TPU-native equivalents of reference `mcquic/nn/base.py`:
  * `lowerBound`      — max(x, bound) with straight-through-ish gradient
                        (`base.py:17-29`), via jax.custom_vjp.
  * nonneg reparam    — (`base.py:57-84`) as init/apply function pair.
  * `logExpMinusOne`  — (`base.py:87-111`).
  * `gumbelSoftmax`   — hard straight-through sampling (`base.py:118-133`),
                        explicit PRNG key instead of global torch RNG.
  * `pixelShuffle` / `pixelUnshuffle` — NHWC layout (torch uses NCHW); pure
    reshape/transpose so XLA fuses them into neighboring convs.
"""

import jax
import jax.numpy as jnp

from mcquic_tpu.consts import Consts


# ---------------------------------------------------------------- lower bound
@jax.custom_vjp
def lowerBound(x, bound):
    return jnp.maximum(x, bound)


def _lowerBound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lowerBound_bwd(res, g):
    x, bound = res
    # Pass gradient if already above the bound, or if the gradient pushes x up
    # (i.e. g < 0 under gradient-descent convention). Reference base.py:26-29.
    passThrough = (x >= bound) | (g < 0)
    return (passThrough.astype(g.dtype) * g, None)


lowerBound.defvjp(_lowerBound_fwd, _lowerBound_bwd)


# ------------------------------------------------------- non-negative reparam
def nonNegativeInit(x, minimum: float = 0.0, eps: float = Consts.Eps):
    """Map an initial non-negative target value into reparam space."""
    eps2 = eps * eps
    return jnp.sqrt(jnp.maximum(x + eps2, eps2))


def nonNegativeApply(x, minimum: float = 0.0, eps: float = Consts.Eps):
    """Recover the (>= minimum) value from reparam space with safe gradients."""
    eps2 = eps * eps
    bound = (minimum + eps2) ** 0.5
    out = lowerBound(x, jnp.asarray(bound, x.dtype))
    return out * out - eps2


# ------------------------------------------------------------ logExpMinusOne
@jax.custom_vjp
def logExpMinusOne(x):
    eps = jnp.finfo(jnp.float32).eps
    return jnp.log(jnp.exp(x) - 1 + eps)


def _lemo_fwd(x):
    return logExpMinusOne(x), x


def _lemo_bwd(x, g):
    eps = jnp.finfo(jnp.float32).eps
    bound = jnp.log((1 + eps) / eps)
    passThrough = x > bound
    ex = jnp.exp(x)
    grad = jnp.where(passThrough, g, g * ex / (ex - 1 + eps))
    return (grad,)


logExpMinusOne.defvjp(_lemo_fwd, _lemo_bwd)


# ------------------------------------------------------------- gumbel softmax
def gumbelSoftmax(key, logits, temperature: float = 1.0, hard: bool = True, axis: int = -1):
    """Gumbel-softmax with optional hard straight-through (base.py:118-133)."""
    eps = jnp.finfo(logits.dtype).eps
    uniforms = jnp.clip(jax.random.uniform(key, logits.shape, logits.dtype), eps, 1 - eps)
    gumbels = -jnp.log(-jnp.log(uniforms))
    ySoft = jax.nn.softmax((logits + gumbels) / temperature, axis=axis)
    if not hard:
        return ySoft
    index = jnp.argmax(ySoft, axis=axis)
    yHard = jax.nn.one_hot(index, logits.shape[axis], axis=axis, dtype=logits.dtype)
    # Straight-through: forward = yHard, gradient flows through ySoft.
    return yHard + ySoft - jax.lax.stop_gradient(ySoft)


def oneHot(x, numClasses: int, dtype=jnp.float32):
    return jax.nn.one_hot(x, numClasses, dtype=dtype)


# ------------------------------------------------------------- pixel shuffle
def pixelShuffle(x, r: int):
    """NHWC pixel shuffle: [n,h,w,c*r*r] -> [n,h*r,w*r,c].

    Channel index is interpreted as (c, i, j) with i,j the sub-pixel offsets,
    matching torch.nn.PixelShuffle semantics modulo the NCHW->NHWC transpose,
    so reference weights are convertible by a pure permutation.
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, c
    return x.reshape(n, h * r, w * r, c)


def pixelUnshuffle(x, r: int):
    """NHWC pixel unshuffle: [n,h*r,w*r,c] -> [n,h,w,c*r*r]."""
    n, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, r, r
    return x.reshape(n, h, w, c * r * r)


def subpixelTransposeKernel(W, r: int):
    """Rearrange a subpixel-conv kernel [k,k,cin,c*r*r] (output channels in
    (c,i,j) shuffle order) into the equivalent transposed-conv kernel
    [r*k, r*k, cin, c] for `lax.conv_general_dilated(lhs_dilation=r)`.

    Derivation: out[r*p+i, r*q+j, c] = sum_{u,v} W[u,v,:,c*r*r? ...] x[p+u-pad]
    maps to a correlation over the r-dilated input with kernel index
    kappa = i + r*(k-1-u) and a final spatial flip for correlation form.
    FLOP-exact: r*k kernel at stride-r dilation performs exactly k*k taps per
    output pixel — same MACs as conv-then-shuffle, but XLA emits no transpose
    (the round-1 profile measured ~3.7 ms per shuffle transpose at /2 res on
    the target chip; the v1 decoder has 5 of them — NOTES.md)."""
    k, _, cin, crr = W.shape
    c = crr // (r * r)
    # correlation flip composed with the kappa = i + r*(k-1-u) layout leaves
    # taps unflipped and flips only the phase axes
    Wr = W.reshape(k, k, cin, c, r, r)[..., ::-1, ::-1]
    return Wr.transpose(0, 4, 1, 5, 2, 3).reshape(k * r, k * r, cin, c)


def subpixelConvTranspose(x, W, bias, r: int):
    """conv(k)+pixelShuffle(r) computed as ONE transposed conv (see
    subpixelTransposeKernel). `bias` is the conv's per-(c,i,j) bias or None;
    it is phase-dependent so it is broadcast-added after the conv (pure
    reshape + add, fused by XLA)."""
    k = W.shape[0]
    pad = k // 2
    Kf = subpixelTransposeKernel(W, r)
    kLen = r * k
    offA = r * (k - 1 - pad)
    padLo = kLen - 1 - offA
    padHi = r * k + r - 2 - padLo
    y = jax.lax.conv_general_dilated(
        x, Kf, window_strides=(1, 1),
        padding=((padLo, padHi), (padLo, padHi)), lhs_dilation=(r, r),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        n, hr, wr, c = y.shape
        bPhase = bias.reshape(c, r, r).transpose(1, 2, 0)  # [r, r, c]
        y = (y.reshape(n, hr // r, r, wr // r, r, c)
             + bPhase[None, None, :, None, :, :]).reshape(n, hr, wr, c)
    return y
