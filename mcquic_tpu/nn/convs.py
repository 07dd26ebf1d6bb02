"""Convolution wrappers (NHWC) as flax.linen modules.

Parity with reference `mcquic/nn/convs.py` (conv3x3/conv1x1/conv5x5,
pixelShuffle{1x1,3x3,5x5}, MaskedConv2d) but laid out channels-last for TPU:
NHWC activations + HWIO kernels map directly onto MXU-tiled XLA convolutions.
"""
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mcquic_tpu.nn.functional import pixelShuffle, pixelUnshuffle

Dtype = Any


def defaultKernelInit():
    """torch Conv2d default init: kaiming_uniform(a=sqrt(5)) = U(+-1/sqrt(fan_in)),
    variance 1/(3*fan_in) — 3x smaller than flax's lecun_normal.

    The reference conv stacks set no custom init anywhere (mcquic/nn/*.py,
    modules/compressor.py, modules/quantizer.py), so its training stability
    implicitly depends on this scale. That dependence is real: at Neon
    channel-256 17-level geometry (configs/a800_8.yaml) the extra sqrt(3)
    per conv of lecun_normal compounds across the ~10^2-conv quantizer+decoder
    chain into ~1e13 activations at init, and the IGDN cascade
    (y = x*sqrt(1+0.1*x^2), super-linear for large x) turns that into an fp32
    overflow -> NaN on the very first step (reproduced on CPU, round-3 NOTES).
    With the torch-scale init the same forward is finite and the loss sane.
    Bias stays zeros (flax default): torch's U(+-1/sqrt(fan_in)) bias only
    breaks symmetry, it cannot amplify."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class Conv(nn.Module):
    """kxk conv with 'same'-style pre-computed padding (reference convs.py:77-123).

    `kernelInit=None` uses the torch-default-matching scale (see
    `defaultKernelInit`); pass e.g. `nn.initializers.zeros` for zero-init
    output heads (same parameter tree, only the init distribution changes)."""
    features: int
    kernel: int = 3
    stride: int = 1
    useBias: bool = True
    groups: int = 1
    kernelInit: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        kwargs = {"kernel_init": self.kernelInit if self.kernelInit is not None
                  else defaultKernelInit()}
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.useBias,
            feature_group_count=self.groups,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            **kwargs,
        )(x)


def conv3x3(features: int, stride: int = 1, bias: bool = True, groups: int = 1,
            kernelInit=None, dtype=jnp.float32) -> Conv:
    return Conv(features=features, kernel=3, stride=stride, useBias=bias, groups=groups,
                kernelInit=kernelInit, dtype=dtype)


def conv5x5(features: int, stride: int = 1, bias: bool = True, groups: int = 1, dtype=jnp.float32) -> Conv:
    return Conv(features=features, kernel=5, stride=stride, useBias=bias, groups=groups, dtype=dtype)


def conv1x1(features: int, stride: int = 1, bias: bool = True, groups: int = 1, dtype=jnp.float32) -> Conv:
    return Conv(features=features, kernel=1, stride=stride, useBias=bias, groups=groups, dtype=dtype)


def subpixelMode() -> str:
    """'shuffle' (conv then reshape/transpose) or 'deconv' (one transposed
    conv, FLOP-exact, no transpose ops — see functional.subpixelConvTranspose).
    Read at trace time; identical parameters and outputs either way.

    Default: 'deconv' on TPU backends (measured 17% faster qp-2 decode on
    v5e — 44.0 vs 52.8 ms/iter, scripts/microbench_decoder.py), 'shuffle'
    elsewhere (CPU lowers dilated convs poorly)."""
    import os
    mode = os.environ.get("MCQUIC_SUBPIXEL", "")
    if mode:
        return mode
    import jax
    return "deconv" if jax.default_backend() in ("tpu", "axon") else "shuffle"


def thinHeadMode() -> str:
    """'pallas' routes thin (<32 feature) shuffle heads through the fused
    conv+depth-to-space kernel (ops/subpixel_pallas.py); 'xla' (default)
    keeps the lax conv path. Opt-in until measured per-chip — set
    MCQUIC_THINHEAD=pallas."""
    import os
    return os.environ.get("MCQUIC_THINHEAD", "xla")


class _UpConv(nn.Module):
    """conv(k, c*r*r) + depth-to-space, with a mode switch between the
    shuffle and transposed-conv formulations. Param tree matches nn.Conv
    (`kernel`/`bias`) so checkpoints are layout-independent."""
    features: int            # output channels AFTER shuffle
    kernel: int
    rate: int
    groups: int = 1
    useBias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax.lax as lax

        from mcquic_tpu.nn.functional import subpixelConvTranspose

        k, r = self.kernel, self.rate
        pad = k // 2
        inC = x.shape[-1]
        outC = self.features * r * r
        kernelShape = (k, k, inC // self.groups, outC)
        W = self.param("kernel", defaultKernelInit(), kernelShape,
                       jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (outC,), jnp.float32)
             if self.useBias else None)
        xc = x.astype(self.dtype)
        Wc = W.astype(self.dtype)
        bc = b.astype(self.dtype) if b is not None else None
        # Hybrid dispatch (measured on v5e, scripts/decode_breakdown.py):
        # the transposed-conv formulation wins for WIDE up-convs (128->512:
        # no shuffle transposes), but LOSES for thin output heads — the
        # final RGB stage (features=3) ran 6.13 ms/iter as a 3-lane
        # full-res deconv vs 4.72 ms as conv(->12)+depth-to-space, because
        # the MXU lane tax at 3 channels dwarfs the shuffle's small D2S.
        if (subpixelMode() == "deconv" and self.groups == 1
                and self.features >= 32):
            return subpixelConvTranspose(xc, Wc, bc, r)
        # Thin-head Pallas path (MCQUIC_THINHEAD=pallas): the scatter-layout
        # fused conv+shuffle kernel removes the 12->128 MXU lane pad of the
        # final RGB stage (ops/subpixel_pallas.py; ~9x fewer padded FLOPs).
        if (thinHeadMode() == "pallas" and self.groups == 1 and k == 3
                and self.features < 32):
            import jax

            from mcquic_tpu.ops.subpixel_pallas import (conv3x3SubpixelThin,
                                                        thinHeadSupported)
            # pallas_call has no autodiff rule and only lowers on TPU (CPU
            # via interpret): when this head is being differentiated
            # (stage-1 trains the decoder's RGB stage) or the backend is
            # neither, fall through to the lax path instead of erroring.
            differentiated = any(
                type(t).__module__.endswith("interpreters.ad")
                for t in (xc, Wc))
            if (jax.default_backend() in ("tpu", "axon", "cpu")
                    and not differentiated
                    and thinHeadSupported(xc.shape, Wc.shape, r)):
                return conv3x3SubpixelThin(
                    xc, Wc, bc, rate=r,
                    interpret=jax.default_backend() == "cpu")
        y = lax.conv_general_dilated(
            xc, Wc, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bc is not None:
            y = y + bc
        return pixelShuffle(y, r)


class PixelShuffleConv(nn.Module):
    """conv(k) + pixel shuffle up/down-sampling (reference convs.py:151-255).

    `rate > 1`: conv to features*r^2 then shuffle up.
    `rate < 1`: conv to features/r^2 then unshuffle down (r = 1/rate).
    """
    features: int
    kernel: int = 3
    rate: float = 1
    groups: int = 1
    useBias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        if self.rate < 1:
            r = int(round(1 / self.rate))
            y = nn.Conv(self.features // (r * r), (self.kernel, self.kernel),
                        padding=((pad, pad), (pad, pad)), use_bias=self.useBias,
                        feature_group_count=self.groups, kernel_init=defaultKernelInit(),
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            return pixelUnshuffle(y, r)
        r = int(self.rate)
        if r == 1:
            return nn.Conv(self.features, (self.kernel, self.kernel),
                           padding=((pad, pad), (pad, pad)), use_bias=self.useBias,
                           feature_group_count=self.groups, kernel_init=defaultKernelInit(),
                           dtype=self.dtype, param_dtype=jnp.float32)(x)
        return _UpConv(self.features, self.kernel, r, self.groups,
                       self.useBias, self.dtype, name="Conv_0")(x)


def pixelShuffle3x3(features: int, rate: float = 1, groups: int = 1, dtype=jnp.float32) -> PixelShuffleConv:
    return PixelShuffleConv(features=features, kernel=3, rate=rate, groups=groups, dtype=dtype)


def pixelShuffle5x5(features: int, rate: float = 1, groups: int = 1, dtype=jnp.float32) -> PixelShuffleConv:
    return PixelShuffleConv(features=features, kernel=5, rate=rate, groups=groups, dtype=dtype)


def pixelShuffle1x1(features: int, rate: float = 1, groups: int = 1, dtype=jnp.float32) -> PixelShuffleConv:
    return PixelShuffleConv(features=features, kernel=1, rate=rate, groups=groups, dtype=dtype)


class MaskedConv(nn.Module):
    """PixelCNN-style masked conv (reference convs.py:33-75), NHWC.

    maskType 'A' masks the center pixel too; 'B' allows it. The mask is a
    trace-time constant multiplied into the kernel on every call, so masked
    taps can never leak through optimizer updates (the reference re-multiplies
    the weight each forward, convs.py:72-75).
    """
    features: int
    kernel: int = 5
    maskType: str = "A"
    useBias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.maskType not in ("A", "B"):
            raise ValueError(f"Invalid maskType {self.maskType!r}")
        kh = kw = self.kernel
        inC = x.shape[-1]
        w = self.param("kernel", defaultKernelInit(), (kh, kw, inC, self.features), jnp.float32)
        # Zero taps strictly after the center row; in the center row, zero taps
        # after (B) / at-and-after (A) the center column.
        mask = jnp.ones((kh, kw, 1, 1), jnp.float32)
        center = kh // 2
        mask = mask.at[center, center + (1 if self.maskType == "B" else 0):].set(0.0)
        mask = mask.at[center + 1:].set(0.0)
        w = (w * mask).astype(self.dtype)
        import jax.lax as lax
        y = lax.conv_general_dilated(
            x.astype(self.dtype), w, window_strides=(1, 1),
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.useBias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y
