"""Fused VQ nearest-codeword Pallas kernel (TPU).

Replaces the reference's materialize-then-argmin hot loop
(`mcquic/modules/quantizer.py:144-179`: bmm distance into a full
`[n, m, h, w, k]` tensor, then argmin) with a single tiled kernel that
streams codebook tiles through the MXU and keeps the running min/argmin in
VMEM — the `[T, k]` distance matrix (hundreds of MB at qp-2 batch sizes)
never touches HBM.

Layout: tokens ride the sublane dim, codewords ride the 128-wide lane dim
(the "k-last" rule the reference discovered empirically, quantizer.py:95-98,
is the hardware-native layout here). Distances accumulate in fp32.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _roundUp(a, b):
    return _cdiv(a, b) * b


def _encodeKernel(x_ref, c_ref, out_ref, best_ref, barg_ref, *, blockK: int):
    """Grid (m, Tt, Kt); K innermost so VMEM scratch carries the running best."""
    ik = pl.program_id(2)
    nK = pl.num_programs(2)

    x = x_ref[0]                                   # [BT, d]
    c = c_ref[0]                                   # [BK, d]
    c32 = c.astype(jnp.float32)
    c2 = jnp.sum(c32 * c32, axis=-1)               # [BK]
    # MXU: [BT, d] x [BK, d]^T -> [BT, BK], fp32 accumulation.
    scores = jax.lax.dot_general(
        x, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dist = c2[None, :] - 2.0 * scores              # x^2 constant wrt argmin

    localMin = jnp.min(dist, axis=-1)              # [BT]
    localArg = jnp.argmin(dist, axis=-1).astype(jnp.int32) + ik * blockK

    @pl.when(ik == 0)
    def _():
        best_ref[0, :] = localMin
        barg_ref[0, :] = localArg

    @pl.when(ik > 0)
    def _():
        better = localMin < best_ref[0, :]
        best_ref[0, :] = jnp.where(better, localMin, best_ref[0, :])
        barg_ref[0, :] = jnp.where(better, localArg, barg_ref[0, :])

    @pl.when(ik == nK - 1)
    def _():
        out_ref[0, :] = barg_ref[0, :]


@functools.partial(jax.jit, static_argnames=("blockT", "blockK", "interpret"))
def vqEncodeGrouped(x: jax.Array, codebook: jax.Array, blockT: int = 512,
                    blockK: int = 1024, interpret: bool = False) -> jax.Array:
    """Nearest-codeword indices, fused.

    Args:
        x: [m, T, d] tokens per group.
        codebook: [m, k, d].
    Returns:
        [m, T] int32 indices.
    """
    m, T, d = x.shape
    _, k, _ = codebook.shape
    blockT = min(blockT, _roundUp(max(T, 8), 8))
    blockK = min(blockK, _roundUp(max(k, 128), 128))

    Tp = _roundUp(T, blockT)
    Kp = _roundUp(k, blockK)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    if Kp != k:
        # Sentinel rows with huge norm are never the argmin.
        codebook = jnp.pad(codebook, ((0, 0), (0, Kp - k), (0, 0)),
                           constant_values=1e4)

    grid = (m, Tp // blockT, Kp // blockK)
    out = pl.pallas_call(
        functools.partial(_encodeKernel, blockK=blockK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blockT, d), lambda im, it, ik: (im, it, 0)),
            pl.BlockSpec((1, blockK, d), lambda im, it, ik: (im, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, blockT), lambda im, it, ik: (im, it)),
        out_shape=jax.ShapeDtypeStruct((m, Tp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, blockT), jnp.float32),
            pltpu.VMEM((1, blockT), jnp.int32),
        ],
        interpret=interpret,
    )(x, codebook)
    return out[:, :T]


def vqEncodeFused(x: jax.Array, codebook: jax.Array, interpret: bool = False) -> jax.Array:
    """Drop-in for ops.vq.vqEncode: [n,h,w,m,d] x [m,k,d] -> [n,h,w,m] int32."""
    n, h, w, m, d = x.shape
    tokens = x.reshape(n * h * w, m, d).transpose(1, 0, 2)  # [m, T, d]
    codes = vqEncodeGrouped(tokens, codebook, interpret=interpret)  # [m, T]
    return codes.transpose(1, 0).reshape(n, h, w, m)
