"""Flash-attention (Pallas, TPU): tiled online-softmax attention.

The reference installs flash-attn but never enables it (invoked only via
commented code, generator_3.py:509-543) because its sequences are short
(596 tokens). This kernel is the TPU-native counterpart (SURVEY.md §5
long-context note: "splash/Pallas flash kernel substitutes for flash-attn"):
queries are tiled, K/V live in VMEM whole (fine up to several thousand
tokens at D<=128), and the [Tq, Tk] score matrix never touches HBM.

Hardware status (v5e via axon, 2026-08): compiles in seconds, agrees with
SDPA to bf16 tolerance, and is O(T) memory — but at the Mosaic 128-tile cap
it does NOT beat XLA, whose own attention lowering is already fused
(measured: 3.4 vs 2.7 ms at the generator's 596 tokens; 29 vs 15 ms at 4096,
both b8 h8 d64 bf16). XLA SDPA therefore stays the default everywhere; this
kernel is the capability proof + the starting point for full-rate chips or
toolchains that accept wider tiles.

Numerics mirror `models/generator.AnyResAttention`: fp32 scores * 1/sqrt(D),
mask applied as -1e9, fp32 softmax, probabilities cast to the value dtype
for the PV matmul.

Mosaic constraints honored (NOTES.md): tile dims <= 128, 2D-only broadcasts,
no scratch/pl.when (the online-softmax state rides a fori_loop carry).

`pallas_call` has no autodiff: use for inference paths (KV-cached sampling,
evaluation); training keeps XLA SDPA.
"""
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _cdiv(a, b):
    return -(-a // b)


def _roundUp(a, b):
    return _cdiv(a, b) * b


def _kernel(q_ref, k_ref, v_ref, *rest, blockK: int, scale: float,
            outDtype, nValid: int):
    m_ref, o_ref = rest if len(rest) == 2 else (None, rest[0])
    q = q_ref[0].astype(jnp.float32)               # [BQ, D]
    blockQ = q.shape[0]
    tk = k_ref.shape[1]
    nK = tk // blockK

    def body(i, carry):
        acc, rowMax, rowSum = carry
        kTile = k_ref[0, pl.dslice(i * blockK, blockK), :]       # [BK, D]
        vTile = v_ref[0, pl.dslice(i * blockK, blockK), :]       # [BK, D]
        scores = jax.lax.dot_general(
            q, kTile.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale          # [BQ, BK]
        if m_ref is not None:
            maskTile = m_ref[:, pl.dslice(i * blockK, blockK)]   # [BQ, BK]
            # additive mask (mask=1 -> +0, mask=0 -> -1e9): boolean selects
            # produce i1 vectors that fail Mosaic relayout on this toolchain
            scores = scores + (maskTile.astype(jnp.float32) - 1.0) * 1e9
        elif nValid % blockK != 0:
            # maskless path still needs the key-padding guard on the tail tile
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
                + i * blockK
            scores = scores + jnp.minimum(
                (nValid - 1 - col).astype(jnp.float32), 0.0) * 1e9
        tileMax = jnp.max(scores, axis=-1, keepdims=True)        # [BQ, 1]
        newMax = jnp.maximum(rowMax, tileMax)
        correction = jnp.exp(rowMax - newMax)
        p = jnp.exp(scores - newMax)                             # [BQ, BK]
        newSum = rowSum * correction + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype).astype(jnp.float32), vTile.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [BQ, D]
        newAcc = acc * correction + pv
        return newAcc, newMax, newSum

    init = (jnp.zeros((blockQ, q.shape[1]), jnp.float32),
            jnp.full((blockQ, 1), -jnp.inf, jnp.float32),
            jnp.zeros((blockQ, 1), jnp.float32))
    acc, _, rowSum = jax.lax.fori_loop(0, nK, body, init)
    o_ref[0] = (acc / jnp.maximum(rowSum, 1e-30)).astype(outDtype)


def _kernelResident(q_ref, k_ref, v_ref, o_ref, *, blockQ: int, blockK: int,
                    scale: float, outDtype, nValid: int):
    """Maskless variant with K/V resident across ALL query tiles: grid is
    (bh,) and the q loop lives inside, so K/V cross HBM once per batch-head
    instead of once per q tile (the per-tile refetch measured 2x slower than
    XLA SDPA at 4096 tokens; this form is compute-bound)."""
    tq = q_ref.shape[1]
    tk = k_ref.shape[1]
    nQ = tq // blockQ
    nK = tk // blockK

    def qBody(iq, _):
        q = q_ref[0, pl.dslice(iq * blockQ, blockQ), :].astype(jnp.float32)

        def kBody(i, carry):
            acc, rowMax, rowSum = carry
            kTile = k_ref[0, pl.dslice(i * blockK, blockK), :]
            vTile = v_ref[0, pl.dslice(i * blockK, blockK), :]
            scores = jax.lax.dot_general(
                q, kTile.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if nValid % blockK != 0:
                col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
                    + i * blockK
                scores = scores + jnp.minimum(
                    (nValid - 1 - col).astype(jnp.float32), 0.0) * 1e9
            tileMax = jnp.max(scores, axis=-1, keepdims=True)
            newMax = jnp.maximum(rowMax, tileMax)
            correction = jnp.exp(rowMax - newMax)
            p = jnp.exp(scores - newMax)
            newSum = rowSum * correction + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype).astype(jnp.float32),
                vTile.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc * correction + pv, newMax, newSum

        init = (jnp.zeros((blockQ, q.shape[1]), jnp.float32),
                jnp.full((blockQ, 1), -jnp.inf, jnp.float32),
                jnp.zeros((blockQ, 1), jnp.float32))
        acc, _, rowSum = jax.lax.fori_loop(0, nK, kBody, init)
        o_ref[0, pl.dslice(iq * blockQ, blockQ), :] = (
            acc / jnp.maximum(rowSum, 1e-30)).astype(outDtype)
        return 0

    jax.lax.fori_loop(0, nQ, qBody, 0)


@functools.partial(jax.jit,
                   static_argnames=("scale", "blockQ", "blockK", "interpret"))
def _flashBHTD(q, k, v, mask, scale: float, blockQ: int, blockK: int,
               interpret: bool):
    """[BH, Tq, D] x [BH, Tk, D] (+ optional mask [Tq, Tk]) -> [BH, Tq, D].

    mask=None uses the maskless kernel (no [Tq, Tk] tile traffic — at 4096
    tokens the mask fetches were ~half the kernel time on v5e)."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    tqP = _roundUp(tq, blockQ)
    tkP = _roundUp(tk, blockK)
    if tqP != tq:
        q = jnp.pad(q, ((0, 0), (0, tqP - tq), (0, 0)))
    if tkP != tk:
        k = jnp.pad(k, ((0, 0), (0, tkP - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tkP - tk), (0, 0)))
    if mask is None:
        out = pl.pallas_call(
            functools.partial(_kernelResident, blockQ=blockQ, blockK=blockK,
                              scale=scale, outDtype=q.dtype, nValid=tk),
            grid=(bh,),
            in_specs=[
                pl.BlockSpec((1, tqP, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tkP, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, tkP, d), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, tqP, d), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, tqP, d), q.dtype),
            interpret=interpret,
        )(q, k, v)
        return out[:, :tq]
    maskP = jnp.zeros((tqP, tkP), jnp.int8).at[:tq, :tk].set(
        mask.astype(jnp.int8))
    out = pl.pallas_call(
        functools.partial(_kernel, blockK=blockK, scale=scale,
                          outDtype=q.dtype, nValid=tk),
        grid=(bh, tqP // blockQ),
        in_specs=[
            pl.BlockSpec((1, blockQ, d), lambda b, iq: (b, iq, 0)),
            pl.BlockSpec((1, tkP, d), lambda b, iq: (b, 0, 0)),
            pl.BlockSpec((1, tkP, d), lambda b, iq: (b, 0, 0)),
            pl.BlockSpec((blockQ, tkP), lambda b, iq: (iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, blockQ, d), lambda b, iq: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tqP, d), q.dtype),
        interpret=interpret,
    )(q, k, v, maskP)
    return out[:, :tq]


def flashAttention(q, k, v, mask=None, scale: Optional[float] = None,
                   blockQ: int = 128, blockK: int = 128,
                   interpret: Optional[bool] = None):
    """Tiled attention over [B, T, H, D] tensors (the generator's bqhd
    layout). mask: optional [Tq, Tk], nonzero = attend. Returns [B, Tq, H, D]
    in q's dtype."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if d > 128:
        raise ValueError(f"head dim {d} > 128 (Mosaic tile cap)")
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    # Mosaic tiles <= 128 (NOTES.md)
    blockQ = min(blockQ, 128)
    blockK = min(blockK, 128)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    out = _flashBHTD(qf, kf, vf, mask, float(scale), blockQ, blockK,
                     bool(interpret))
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
