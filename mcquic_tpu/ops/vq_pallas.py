"""Fused VQ nearest-codeword Pallas kernel (TPU).

Replaces the reference's materialize-then-argmin hot loop
(`mcquic/modules/quantizer.py:144-179`: bmm distance into a full
`[n, m, h, w, k]` tensor, then argmin) with a single tiled kernel that
streams codebook tiles through the MXU and keeps the running min/argmin in
VMEM — the `[T, k]` distance matrix (hundreds of MB at qp-2 batch sizes)
never touches HBM.

Layout: tokens ride the sublane dim, codewords ride the 128-wide lane dim
(the "k-last" rule the reference discovered empirically, quantizer.py:95-98,
is the hardware-native layout here). All m groups are carried in each block
(m is 1..12); distances accumulate in fp32. Grid = (token tiles, k tiles)
with k innermost so VMEM scratch carries the running best across k tiles.
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


def _encodeKernel(x_ref, c_ref, out_ref, best_ref, barg_ref, *, blockK: int,
                  m: int):
    ik = pl.program_id(1)
    nK = pl.num_programs(1)

    # Static unroll over the (tiny, 1..12) m groups: keeps every broadcast 2D.
    # A batched 3D form with `c2[:, None, :]` trips a Mosaic layout
    # verification failure on the v5e toolchain (bisected 2026-08; see
    # NOTES.md) — the unrolled 2D matmuls compile in seconds and hit the MXU
    # identically.
    localMins, localArgs = [], []
    for mi in range(m):
        xm = x_ref[mi]                             # [BT, d]
        cm = c_ref[mi]                             # [BK, d]
        c32 = cm.astype(jnp.float32)
        c2 = jnp.sum(c32 * c32, axis=-1)           # [BK]
        scores = jax.lax.dot_general(
            xm, cm, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [BT, BK] fp32 acc (MXU)
        dist = c2[None, :] - 2.0 * scores          # x^2 constant wrt argmin
        localMins.append(jnp.min(dist, axis=-1))
        localArgs.append(jnp.argmin(dist, axis=-1).astype(jnp.int32)
                         + ik * blockK)
    localMin = jnp.stack(localMins)                # [m, BT]
    localArg = jnp.stack(localArgs)

    @pl.when(ik == 0)
    def _():
        best_ref[:] = localMin
        barg_ref[:] = localArg

    @pl.when(ik > 0)
    def _():
        better = localMin < best_ref[:]
        best_ref[:] = jnp.where(better, localMin, best_ref[:])
        barg_ref[:] = jnp.where(better, localArg, barg_ref[:])

    @pl.when(ik == nK - 1)
    def _():
        out_ref[:] = barg_ref[:]


@functools.partial(jax.jit, static_argnames=("blockT", "blockK", "interpret"))
def vqEncodeGrouped(x: jax.Array, codebook: jax.Array, blockT: int = 128,
                    blockK: int = 128, interpret: bool = False) -> jax.Array:
    """Nearest-codeword indices, fused.

    Hardware status (v5e via axon, 2026-08): compiles and agrees exactly with
    the chunked path, but the Mosaic toolchain REJECTS block shapes larger
    than 128 on either tile axis (layout verification errors), and at the
    forced 128x128 tiling the kernel re-streams the codebook per token tile
    and measures ~100x slower than `vq.vqEncodeChunked` (202 vs 2.0 ms for
    qp-2 level 0). It therefore stays opt-in (MCQUIC_PALLAS=1); revisit if a
    toolchain that accepts >=512-wide blocks shows up.

    Args:
        x: [m, T, d] tokens per group.
        codebook: [m, k, d].
    Returns:
        [m, T] int32 indices.
    """
    m, T, d = x.shape
    _, k, _ = codebook.shape
    # Mosaic (this toolchain) fails layout verification for tile dims > 128.
    blockT = min(blockT, 128)
    blockK = min(blockK, 128)
    blockK = min(blockK, _roundUp(max(k, 128), 128))
    blockT = min(blockT, _roundUp(max(T, 8), 8))
    blockT = _roundUp(blockT, 8) if blockT >= 8 else 8

    Tp = _roundUp(T, blockT)
    Kp = _roundUp(k, blockK)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    if Kp != k:
        # Sentinel rows with huge norm are never the argmin.
        codebook = jnp.pad(codebook, ((0, 0), (0, Kp - k), (0, 0)),
                           constant_values=1e4)

    grid = (Tp // blockT, Kp // blockK)
    out = pl.pallas_call(
        functools.partial(_encodeKernel, blockK=blockK, m=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, blockT, d), lambda it, ik: (0, it, 0)),
            pl.BlockSpec((m, blockK, d), lambda it, ik: (0, ik, 0)),
        ],
        out_specs=pl.BlockSpec((m, blockT), lambda it, ik: (0, it)),
        out_shape=jax.ShapeDtypeStruct((m, Tp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((m, blockT), jnp.float32),
            pltpu.VMEM((m, blockT), jnp.int32),
        ],
        interpret=interpret,
    )(x, codebook)
    return out[:, :T]


def _residentKernel(x_ref, c_ref, c2_ref, out_ref, *, m: int, nK: int,
                    blockK: int):
    """One grid step = one token tile vs the ENTIRE codebook (VMEM-resident).

    The codebook rides in as a [m, nK, blockK, d] block (every dim <= the
    Mosaic 128 tile cap) and stays in VMEM across the k loop, so each token
    tile streams the codebook zero times from HBM — the round-2 kernel's
    (T tiles x K tiles) grid re-fetched it per token tile and measured ~100x
    slower than the XLA chunked scan (NOTES.md). The k loop lives INSIDE the
    kernel: m * nK unrolled 2D dots, running (min, argmin) kept in registers."""
    for mi in range(m):
        xm = x_ref[mi]                                 # [BT, d]
        best = None
        for ki in range(nK):
            cm = c_ref[mi, ki]                         # [BK, d]
            c2 = c2_ref[mi, ki]                        # [BK]
            scores = jax.lax.dot_general(
                xm, cm, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # [BT, BK]
            dist = c2[None, :] - 2.0 * scores
            localMin = jnp.min(dist, axis=-1)
            localArg = jnp.argmin(dist, axis=-1).astype(jnp.int32) + ki * blockK
            if best is None:
                best, barg = localMin, localArg
            else:
                better = localMin < best
                best = jnp.where(better, localMin, best)
                barg = jnp.where(better, localArg, barg)
        out_ref[mi] = barg


@functools.partial(jax.jit, static_argnames=("blockT", "interpret"))
def vqEncodeResident(x: jax.Array, codebook: jax.Array, blockT: int = 128,
                     interpret: bool = False) -> jax.Array:
    """Fused VQ encode with the codebook resident in VMEM.

    Args:
        x: [m, T, d] tokens per group; codebook: [m, k, d].
    Returns:
        [m, T] int32 indices.

    Fits when m * k * d * itemsize + tile overheads < ~16 MB VMEM — true for
    every reference geometry (qp-2 level 0 is the largest: 2x8192x64 fp32 =
    4 MB; bf16 halves it).
    """
    m, T, d = x.shape
    _, k, _ = codebook.shape
    blockK = 128
    blockT = min(max(_roundUp(blockT, 8), 8), 128)

    Tp = _roundUp(T, blockT)
    Kp = _roundUp(k, blockK)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    if Kp != k:
        codebook = jnp.pad(codebook, ((0, 0), (0, Kp - k), (0, 0)),
                           constant_values=1e4)
    nK = Kp // blockK
    cTiled = codebook.reshape(m, nK, blockK, d)
    c32 = cTiled.astype(jnp.float32)
    c2 = jnp.sum(c32 * c32, axis=-1)                   # [m, nK, blockK] fp32

    out = pl.pallas_call(
        functools.partial(_residentKernel, m=m, nK=nK, blockK=blockK),
        grid=(Tp // blockT,),
        in_specs=[
            pl.BlockSpec((m, blockT, d), lambda it: (0, it, 0)),
            pl.BlockSpec((m, nK, blockK, d), lambda it: (0, 0, 0, 0)),
            pl.BlockSpec((m, nK, blockK), lambda it: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((m, blockT), lambda it: (0, it)),
        out_shape=jax.ShapeDtypeStruct((m, Tp), jnp.int32),
        interpret=interpret,
    )(x, cTiled, c2)
    return out[:, :T]


# Conservative VMEM budget for the resident codebook (v5e has ~16 MB/core;
# leave headroom for the token tile, c2, and double-buffering).
_RESIDENT_VMEM_BUDGET = 8 * 1024 * 1024


def residentFits(m: int, k: int, d: int) -> bool:
    """True when the fp32 codebook (+ c2) fits the resident kernel's VMEM
    budget. Every reference geometry fits (largest: qp-2 level 0,
    2x8192x64 fp32 = 4 MB)."""
    kp = _roundUp(k, 128)
    return m * kp * (d + 1) * 4 <= _RESIDENT_VMEM_BUDGET


def vqEncodeFused(x: jax.Array, codebook: jax.Array, interpret: bool = False) -> jax.Array:
    """Drop-in for ops.vq.vqEncode: [n,h,w,m,d] x [m,k,d] -> [n,h,w,m] int32.

    Routes to the VMEM-resident kernel whenever the codebook fits (every
    reference geometry) — the (T tiles x K tiles) grouped kernel re-streams
    the codebook per token tile and measured ~100x slower (NOTES.md); it
    remains only as the fallback for codebooks too large for VMEM."""
    n, h, w, m, d = x.shape
    tokens = x.reshape(n * h * w, m, d).transpose(1, 0, 2)  # [m, T, d]
    if residentFits(m, codebook.shape[1], d):
        codes = vqEncodeResident(tokens, codebook, interpret=interpret)
    else:
        codes = vqEncodeGrouped(tokens, codebook, interpret=interpret)
    return codes.transpose(1, 0).reshape(n, h, w, m)
