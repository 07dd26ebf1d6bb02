"""Fused thin-head conv3x3 + depth-to-space Pallas kernel (TPU).

The decoder's final RGB stage (3x3 conv C->r^2*3 then pixel shuffle,
reference `mcquic/nn/convs.py:151-255` final `_PixelShuffleConv3x3`) is the
one op in the decode graph that runs far from any roofline: with 12 output
channels the MXU pads the output dim 12 -> 128, so XLA's conv executes ~9x
the useful FLOPs (measured 4.7 ms/iter of a 39 ms qp-2 decode,
`docs/perf_roofline_r03.md` §1-2; the S2D fold fixes the lane tax but its
explicit transpose costs more than it saves on weak-transpose chips).

This kernel removes the lane tax with a scatter-style weight layout:

  * ONE matmul  [T, C] x [C, 9*F]  computes, for every input pixel, its
    contribution to all 9 neighboring output pixels at once — output width
    9*F = 108 fills the 128-wide MXU (vs 12/128 for the naive conv), so the
    padded FLOP count drops ~9x.
  * The 9 tap contributions are summed IN VMEM as statically-shifted slice
    adds (VPU) — the [T, 9F] tensor never touches HBM.
  * The kernel emits the RAW conv output [B, H*W, F]; the depth-to-space
    shuffle runs in XLA afterwards. An in-register shuffle was tried and
    reverted: it needs a lane-splitting 5-D shape cast
    (vector<T x F> -> vector<th x W x f x r x r>) that Mosaic's
    infer-vector-layout rejects at product decode geometry (W 256, F 12 —
    "unsupported shape cast", seen on hardware round 5). The XLA-side
    shuffle touches only the thin [B, H, W, 12] tensor (~24 MB at bench
    shapes, ~0.25 ms at HBM rate) — noise next to the ~4 ms lane tax the
    kernel removes.

Input rows stream HBM -> VMEM with manual halo DMAs (rows i*th-1 .. i*th+th),
with the out-of-image halo rows zeroed, so SAME padding needs no XLA-side
pad copy of the (hot, 250 MB at bench shapes) feature map.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# front/back pad rows inside the contribution scratch so every tap's
# statically-shifted window stays in bounds (tap offsets span
# [-1, 2W+1] around the tile base; pad >= W+1 covers both ends for any
# in-range W because masks kill the out-of-image positions themselves)
_PAD = 128


def _thinHeadKernel(x_ref, w_ref, b_ref, out_ref, xTile, pScr, sems, *,
                    th: int, W: int, C: int, F: int, nH: int,
                    outDtype):
    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * th

    # ---- halo DMA: rows [r0-1, r0+th] of image b -> xTile[0..th+1] ----
    main = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(r0, th)], xTile.at[pl.ds(1, th)], sems.at[0])
    main.start()

    @pl.when(i > 0)
    def _():
        pltpu.make_async_copy(
            x_ref.at[b, pl.ds(r0 - 1, 1)], xTile.at[pl.ds(0, 1)],
            sems.at[1]).start()

    @pl.when(i < nH - 1)
    def _():
        pltpu.make_async_copy(
            x_ref.at[b, pl.ds(r0 + th, 1)], xTile.at[pl.ds(th + 1, 1)],
            sems.at[2]).start()

    @pl.when(i == 0)
    def _():
        xTile[0] = jnp.zeros((W, C), xTile.dtype)

    @pl.when(i == nH - 1)
    def _():
        xTile[th + 1] = jnp.zeros((W, C), xTile.dtype)

    main.wait()

    @pl.when(i > 0)
    def _():
        pltpu.make_async_copy(x_ref.at[b, pl.ds(r0 - 1, 1)],
                              xTile.at[pl.ds(0, 1)], sems.at[1]).wait()

    @pl.when(i < nH - 1)
    def _():
        pltpu.make_async_copy(x_ref.at[b, pl.ds(r0 + th, 1)],
                              xTile.at[pl.ds(th + 1, 1)], sems.at[2]).wait()

    # ---- one wide matmul: every pixel's contribution to all 9 taps ----
    xf = xTile[:].reshape((th + 2) * W, C)
    pScr[pl.ds(_PAD, (th + 2) * W), :] = jnp.dot(
        xf, w_ref[:], preferred_element_type=jnp.float32)

    # ---- shifted tap-sum (gather form): out(yo,xo) needs input(yo+dy,
    # xo+dx), which lives at flat row (yo+1+dy)*W + xo+dx of the tile's
    # contribution matrix — a static slice at base (1+dy)*W + dx per tap ----
    T = th * W
    col = jax.lax.broadcasted_iota(jnp.int32, (T, F), 0) % W
    acc = jnp.broadcast_to(b_ref[:].astype(jnp.float32), (T, F))
    for tap in range(9):
        dy, dx = tap // 3 - 1, tap % 3 - 1
        base = _PAD + (1 + dy) * W + dx
        contrib = pScr[pl.ds(base, T), pl.ds(tap * F, F)]
        if dx == -1:
            contrib = jnp.where(col == 0, 0.0, contrib)
        elif dx == 1:
            contrib = jnp.where(col == W - 1, 0.0, contrib)
        acc = acc + contrib
    # vertical edges need no mask: the out-of-image halo rows were zeroed

    out_ref[0] = acc.astype(outDtype)


@functools.partial(jax.jit, static_argnames=("rate", "interpret", "rowTile"))
def conv3x3SubpixelThin(x, w, b, rate: int = 2, interpret: bool = False,
                        rowTile: int = 0):
    """Fused 3x3 SAME conv (thin output head) + pixel shuffle.

    Args:
        x: [B, H, W, C] features (bf16/f32).
        w: [3, 3, C, F] conv kernel with F = rate^2 * f thin (F <= ~16).
        b: [F] bias (or None).
        rate: pixel-shuffle upsampling factor r.
    Returns:
        [B, r*H, r*W, f] — identical (up to accumulation order) to
        pixelShuffle(conv3x3(x, w) + b, rate).
    """
    B, H, W, C = x.shape
    kh, kw, wc, F = w.shape
    assert (kh, kw) == (3, 3) and wc == C and F % (rate * rate) == 0
    f = F // (rate * rate)
    th = rowTile or _pickRowTile(H, W, C)
    assert H % th == 0, (H, th)
    nH = H // th

    # scatter weight layout: column block t holds tap (dy,dx) = divmod(t,3)-1
    wcat = w.reshape(9, C, F).transpose(1, 0, 2).reshape(C, 9 * F)
    if b is None:
        b = jnp.zeros((F,), jnp.float32)

    kern = functools.partial(_thinHeadKernel, th=th, W=W, C=C, F=F,
                             nH=nH, outDtype=x.dtype)
    out = pl.pallas_call(
        kern,
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # x stays in HBM
            pl.BlockSpec((C, 9 * F), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th * W, F),
            lambda bb, ii: (bb, ii, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * W, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W, C), x.dtype),
            pltpu.VMEM(((th + 2) * W + 2 * _PAD, 9 * F), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x, wcat.astype(x.dtype), jnp.asarray(b, jnp.float32).reshape(1, F))
    # depth-to-space in XLA (see module docstring: the in-kernel form hits
    # a Mosaic-unsupported lane-splitting shape cast at product geometry)
    from mcquic_tpu.nn.functional import pixelShuffle
    return pixelShuffle(out.reshape(B, H, W, F), rate)


def _pickRowTile(H: int, W: int, C: int, vmemBudget: int = 10 << 20) -> int:
    """Largest divisor of H whose tile buffers fit the VMEM budget.

    The budget must cover not just the declared scratch but Mosaic's vector
    STACK: the tap-sum working set (acc, contrib, col iota, mask temps) is
    ~6 live [T, F] vectors, each lane-padded to [th*W, 128] f32 — at
    th 32 / W 256 that alone is ~24 MB, which blew the 16 MB scoped-vmem
    limit on hardware (round 5) while the old scratch-only estimate said
    9 MB. Counting it keeps the pick inside the limit (th 8 at the product
    decode geometry)."""
    best = 0
    for th in range(1, min(H, 128) + 1):
        if H % th:
            continue
        need = ((th + 2) * W * C * 4            # x tile (f32 upper bound)
                + ((th + 2) * W + 2 * _PAD) * 128 * 4  # padded contribs f32
                + th * W * 128 * 4 * 6)         # tap-sum vector stack
        if need <= vmemBudget:
            best = th
    return best or 1


def thinHeadSupported(x_shape, w_shape, rate: int) -> bool:
    """Cheap static gate used by the nn dispatch layer."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    B, H, W, C = x_shape
    kh, kw, wc, F = w_shape
    return (kh == 3 and kw == 3 and wc == C and rate >= 1
            and F % (rate * rate) == 0 and F <= 16
            and H % _pickRowTile(H, W, C) == 0
            and C % 8 == 0 and (W * F) % 8 == 0)
