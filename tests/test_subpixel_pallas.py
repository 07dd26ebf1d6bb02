"""Fused thin-head conv3x3 + depth-to-space kernel vs the XLA reference path.

The kernel (ops/subpixel_pallas.py) replaces the decoder's final RGB stage
(reference `mcquic/nn/convs.py:151-255` conv->r^2*3 + pixel shuffle), whose
12-wide output pads the MXU 12->128 (docs/perf_roofline_r03.md §1-2).
Interpreter mode checks exact semantics on CPU; the TPU path is measured by
scripts/decode_breakdown.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.ops.subpixel_pallas import (conv3x3SubpixelThin,
                                            thinHeadSupported)


def _reference(x, w, b, rate):
    from mcquic_tpu.nn.functional import pixelShuffle
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return pixelShuffle(y, rate)


@pytest.mark.parametrize("B,H,W,C,F,rate", [
    (2, 32, 64, 128, 12, 2),   # bench-like geometry (scaled down)
    (1, 24, 32, 64, 12, 2),    # multi-tile rows
    (1, 16, 32, 128, 4, 2),    # single-channel output
    (2, 16, 48, 32, 12, 2),    # thin input channels
])
def test_matches_xla_conv_shuffle(B, H, W, C, F, rate):
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, C, F)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
    assert thinHeadSupported(x.shape, w.shape, rate)
    got = conv3x3SubpixelThin(x, w, b, rate=rate, interpret=True)
    want = _reference(x, w, b, rate)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_no_bias_and_row_tile_override():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 12)) * 0.1, jnp.float32)
    got = conv3x3SubpixelThin(x, w, None, rate=2, interpret=True, rowTile=4)
    want = _reference(x, w, None, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bf16_inputs_close_to_f32_reference():
    rng = np.random.default_rng(7)
    x32 = jnp.asarray(rng.normal(size=(1, 16, 32, 64)), jnp.float32)
    w32 = jnp.asarray(rng.normal(size=(3, 3, 64, 12)) * 0.1, jnp.float32)
    got = conv3x3SubpixelThin(x32.astype(jnp.bfloat16),
                              w32.astype(jnp.bfloat16), None, rate=2,
                              interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _reference(x32, w32, None, 2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)


def test_supported_gate_rejects_bad_shapes():
    assert not thinHeadSupported((1, 16, 32, 64), (5, 5, 64, 12), 2)  # 5x5
    assert not thinHeadSupported((1, 16, 32, 64), (3, 3, 64, 48), 2)  # wide
    assert not thinHeadSupported((1, 16, 32, 64), (3, 3, 64, 10), 2)  # F%r^2


def test_upconv_dispatch_transparent(monkeypatch):
    """MCQUIC_THINHEAD=pallas must be numerically transparent through the
    real module (PixelShuffleConv thin head, the decoder's final RGB stage)."""
    import flax.linen  # noqa: F401  (import order)

    from mcquic_tpu.nn.convs import PixelShuffleConv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 16, 32, 64)), jnp.float32)
    module = PixelShuffleConv(features=3, kernel=3, rate=2)
    variables = module.init(jax.random.PRNGKey(0), x)

    monkeypatch.delenv("MCQUIC_THINHEAD", raising=False)
    monkeypatch.setenv("MCQUIC_SUBPIXEL", "shuffle")
    want = module.apply(variables, x)
    monkeypatch.setenv("MCQUIC_THINHEAD", "pallas")
    got = module.apply(variables, x)
    assert got.shape == want.shape == (2, 32, 64, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_upconv_pallas_dispatch_differentiable(monkeypatch):
    """With MCQUIC_THINHEAD=pallas set, differentiating through the module
    must NOT hand a pallas_call (no autodiff rule) to jax.grad — the
    dispatch falls back to the lax path under an ad trace (stage-1 training
    differentiates the decoder's RGB head). ADVICE r4 medium."""
    from mcquic_tpu.nn.convs import PixelShuffleConv

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 32)), jnp.float32)
    module = PixelShuffleConv(features=3, kernel=3, rate=2)
    variables = module.init(jax.random.PRNGKey(0), x)

    def loss(vars_, inp):
        return jnp.mean(module.apply(vars_, inp) ** 2)

    monkeypatch.setenv("MCQUIC_SUBPIXEL", "shuffle")
    monkeypatch.delenv("MCQUIC_THINHEAD", raising=False)
    want = jax.grad(loss)(variables, x)
    monkeypatch.setenv("MCQUIC_THINHEAD", "pallas")
    got = jax.grad(loss)(variables, x)  # must not raise
    wantLeaf, gotLeaf = (jax.tree.leaves(t) for t in (want, got))
    for a, b in zip(wantLeaf, gotLeaf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
