import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.nn import (AttentionBlock, GenDivNorm, InvGenDivNorm, MaskedConv,
                           NonLocalBlock, ResidualBlock, ResidualBlockShuffle,
                           ResidualBlockWithStride, gumbelSoftmax, lowerBound,
                           nonNegativeApply, nonNegativeInit, pixelShuffle, pixelUnshuffle)


def test_lower_bound_forward_and_grad():
    x = jnp.array([-1.0, 0.5, 2.0])
    b = jnp.array(1.0)
    y = lowerBound(x, b)
    np.testing.assert_allclose(y, [1.0, 1.0, 2.0])

    # Positive upstream grad: blocked below bound.
    g = jax.grad(lambda x: jnp.sum(lowerBound(x, b)))(x)
    np.testing.assert_allclose(g, [0.0, 0.0, 1.0])
    # Negative upstream grad: passes everywhere (lets x escape the bound).
    g = jax.grad(lambda x: jnp.sum(-lowerBound(x, b)))(x)
    np.testing.assert_allclose(g, [-1.0, -1.0, -1.0])


def test_nonnegative_roundtrip():
    target = jnp.array([0.1, 1.0, 3.0])
    reparam = nonNegativeInit(target)
    recovered = nonNegativeApply(reparam)
    np.testing.assert_allclose(recovered, target, atol=1e-5)


def test_pixel_shuffle_roundtrip():
    x = jnp.arange(2 * 3 * 4 * 8, dtype=jnp.float32).reshape(2, 3, 4, 8)
    up = pixelShuffle(x, 2)
    assert up.shape == (2, 6, 8, 2)
    back = pixelUnshuffle(up, 2)
    np.testing.assert_allclose(back, x)


def test_gumbel_softmax_hard_is_onehot():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (4, 7))
    y = gumbelSoftmax(key, logits, 1.0, hard=True)
    np.testing.assert_allclose(jnp.sum(y, -1), jnp.ones(4), atol=1e-6)
    assert jnp.all((y == 0) | (y == 1) | ((y > -1e-5) & (y < 1 + 1e-5)))
    # Gradient flows through the soft path.
    g = jax.grad(lambda l: jnp.sum(gumbelSoftmax(key, l, 1.0, True) ** 2))(logits)
    assert jnp.any(g != 0)


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_shapes_and_positive_scale(inverse):
    mod = InvGenDivNorm(groups=2) if inverse else GenDivNorm(groups=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    params = mod.init(jax.random.PRNGKey(2), x)
    y = mod.apply(params, x)
    assert y.shape == x.shape
    assert jnp.all(jnp.isfinite(y))
    # GDN shrinks, IGDN amplifies (beta starts at 1, gamma small)
    ratio = jnp.abs(y).mean() / jnp.abs(x).mean()
    if inverse:
        assert ratio > 0.9
    else:
        assert ratio < 1.1


def test_residual_blocks_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 8))
    rb = ResidualBlock(outChannels=12)
    y = rb.apply(rb.init(jax.random.PRNGKey(1), x), x)
    assert y.shape == (1, 16, 16, 12)

    rbs = ResidualBlockWithStride(outChannels=8, stride=2)
    y = rbs.apply(rbs.init(jax.random.PRNGKey(2), x), x)
    assert y.shape == (1, 8, 8, 8)

    rsh = ResidualBlockShuffle(outChannels=8, upsample=2)
    y = rsh.apply(rsh.init(jax.random.PRNGKey(3), x), x)
    assert y.shape == (1, 32, 32, 8)


def test_attention_block():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8))
    ab = AttentionBlock()
    y = ab.apply(ab.init(jax.random.PRNGKey(1), x), x)
    assert y.shape == x.shape


def test_masked_conv_causality():
    # Output at (i,j) must not depend on inputs at raster positions >= (i,j) for mask A.
    mc = MaskedConv(features=1, kernel=5, maskType="A")
    x = jnp.zeros((1, 7, 7, 1))
    params = mc.init(jax.random.PRNGKey(0), x)
    base = mc.apply(params, x)
    # Perturb the center pixel; outputs at the center and before must not change.
    x2 = x.at[0, 3, 3, 0].set(10.0)
    out = mc.apply(params, x2)
    diff = jnp.abs(out - base)[0, :, :, 0]
    assert diff[3, 3] == 0.0  # mask A masks the current pixel
    assert jnp.all(diff[:3, :] == 0.0)
    assert jnp.all(diff[3, :4] == 0.0)


def test_nonlocal_block():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 8))
    nl = NonLocalBlock()
    params = nl.init(jax.random.PRNGKey(1), x)
    y = nl.apply(params, x)
    assert y.shape == x.shape


class TestSubpixelDeconv:
    """conv+pixelShuffle == single transposed conv (functional.
    subpixelConvTranspose): FLOP-exact reformulation used to eliminate
    shuffle transposes from the decode path."""

    @pytest.mark.parametrize("kernel", [1, 3, 5])
    @pytest.mark.parametrize("useBias", [True, False])
    def test_upconv_modes_identical(self, monkeypatch, kernel, useBias):
        import jax
        import jax.numpy as jnp

        from mcquic_tpu.nn.convs import PixelShuffleConv

        module = PixelShuffleConv(features=6, kernel=kernel, rate=2,
                                  useBias=useBias)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 7, 10))
        monkeypatch.setenv("MCQUIC_SUBPIXEL", "shuffle")
        variables = module.init(jax.random.PRNGKey(1), x)
        ref = module.apply(variables, x)
        monkeypatch.setenv("MCQUIC_SUBPIXEL", "deconv")
        alt = module.apply(variables, x)
        assert ref.shape == alt.shape == (2, 18, 14, 6)
        np.testing.assert_allclose(np.asarray(alt), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_full_decoder_identical_across_modes(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        from mcquic_tpu.models.compressor import Compressor

        module = Compressor(channel=8, m=2, k=(16, 8))
        monkeypatch.setenv("MCQUIC_SUBPIXEL", "shuffle")
        variables = module.init({"params": jax.random.PRNGKey(0),
                                 "gumbel": jax.random.PRNGKey(1)},
                                jnp.zeros((1, 64, 64, 3)), train=False)
        codes = [np.random.default_rng(0).integers(0, kk, (1, 64 // s, 64 // s, 2))
                 for kk, s in zip((16, 8), (16, 32))]
        codes = [jnp.asarray(c) for c in codes]
        ref = module.apply(variables, codes, method="decode")
        monkeypatch.setenv("MCQUIC_SUBPIXEL", "deconv")
        alt = module.apply(variables, codes, method="decode")
        np.testing.assert_allclose(np.asarray(alt), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_upconv_gradients_identical_across_modes(self, monkeypatch):
        """Training runs through the deconv path on TPU: parameter gradients
        must match the shuffle form (exact-equal functions, equal grads)."""
        import jax
        import jax.numpy as jnp

        from mcquic_tpu.nn.convs import PixelShuffleConv

        module = PixelShuffleConv(features=4, kernel=3, rate=2)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 6))
        monkeypatch.setenv("MCQUIC_SUBPIXEL", "shuffle")
        variables = module.init(jax.random.PRNGKey(3), x)

        def loss(v, x):
            y = module.apply(v, x)
            return jnp.sum(y * y)

        gradShuffle = jax.grad(loss)(variables, x)
        monkeypatch.setenv("MCQUIC_SUBPIXEL", "deconv")
        gradDeconv = jax.grad(loss)(variables, x)
        flatA = jax.tree_util.tree_leaves(gradShuffle)
        flatB = jax.tree_util.tree_leaves(gradDeconv)
        for a, b in zip(flatA, flatB):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4, rtol=1e-4)


class TestDefaultInit:
    """Conv init matches the torch Conv2d default the reference relies on.

    The reference sets no custom init in its conv stacks (mcquic/nn/*.py,
    modules/compressor.py, modules/quantizer.py), so it inherits torch's
    kaiming_uniform(a=sqrt(5)): U(+-1/sqrt(fan_in)), variance 1/(3*fan_in).
    flax's lecun_normal default is 3x larger per conv — enough to compound
    into an fp32 overflow -> first-step NaN at Neon channel-256 17-level
    geometry (reproduced on CPU; see nn/convs.py defaultKernelInit)."""

    def test_conv_kernel_matches_torch_default_scale(self):
        import jax
        import numpy as np

        from mcquic_tpu.nn.convs import conv3x3

        module = conv3x3(64)
        v = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 128)))
        w = np.asarray(v["params"]["Conv_0"]["kernel"])
        assert w.shape == (3, 3, 128, 64)
        fanIn = 3 * 3 * 128
        expected = (1.0 / (3.0 * fanIn)) ** 0.5
        std = w.std()
        assert 0.85 * expected < std < 1.15 * expected, (std, expected)
        # uniform, not normal: bounded support at sqrt(3)*std
        assert np.abs(w).max() <= (1.0 / fanIn) ** 0.5 * 1.0001

    def test_deep_residual_decode_chain_stays_bounded(self):
        """Regression for the Neon-256 first-step NaN: the 17-level
        ResidualBackwardQuantizer decode chain must not amplify a real-init
        forward into huge activations. Under the old lecun-scale init this
        chain reached ~1e12 absmax (channel-8 internals — the blowup needs
        no wide model); torch-scale init keeps it O(1)."""
        import jax

        from mcquic_tpu.models.quantizer import ResidualBackwardQuantizer

        size = (8, 4, 4, 4, 4, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1)
        module = ResidualBackwardQuantizer(k=64, size=size)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 8))
        variables = module.init({"params": jax.random.PRNGKey(2),
                                 "gumbel": jax.random.PRNGKey(3)}, x, train=True)
        (yHat, codes, logits), _ = module.apply(
            variables, x, train=True, rngs={"gumbel": jax.random.PRNGKey(4)},
            mutable=["coder"])
        absmax = float(jnp.max(jnp.abs(yHat)))
        assert np.isfinite(absmax) and absmax < 100.0, absmax
