"""Stage-2 generator smoke tests (tiny geometry, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.models.generator import GeneratorV3SelfAttention, blockCausalMask


@pytest.fixture(scope="module")
def tinyGen():
    # input 32 -> outer /8 -> 4; size (2,1): halve to 2, halve to 1.
    module = GeneratorV3SelfAttention(
        channel=8, k=16, size=(2, 1, 1), denseNorm=False,
        hiddenSize=32, depth=2, nHeads=4, numClasses=10)
    img = jnp.zeros((2, 32, 32, 3))
    lbl = jnp.zeros((2,), jnp.int32)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, img, lbl, train=True)
    return module, variables


def test_block_causal_mask():
    mask = np.asarray(blockCausalMask([1, 4]))
    assert mask.shape == (5, 5)
    # first block sees itself only
    assert mask[0, 0] == 1 and mask[0, 1:].sum() == 0
    # second block sees block 1 and ALL of itself (not just causal prefix)
    assert mask[1].sum() == 5
    assert mask[1, 4] == 1  # within-block full attention


def test_generator_training_forward(tinyGen):
    module, variables = tinyGen
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3), minval=-1, maxval=1)
    lbl = jnp.asarray([3, 7], jnp.int32)
    predictions, loss, codes, restored, perLevel = module.apply(
        variables, img, lbl, train=True)
    assert len(predictions) == 3 and len(codes) == 3
    assert predictions[0].shape == (2, 1, 1, 16)   # smallest level, k=16
    assert predictions[1].shape == (2, 1, 1, 16)
    assert predictions[2].shape == (2, 2, 2, 16)
    assert jnp.isfinite(loss)
    assert len(perLevel) == 3


def test_remat_matches_plain_forward_and_grad(tinyGen):
    """remat=True is a pure memory/time trade: identical params, loss, grads
    (AnyResTransformer.remat; required for AnyRes_L single-chip training)."""
    module, variables = tinyGen
    rematModule = GeneratorV3SelfAttention(
        channel=8, k=16, size=(2, 1, 1), denseNorm=False,
        hiddenSize=32, depth=2, nHeads=4, numClasses=10, remat=True)
    img = jax.random.uniform(jax.random.PRNGKey(5), (2, 32, 32, 3), minval=-1, maxval=1)
    lbl = jnp.asarray([1, 2], jnp.int32)

    def lossFn(mod, params):
        _, loss, _, _, _ = mod.apply(
            {"params": params, "coder": variables["coder"]}, img, lbl, train=True)
        return loss

    lossA, gradA = jax.value_and_grad(lambda p: lossFn(module, p))(variables["params"])
    lossB, gradB = jax.value_and_grad(lambda p: lossFn(rematModule, p))(variables["params"])
    assert jnp.allclose(lossA, lossB, rtol=1e-6)
    flatA = jax.tree_util.tree_leaves(gradA)
    flatB = jax.tree_util.tree_leaves(gradB)
    assert len(flatA) == len(flatB)
    for a, b in zip(flatA, flatB):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_generator_frozen_compressor_gets_no_grads(tinyGen):
    module, variables = tinyGen
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3), minval=-1, maxval=1)
    lbl = jnp.asarray([0], jnp.int32)

    def lossFn(params):
        _, loss, _, _, _ = module.apply({"params": params, "coder": variables["coder"]},
                                     img, lbl, train=True)
        return loss

    g = jax.grad(lossFn)(variables["params"])
    compGrads = jax.tree_util.tree_leaves(g["compressor"])
    assert all(float(jnp.sum(jnp.abs(x))) == 0 for x in compGrads)
    transGrads = jax.tree_util.tree_leaves(g["transformer"])
    assert any(float(jnp.sum(jnp.abs(x))) > 0 for x in transGrads)


def test_generator_sampling(tinyGen):
    module, variables = tinyGen
    lbl = jnp.asarray([1, 5], jnp.int32)
    predictions, restored = module.apply(
        variables, lbl, rng=jax.random.PRNGKey(4), temperature=1.0, topK=4,
        method=module.generate)
    assert len(predictions) == 3
    assert predictions[0].shape == (2, 1, 1, 1)
    assert predictions[1].shape == (2, 1, 1, 1)
    assert predictions[2].shape == (2, 2, 2, 1)
    assert restored.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(restored)).all()


def test_kv_cached_sampling_matches_full_prefix(tinyGen):
    """KV-cached decode must be exact vs the full-prefix rerun (greedy)."""
    module, variables = tinyGen
    lbl = jnp.asarray([2, 8], jnp.int32)
    predFull, restFull = module.apply(variables, lbl, rng=None, kvCache=False,
                                      method=module.generate)
    predKv, restKv = module.apply(variables, lbl, rng=None, kvCache=True,
                                  method=module.generate)
    for a, b in zip(predFull, predKv):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(restFull), np.asarray(restKv), atol=1e-5)


def test_unconditional_null_class(tinyGen):
    """Class id -1 selects the learned null embedding (uc_generator parity)."""
    module, variables = tinyGen
    lbl = jnp.asarray([-1, -1], jnp.int32)
    predictions, restored = module.apply(variables, lbl, rng=jax.random.PRNGKey(0),
                                         method=module.generate)
    assert restored.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(restored)).all()


def test_size_mismatch_raises_clear_error():
    """Declared size pyramid that doesn't match the tokenizer's code grids
    must raise a named ValueError, not an opaque broadcast error."""
    module = GeneratorV3SelfAttention(
        channel=8, k=16, size=(4, 2, 2), denseNorm=False,  # 32^2 input -> latent 4 -> size[0] must be 2
        hiddenSize=32, depth=1, nHeads=4, numClasses=10)
    img = jnp.zeros((1, 32, 32, 3))
    lbl = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="does not match the tokenizer"):
        module.init({"params": jax.random.PRNGKey(0),
                     "gumbel": jax.random.PRNGKey(1)}, img, lbl, train=True)


def test_generate_module_populates_registry():
    """Regression: `mcquic_tpu.generate` must populate GeneratorRegistry in a
    fresh interpreter (the generate CLI once failed with an empty registry)."""
    import subprocess
    import sys
    code = ("import mcquic_tpu.generate; "
            "from mcquic_tpu.utils.registry import GeneratorRegistry; "
            "assert 'GeneratorV3SelfAttention' in GeneratorRegistry; "
            "assert 'GeneratorV3SelfAttentionNoAda' in GeneratorRegistry; "
            "assert 'GeneratorVAR' in GeneratorRegistry; print('ok')")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300,
                         env={**__import__('os').environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout


def test_noada_ablation_generator():
    """GeneratorV3SelfAttentionNoAda: sandwich-norm blocks, no adaLN params
    (generator_3_self_attn_wo_ada.py:47); train fwd + sampling must run."""
    from mcquic_tpu.models.generator import GeneratorV3SelfAttentionNoAda
    from mcquic_tpu.utils.registry import GeneratorRegistry

    assert GeneratorRegistry.get("GeneratorV3SelfAttentionNoAda") is GeneratorV3SelfAttentionNoAda
    module = GeneratorV3SelfAttentionNoAda(
        channel=8, k=16, size=(2, 1, 1), denseNorm=False,
        hiddenSize=32, depth=1, nHeads=4, numClasses=10)
    img = jnp.zeros((2, 32, 32, 3))
    lbl = jnp.asarray([3, 7], jnp.int32)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, img, lbl, train=True)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert not any("adaLN" in n or "finalAdaLN" in n for n in names)
    _, loss, _, _, _ = module.apply(variables, img, lbl, train=True)
    assert jnp.isfinite(loss)
    predictions, restored = module.apply(variables, lbl, rng=jax.random.PRNGKey(4),
                                         method=module.generate)
    assert restored.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(restored)).all()


def test_text_conditioned_generator():
    """textConditioned=True: condition is a precomputed caption embedding."""
    module = GeneratorV3SelfAttention(
        channel=8, k=16, size=(2, 1, 1), denseNorm=False,
        hiddenSize=32, depth=1, nHeads=4, textConditioned=True, capDim=12)
    img = jnp.zeros((2, 32, 32, 3))
    cap = jax.random.normal(jax.random.PRNGKey(0), (2, 12))
    variables = module.init({"params": jax.random.PRNGKey(1),
                             "gumbel": jax.random.PRNGKey(2)}, img, cap, train=True)
    predictions, loss, codes, restored, perLevel = module.apply(
        variables, img, cap, train=True)
    assert jnp.isfinite(loss)
    predictions, restored = module.apply(variables, cap, rng=jax.random.PRNGKey(3),
                                         method=module.generate)
    assert restored.shape == (2, 32, 32, 3)
