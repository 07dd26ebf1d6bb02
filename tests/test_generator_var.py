"""VAR generator smoke tests (tiny geometry, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.models.generator_var import GeneratorVAR, levelCausalBias


@pytest.fixture(scope="module")
def tinyVar():
    module = GeneratorVAR(channel=8, k=16, size=(2, 1, 1), denseNorm=False,
                          depth=2, embedDim=32, nHeads=4, numClasses=10)
    img = jnp.zeros((2, 32, 32, 3))
    lbl = jnp.zeros((2,), jnp.int32)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, img, lbl, train=True)
    return module, variables


def test_level_causal_bias():
    bias = np.asarray(levelCausalBias([1, 2]))
    assert bias.shape == (5, 5)
    assert bias[0, 0] == 0 and np.isinf(bias[0, 1]) and bias[0, 1] < 0
    # level-1 tokens see level 0 and all of level 1
    assert (bias[1:, :] == 0).all()


def test_var_training_forward(tinyVar):
    module, variables = tinyVar
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3), minval=-1, maxval=1)
    lbl = jnp.asarray([1, 2], jnp.int32)
    logits, loss, codes, restored, perLevel = module.apply(
        variables, img, lbl, train=True, rngs={"gumbel": jax.random.PRNGKey(3)})
    assert logits.shape == (2, 1 + 1 + 4, 16)  # L = 1+1+4, k = 16
    assert jnp.isfinite(loss)
    assert len(perLevel) == 3


def test_var_cfg_sampling(tinyVar):
    module, variables = tinyVar
    lbl = jnp.asarray([0, 3], jnp.int32)
    predictions, restored = module.apply(
        variables, lbl, jax.random.PRNGKey(4), cfg=1.5, topK=4, topP=0.9,
        method=module.generate)
    assert len(predictions) == 3
    assert predictions[0].shape == (2, 1, 1, 1)
    assert predictions[1].shape == (2, 1, 1, 1)
    assert predictions[2].shape == (2, 2, 2, 1)
    assert restored.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(restored)).all()
