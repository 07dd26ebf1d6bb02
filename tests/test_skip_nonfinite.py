"""Non-finite step guard: a poisoned batch must SKIP the update (params,
coder, optimizer state untouched; rng/step advance) so training state can
never be poisoned — the reference crashes outright (trainer.py:434-437);
production TPU runs skip-and-continue, crashing only on persistence."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mcquic_tpu.loss import MsSSIM
from mcquic_tpu.models.compressor import Compressor
from mcquic_tpu.train.state import TrainState, makeTrainStep


def _setup():
    module = Compressor(channel=8, m=1, k=(16, 8))
    tx = optax.adam(1e-3)
    stepFn = jax.jit(makeTrainStep(module, tx, MsSSIM()))
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x, train=True)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(2))
    return stepFn, state


def test_nan_batch_skips_update_and_state_stays_clean():
    stepFn, state = _setup()
    good = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)),
                       jnp.float32)
    bad = good.at[0, 0, 0, 0].set(jnp.nan)

    state1, m1 = stepFn(state, good)
    assert float(m1["skipped"]) == 0.0 and np.isfinite(float(m1["loss"]))

    state2, m2 = stepFn(state1, bad)
    assert float(m2["skipped"]) == 1.0
    assert int(state2.step) == int(state1.step) + 1
    # params/coder/optState identical to pre-step values
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state1.optState),
                    jax.tree_util.tree_leaves(state2.optState)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # rng advanced: the next good step proceeds normally
    state3, m3 = stepFn(state2, good)
    assert float(m3["skipped"]) == 0.0 and np.isfinite(float(m3["loss"]))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                        jax.tree_util.tree_leaves(state3.params)))


def test_gen_step_guard():
    from mcquic_tpu.models.generator import GeneratorV3SelfAttention
    from mcquic_tpu.train.genTrainer import _trainableMask, makeGenTrainStep

    module = GeneratorV3SelfAttention(channel=8, k=16, size=(2, 1, 1),
                                      hiddenSize=32, depth=1, nHeads=4,
                                      numClasses=10)
    img = jnp.zeros((2, 32, 32, 3), jnp.float32)
    lbl = jnp.zeros((2,), jnp.int32)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, img, lbl,
                            train=True)
    tx = optax.masked(optax.adam(1e-3), _trainableMask(variables["params"]))
    stepFn = jax.jit(makeGenTrainStep(module, tx))
    state = TrainState.create(variables, tx, jax.random.PRNGKey(2))

    good = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, img.shape),
                       jnp.float32)
    state1, m1 = stepFn(state, good, lbl)
    assert float(m1["skipped"]) == 0.0
    # an inf PIXEL vanishes through the tokenizer's argmin, so poison a
    # transformer weight instead (the realistic failure: diverging params
    # -> non-finite logits/loss) and require the update to be skipped
    import flax.traverse_util as tu
    fp = tu.flatten_dict(dict(state1.params))
    # must be a weight on the CE-loss path (the pixel decoders are not):
    # any attention query projection qualifies
    key = next(k for k in fp if "wq" in map(str, k))
    fp[key] = fp[key].at[0, 0].set(jnp.inf)
    state1 = state1.replace(params=tu.unflatten_dict(fp))
    state2, m2 = stepFn(state1, good, lbl)
    assert float(m2["skipped"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
