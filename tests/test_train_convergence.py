"""Training behavior: loss decreases; data-parallel grads match single-device."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcquic_tpu.loss import PSNR
from mcquic_tpu.models.compressor import Compressor
from mcquic_tpu.parallel import batchSharding, makeMesh, replicated, zeroShardings
from mcquic_tpu.train.state import TrainState, makeTrainStep


def _setup(tx=None):
    module = Compressor(channel=8, m=1, k=(16,))
    tx = tx or optax.adam(3e-4)
    stepFn = makeTrainStep(module, tx, PSNR())
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x, train=True)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(2))
    return module, stepFn, state


def test_loss_decreases_overfit_single_batch():
    _, stepFn, state = _setup()
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
    jitStep = jax.jit(stepFn)
    first = None
    for i in range(30):
        state, metrics = jitStep(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_data_parallel_matches_single_device():
    """The 8-way sharded step must produce the same new params as unsharded
    (GSPMD all-reduce == serial sum)."""
    module, stepFn, state = _setup()
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))

    # single-device
    s1, m1 = jax.jit(stepFn)(state, batch)

    # 8-device mesh
    mesh = makeMesh()
    rep = replicated(mesh)
    shardings = TrainState(
        step=rep,
        params=jax.tree_util.tree_map(lambda _: rep, state.params),
        coder=jax.tree_util.tree_map(lambda _: rep, state.coder),
        optState=zeroShardings(mesh, state.optState),
        rng=rep)
    stateSharded = jax.device_put(state, shardings)
    batchSharded = jax.device_put(batch, batchSharding(mesh))
    s8, m8 = jax.jit(stepFn, in_shardings=(shardings, batchSharding(mesh)),
                     out_shardings=(shardings, None))(stateSharded, batchSharded)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s8.params))):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_generator_tp_shardings_specs():
    """Column/row-parallel specs land on the transformer projections only."""
    import jax
    from mcquic_tpu.models.generator import GeneratorV3SelfAttention
    from mcquic_tpu.parallel import generatorShardings, makeMesh

    mesh = makeMesh(dataParallel=4, modelParallel=2)
    module = GeneratorV3SelfAttention(channel=8, k=16, size=(2, 1, 1),
                                      hiddenSize=32, depth=1, nHeads=4, numClasses=10)
    img = jnp.zeros((1, 32, 32, 3))
    lbl = jnp.zeros((1,), jnp.int32)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, img, lbl, train=True)
    shardings = generatorShardings(mesh, variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {tuple(str(getattr(p, "key", p)) for p in path): s.spec
             for path, s in flat}
    colSharded = [k for k, v in specs.items() if tuple(v) == (None, "model")]
    rowSharded = [k for k, v in specs.items() if tuple(v) == ("model", None)]
    assert any("wq" in k for k in colSharded)
    assert any("w1" in k for k in colSharded)
    assert any("wo" in k for k in rowSharded)
    assert any("w2" in k for k in rowSharded)
    # compressor (frozen) stays replicated
    assert all("compressor" not in k for k in colSharded + rowSharded)


def test_zero_shardings_shard_largest_divisible_axis():
    import optax
    from mcquic_tpu.parallel import makeMesh, zeroShardings

    mesh = makeMesh(dataParallel=8, modelParallel=1)
    tree = {"a": np.zeros((16, 3)),     # dim0 divisible by 8 -> sharded
            "b": np.zeros((3, 5)),      # nothing divisible -> replicated
            "c": np.zeros((4, 24))}     # dim1 divisible -> sharded
    sh = zeroShardings(mesh, tree)

    def norm(spec):
        t = tuple(spec)
        while t and t[-1] is None:
            t = t[:-1]
        return t

    assert norm(sh["a"].spec) == ("data",)
    assert norm(sh["b"].spec) == ()
    assert norm(sh["c"].spec) == (None, "data")
