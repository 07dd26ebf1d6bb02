"""Stage-2 training must LEARN, not just produce finite losses.

Round-4 hardware finding: the product gen recipe executed 3,200 TPU steps
with FusedLAMB lr 1e-4 (the reference a800_gen_16.yaml optimizer,
`/root/reference/configs/a800_gen_16.yaml:24-27`) and never left uniform CE
(~ln k at every level). Root cause: LAMB's trust ratio caps each layer's
update norm at lr*||w||, so the VAR-style tiny-init logits head
(`models/generator.py` finalLinear, trunc-normal sigma ~5.6e-4 at hidden
512) grows only ~e^(lr*steps) — nothing at single-chip budgets. The earlier
test tier asserted finiteness only, which let this through.

These tests pin both sides:
  * the product step function memorizes a fixed batch under Adam
    (teacher-forced CE falls well below uniform), and
  * the GenTrainer warns on a LAMB budget that cannot grow small-init
    layers (the guard added with the fix).
"""
import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow

from mcquic_tpu.train.genTrainer import (_trainableMask, constructGenerator,
                                         makeGenTrainStep)
from mcquic_tpu.train.state import TrainState

K = 64
SIZE = [4, 2, 1, 1]


def _setup(tx):
    module = constructGenerator("GeneratorV3SelfAttention", {
        "channel": 8, "k": K, "size": SIZE, "hiddenSize": 64, "depth": 2,
        "nHeads": 4, "numClasses": 10})
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (2, 64, 64, 3), jnp.float32, -1, 1)
    lbl = jnp.asarray([1, 2], jnp.int32)
    variables = module.init({"params": jax.random.PRNGKey(1),
                             "gumbel": jax.random.PRNGKey(2)}, img, lbl,
                            train=True)
    masked = optax.masked(tx, _trainableMask(variables["params"]))
    state = TrainState.create(dict(variables), masked, rng)
    stepFn = jax.jit(makeGenTrainStep(module, masked))
    return state, stepFn, img, lbl


def test_gen_step_memorizes_fixed_batch_with_adam():
    state, stepFn, img, lbl = _setup(optax.adam(1e-3))
    first = None
    for i in range(120):
        state, m = stepFn(state, img, lbl)
        if first is None:
            first = float(m["ceLv00"])
    last = float(m["ceLv00"])
    uniform = float(np.log(K))
    assert first == pytest.approx(uniform, abs=0.2), "tiny-init head starts uniform"
    # Memorizing 2 fixed images must cut CE far below uniform quickly.
    assert last < uniform - 1.0, f"CE did not descend: {first:.3f} -> {last:.3f}"


def test_gen_trainer_warns_on_lamb_growth_bound(tmp_path, caplog):
    from mcquic_tpu.config import Config
    from mcquic_tpu.train.genTrainer import GenTrainer

    cfg = Config.deserialize({
        "model": {"key": "GeneratorV3SelfAttention",
                  "params": {"channel": 8, "k": 16, "size": [2, 1, 1],
                             "hiddenSize": 32, "depth": 2, "nHeads": 4,
                             "numClasses": 10}},
        "train": {
            "totalStep": 3200, "batchSize": 1, "epoch": 1, "valFreq": 10,
            "trainSet": "unused", "valSet": "unused",
            "saveDir": str(tmp_path / "gen_saved"), "target": "MsSSIM",
            "optim": {"key": "FusedLAMB", "params": {"lr": 1e-4}},
            "schdr": {"key": "Placeholder", "params": {}},
            "gpu": {"gpus": 8},
        },
    })
    with caplog.at_level(logging.WARNING, logger="mcquic_tpu.train.gen"):
        GenTrainer(cfg, imageSize=16)
    assert any("trust" in r.message for r in caplog.records), \
        "LAMB short-budget guard did not fire"
