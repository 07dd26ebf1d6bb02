"""Diagnose the stage-2 no-learn stall: can the product gen stepFn memorize
ONE fixed batch? A healthy transformer should drive teacher-forced CE toward
the label-smoothing floor within a few hundred steps; CE pinned at ln(k)
means the optimization (or the model's logit path) is broken, independent of
data/recipe scale.

Runs entirely on CPU with a tiny geometry. Compares optimizers/clip settings
side by side. Usage: JAX_PLATFORMS=cpu python scripts/gen_overfit_probe.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from mcquic_tpu.models.generator import GeneratorV3SelfAttention
from mcquic_tpu.train.genTrainer import constructGenerator, makeGenTrainStep, _trainableMask
from mcquic_tpu.train.state import TrainState

SIZE = [4, 2, 1, 1]
K = 64


def run(optName, makeTx, steps=300, clipNorm=2.0, lr=1e-3):
    module = constructGenerator("GeneratorV3SelfAttention", {
        "channel": 8, "k": K, "size": SIZE, "hiddenSize": 64, "depth": 2,
        "nHeads": 4, "numClasses": 10})
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (2, 64, 64, 3), jnp.float32, -1, 1)
    lbl = jnp.asarray([1, 2], jnp.int32)
    variables = module.init({"params": jax.random.PRNGKey(1),
                             "gumbel": jax.random.PRNGKey(2)}, img, lbl, train=True)
    inner = makeTx(lr)
    tx = optax.masked(inner, _trainableMask(variables["params"]))
    state = TrainState.create(dict(variables), tx, rng)
    stepFn = jax.jit(makeGenTrainStep(module, tx, clipNorm=clipNorm))
    hist = []
    for i in range(steps):
        state, m = stepFn(state, img, lbl)
        if i % 50 == 0 or i == steps - 1:
            hist.append((i, float(m["loss"]), float(m["ceLv00"]),
                         float(m[f"ceLv{len(SIZE)-1:02d}"]), float(m["gradNorm"])))
    print(f"--- {optName} (lr={lr}, clip={clipNorm}) uniformCE={np.log(K):.3f}")
    for i, l, c0, cL, g in hist:
        print(f"  step {i:4d} loss {l:10.3f} ceLv00 {c0:.3f} ceLast {cL:.3f} gnorm {g:10.2f}")


if __name__ == "__main__":
    run("lamb", lambda lr: optax.lamb(lr), lr=1e-4)
    run("adam", lambda lr: optax.adam(lr), lr=1e-4)
    run("adam-noclip", lambda lr: optax.adam(lr), lr=1e-4, clipNorm=1e9)
