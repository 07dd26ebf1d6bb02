"""TPU microbench: stage-2 generator train-step throughput at a mid-scale
geometry (AnyRes-S-like transformer over the 5-level token pyramid).

Times the full class-conditional gen train step (frozen tokenizer encode +
AnyRes transformer + per-level CE + masked optimizer update) with the
fori_loop protocol (NOTES.md). Run ON TPU; prints one JSON line.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mcquic_tpu.cli import _enableCompileCache

_enableCompileCache()

ITERS = 20
BATCH, HW = 8, 256


def main():
    from mcquic_tpu.models.generator import GeneratorV3SelfAttention
    from mcquic_tpu.train.genTrainer import _trainableMask, makeGenTrainStep
    from mcquic_tpu.train.state import TrainState
    from mcquic_tpu.utils.initialization import fastInit

    module = GeneratorV3SelfAttention(
        channel=64, k=4096, size=(16, 8, 4, 2, 2), hiddenSize=512, depth=8,
        nHeads=8, numClasses=1000, dtype=jnp.bfloat16)
    img = jnp.zeros((BATCH, HW, HW, 3), jnp.float32)
    lbl = jnp.zeros((BATCH,), jnp.int32)
    rng = jax.random.PRNGKey(0)
    variables = fastInit(module, {"params": rng, "gumbel": rng}, img, lbl,
                         train=True)
    tx = optax.masked(optax.adam(1e-4), _trainableMask(variables["params"]))
    stepFn = makeGenTrainStep(module, tx)
    state = TrainState.create(variables, tx, rng)

    rngNp = np.random.default_rng(0)
    images = jnp.asarray(rngNp.integers(0, 256, (BATCH, HW, HW, 3)), jnp.uint8)
    labels = jnp.asarray(rngNp.integers(0, 1000, (BATCH,)), jnp.int32)

    @jax.jit
    def loop(state, images, labels):
        def body(i, carry):
            st, _ = carry
            return stepFn(st, images, labels)
        # init carry is the 1st step; ITERS-1 body iterations = ITERS total
        return jax.lax.fori_loop(0, ITERS - 1, body,
                                 stepFn(state, images, labels))

    def sync(out):
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.ravel(leaf)[:1].astype(jnp.float32))

    t0 = time.perf_counter()
    out = loop(state, images, labels)
    sync(out)
    compileS = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(loop(state, images, labels))
        best = min(best, time.perf_counter() - t0)
    nParams = sum(int(np.prod(l.shape)) for l in
                  jax.tree_util.tree_leaves(variables["params"]))
    print(json.dumps({
        "metric": "stage-2 gen train step (hidden 512 x depth 8, 8x256^2, 596-token pyramid)",
        "msPerStep": round(best / ITERS * 1e3, 1),
        "imagesPerSec": round(ITERS * BATCH / best, 1),
        "paramsM": round(nParams / 1e6, 1),
        "compileWallS": round(compileS, 1),
        "lossFinite": bool(np.isfinite(float(out[1]["loss"]))),
    }))


if __name__ == "__main__":
    main()
