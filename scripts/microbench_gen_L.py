"""TPU microbench: stage-2 generator train step at REFERENCE scale.

AnyRes_L (hidden 1536 x depth 24, generator_3.py:1384-1428) over the
17-level 596-token pyramid (configs/a800_gen_16.yaml geometry) — the
round-2 verdict asked for a compile/step/HBM datapoint at this geometry.

Usage: python scripts/microbench_gen_L.py [preset] [batch] [iters]
  preset in {AnyRes_S, AnyRes_B, AnyRes_L, AnyRes_XL} (default AnyRes_L)

Run ON TPU; prints one JSON line (msPerStep, imagesPerSec, paramsM, HBM).
"""
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mcquic_tpu.cli import _enableCompileCache

_enableCompileCache()

SIZE17 = (16, 8, 8, 8, 8, 4, 4, 4, 4, 2, 2, 2, 2, 1, 1, 1, 1)  # 596 tokens


def main(preset: str = "AnyRes_L", batch: int = 4, iters: int = 8):
    from mcquic_tpu.models.generator import AnyResConfigs, GeneratorV3SelfAttention
    from mcquic_tpu.train.genTrainer import _trainableMask, makeGenTrainStep
    from mcquic_tpu.train.state import TrainState
    from mcquic_tpu.utils.initialization import fastInit

    cfg = AnyResConfigs()[preset]
    # L/XL: teacher-forced activations at depth>=24 x hidden>=1536 exceed
    # single-chip HBM without per-block remat.
    remat = preset in ("AnyRes_L", "AnyRes_XL")
    module = GeneratorV3SelfAttention(
        channel=256, k=4096, size=SIZE17, numClasses=1000,
        dtype=jnp.bfloat16, remat=remat, **cfg)
    img = jnp.zeros((batch, 256, 256, 3), jnp.float32)  # gen loader crops 256^2 -> latent 32 -> size[0]=16
    lbl = jnp.zeros((batch,), jnp.int32)
    rng = jax.random.PRNGKey(0)
    variables = fastInit(module, {"params": rng, "gumbel": rng}, img, lbl,
                         train=True)
    tx = optax.masked(optax.adam(1e-4), _trainableMask(variables["params"]))
    stepFn = makeGenTrainStep(module, tx)
    state = TrainState.create(variables, tx, rng)

    rngNp = np.random.default_rng(0)
    images = jnp.asarray(rngNp.integers(0, 256, (batch, 256, 256, 3)), jnp.uint8)
    labels = jnp.asarray(rngNp.integers(0, 1000, (batch,)), jnp.int32)

    # Donate the carried state like the product step (genTrainer jits with
    # donate_argnums=(0,)); without aliasing, params+moments are double-
    # buffered and AnyRes_L overflows the 16G chip at any batch size.
    @partial(jax.jit, donate_argnums=(0,))
    def loop(state, images, labels):
        def body(i, carry):
            st, _ = carry
            return stepFn(st, images, labels)
        return jax.lax.fori_loop(0, iters - 1, body,
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
    for _ in range(2):
        t0 = time.perf_counter()
        out = loop(out[0], images, labels)  # state donated: thread it through
        sync(out)
        best = min(best, time.perf_counter() - t0)
    nParams = sum(int(np.prod(l.shape)) for l in
                  jax.tree_util.tree_leaves(variables["params"]))
    try:
        stats = jax.devices()[0].memory_stats() or {}
        hbmGb = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        hbmGb = None
    print(json.dumps({
        "metric": f"stage-2 {preset} train step ({batch}x256^2, 17-level 596-token pyramid)",
        "msPerStep": round(best / iters * 1e3, 1),
        "imagesPerSec": round(iters * batch / best, 2),
        "paramsM": round(nParams / 1e6, 1),
        "compileWallS": round(compileS, 1),
        "peakHbmGiB": hbmGb,
        "lossFinite": bool(np.isfinite(float(out[1]["loss"]))),
    }))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "AnyRes_L", int(a[1]) if len(a) > 1 else 4,
         int(a[2]) if len(a) > 2 else 8)
