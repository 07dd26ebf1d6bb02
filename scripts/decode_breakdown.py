"""TPU probe: where does qp-2 decode time go?

Times, under the bench.py fori_loop protocol:
  * full      — module.decode (quantizer decode + decoder stem)
  * quant     — quantizer.decode(codes) -> yHat only
  * stem      — _decoder(yHat) only
  * thinconv  — standalone final pixelShuffle3x3 stage (3x3 conv 128->12 @
                384x256 + depth-to-space): the suspected MXU lane-util tax
  * foldconv  — phase-folded equivalent (2x2 conv 512->48 @ 192x128 +
                combined depth-to-space), candidate replacement

Run ON TPU. Prints one JSON line per entry.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

ITERS = 50
BATCH, H, W = 10, 768, 512
KS = (8192, 2048, 512)


def bestOf(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compileS = time.perf_counter() - t0
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1].astype(jnp.float32))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1].astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3, compileS, out


def main():
    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.utils.initialization import fastInit

    module = Compressor(channel=128, m=2, k=KS, dtype=jnp.bfloat16)
    x0 = jnp.zeros((BATCH, H, W, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = jax.device_put(
        fastInit(module, {"params": rng, "gumbel": rng}, x0, train=False))
    rngNp = np.random.default_rng(0)
    codes = jax.device_put([
        jnp.asarray(rngNp.integers(0, kk, (BATCH, H // s, W // s, 2)), jnp.int32)
        for kk, s in zip(KS, (16, 32, 64))])

    only = sys.argv[1:] or ["full", "quant", "stem", "thinconv", "foldconv"]
    results = {}

    def timeLoop(name, makeBody, init):
        @jax.jit
        def loop(vars_, a):
            def body(i, carry):
                return makeBody(vars_, a, i)
            return jax.lax.fori_loop(0, ITERS, body,
                                     makeBody(vars_, a, jnp.asarray(0)))
        ms, compileS, _ = bestOf(loop, variables, init)
        results[name] = {"msPerIter": round(ms, 2), "compileS": round(compileS, 1)}
        print(json.dumps({name: results[name]}), flush=True)

    if "full" in only:
        timeLoop("full", lambda v, cs, i: module.apply(
            v, [(c + i) % kk for c, kk in zip(cs, KS)], method=module.decode), codes)
    if "quant" in only:
        timeLoop("quant", lambda v, cs, i: module.apply(
            v, [(c + i) % kk for c, kk in zip(cs, KS)],
            method=lambda m, c: m._quantizer.decode(c)), codes)
    if "stem" in only:
        yHat = module.apply(variables, codes,
                            method=lambda m, c: m._quantizer.decode(c))
        yHat = jax.device_put(jax.block_until_ready(yHat))
        timeLoop("stem", lambda v, y, i: module.apply(
            v, y * (1.0 + jnp.asarray(i, y.dtype) * 1e-3),
            method=lambda m, yy: m._decoder(yy)), yHat)

    # standalone final-stage variants (fresh params; cost, not parity)
    key = jax.random.PRNGKey(1)
    if "thinconv" in only:
        wThin = jax.device_put(
            jax.random.normal(key, (3, 3, 128, 12), jnp.bfloat16) * 0.05)
        xIn = jax.device_put(
            jax.random.normal(key, (BATCH, H // 2, W // 2, 128), jnp.bfloat16))

        def thin(w, x, i):
            x = x * (1.0 + jnp.asarray(i, x.dtype) * 1e-3)
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            n, h, w2, c = y.shape
            y = y.reshape(n, h, w2, 2, 2, 3).transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(n, h * 2, w2 * 2, 3)

        timeLoop("thinconv", lambda v, x, i: thin(wThin, x, i), xIn)
    if "foldconv" in only:
        wFold = jax.device_put(
            jax.random.normal(key, (2, 2, 512, 48), jnp.bfloat16) * 0.05)
        xIn4 = jax.device_put(
            jax.random.normal(key, (BATCH, H // 4, W // 4, 512), jnp.bfloat16))

        def fold(w, x, i):
            x = x * (1.0 + jnp.asarray(i, x.dtype) * 1e-3)
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            n, h, w2, c = y.shape  # 48 = 4 phases x (4 subpix x 3)
            y = y.reshape(n, h, w2, 4, 4, 3).transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(n, h * 4, w2 * 4, 3)

        timeLoop("foldconv", lambda v, x, i: fold(wFold, x, i), xIn4)

    if "deconvfinal" in only:
        # what the stem actually runs today under MCQUIC_SUBPIXEL=deconv:
        # one transposed conv 128->3 producing full res directly
        from mcquic_tpu.nn.functional import subpixelConvTranspose
        wT = jax.device_put(
            jax.random.normal(key, (3, 3, 128, 12), jnp.bfloat16) * 0.05)
        xIn = jax.device_put(
            jax.random.normal(key, (BATCH, H // 2, W // 2, 128), jnp.bfloat16))
        timeLoop("deconvfinal",
                 lambda v, x, i: subpixelConvTranspose(
                     x * (1.0 + jnp.asarray(i, x.dtype) * 1e-3), wT, None, 2),
                 xIn)

    if "thinpallas" in only:
        # fused scatter-layout conv+D2S kernel (ops/subpixel_pallas.py):
        # candidate replacement for thinconv, no lane pad, no XLA-side halo
        from mcquic_tpu.ops.subpixel_pallas import conv3x3SubpixelThin
        wThin = jax.device_put(
            jax.random.normal(key, (3, 3, 128, 12), jnp.bfloat16) * 0.05)
        xIn = jax.device_put(
            jax.random.normal(key, (BATCH, H // 2, W // 2, 128), jnp.bfloat16))

        timeLoop("thinpallas",
                 lambda v, x, i: conv3x3SubpixelThin(
                     x * (1.0 + jnp.asarray(i, x.dtype) * 1e-3), wThin, None,
                     rate=2), xIn)

    if "folds2d" in only:
        # candidate: S2D(2) -> 2x2 conv 512->48 -> D2S(4), including the
        # layout move the foldconv variant omitted
        wFold = jax.device_put(
            jax.random.normal(key, (2, 2, 512, 48), jnp.bfloat16) * 0.05)
        xIn = jax.device_put(
            jax.random.normal(key, (BATCH, H // 2, W // 2, 128), jnp.bfloat16))

        def folds2d(w, x, i):
            x = x * (1.0 + jnp.asarray(i, x.dtype) * 1e-3)
            n, h, w2, c = x.shape
            xs = x.reshape(n, h // 2, 2, w2 // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
            xs = xs.reshape(n, h // 2, w2 // 2, 4 * c)
            y = jax.lax.conv_general_dilated(
                xs, w, (1, 1), [(0, 1), (0, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            n, h4, w4, _ = y.shape
            y = y.reshape(n, h4, w4, 4, 4, 3).transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(n, h4 * 4, w4 * 4, 3)

        timeLoop("folds2d", lambda v, x, i: folds2d(wFold, x, i), xIn)

    if "firstconv" in only:
        # encoder stem entry: 3x3 stride-2 conv 3->128 @768x512 (3-deep
        # contraction = MXU depth tax)
        wF = jax.device_put(
            jax.random.normal(key, (3, 3, 3, 128), jnp.bfloat16) * 0.05)
        xImg = jax.device_put(
            jax.random.normal(key, (BATCH, H, W, 3), jnp.bfloat16))

        def first(w, x, i):
            x = x * (1.0 + jnp.asarray(i, x.dtype) * 1e-3)
            return jax.lax.conv_general_dilated(
                x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        timeLoop("firstconv", lambda v, x, i: first(wF, x, i), xImg)

    if "firstfold" in only:
        # candidate: S2D(2) -> 2x2 conv 12->128 (pad lo 0 hi 1) @384x256
        wF2 = jax.device_put(
            jax.random.normal(key, (2, 2, 12, 128), jnp.bfloat16) * 0.05)
        xImg = jax.device_put(
            jax.random.normal(key, (BATCH, H, W, 3), jnp.bfloat16))

        def firstFold(w, x, i):
            x = x * (1.0 + jnp.asarray(i, x.dtype) * 1e-3)
            n, h, w2, c = x.shape
            xs = x.reshape(n, h // 2, 2, w2 // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
            xs = xs.reshape(n, h // 2, w2 // 2, 4 * c)
            return jax.lax.conv_general_dilated(
                xs, w, (1, 1), [(0, 1), (0, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        timeLoop("firstfold", lambda v, x, i: firstFold(wF2, x, i), xImg)


if __name__ == "__main__":
    main()
