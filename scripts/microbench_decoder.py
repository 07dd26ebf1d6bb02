"""TPU microbench: decoder throughput, shuffle vs transposed-conv subpixel.

Times the qp-2 decode path (quantizer decode + decoder stem) under both
MCQUIC_SUBPIXEL modes with the fori_loop protocol from bench.py (per-call
dispatch on the axon tunnel is ~280 ms and would swamp the measurement —
NOTES.md). Also measures the decode-side host->device upload of packed codes
(bench.py previously reused the fetch time; VERDICT weak #6).

Run ON TPU (no JAX_PLATFORMS override). Prints one JSON line.
"""
import json
import os
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


def main():
    from functools import partial

    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.utils.initialization import fastInit

    module = Compressor(channel=128, m=2, k=KS, dtype=jnp.bfloat16)
    x0 = jnp.zeros((BATCH, H, W, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = fastInit(module, {"params": rng, "gumbel": rng}, x0, train=False)
    applyVars = jax.device_put(variables)

    rngNp = np.random.default_rng(0)
    codesHost = [rngNp.integers(0, kk, (BATCH, H // s, W // s, 2)).astype(np.int32)
                 for kk, s in zip(KS, (16, 32, 64))]
    codesDev = jax.device_put([jnp.asarray(c) for c in codesHost])
    decodeApply = partial(module.apply, method=module.decode)

    def makeLoop():
        @jax.jit
        def decodeLoop(vars_, cs):
            def body(i, carry):
                shifted = [(c + i) % kk for c, kk in zip(cs, KS)]
                return decodeApply(vars_, shifted)
            return jax.lax.fori_loop(0, ITERS, body, decodeApply(vars_, cs))
        return decodeLoop

    def _sync(out):
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1].astype(jnp.float32))

    def bestOf(fn, repeats=3):
        out = fn()
        _sync(out)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    for mode in ("shuffle", "deconv"):
        os.environ["MCQUIC_SUBPIXEL"] = mode
        loop = makeLoop()
        t0 = time.perf_counter()
        tDec = bestOf(lambda: loop(applyVars, codesDev))
        results[mode] = {"decodeLoopS": round(tDec, 3),
                         "msPerIter": round(tDec / ITERS * 1e3, 2),
                         "wallInclCompileS": round(time.perf_counter() - t0, 1)}

    # decode-side upload: packed codes host->device, one RPC per iteration
    packed = np.concatenate([c.reshape(BATCH, -1) for c in codesHost], axis=1)
    jax.block_until_ready(jax.device_put(packed))  # warm
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(jax.device_put(packed))
    results["uploadPerIterMs"] = round((time.perf_counter() - t0) / reps * 1e3, 1)

    pixels = ITERS * BATCH * H * W
    for mode in ("shuffle", "deconv"):
        results[mode]["deviceDecMpps"] = round(pixels / results[mode]["decodeLoopS"] / 1e6, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
