"""TPU probe: VQ encode variants at qp-2 level-0 geometry.

Compares, under the bench.py fori_loop protocol (per-call dispatch on the
axon tunnel swamps per-op timings — NOTES.md):
  * chunked   — ops.vq.vqEncodeChunked (the XLA scan default)
  * chunkbf16 — same scan with native-dtype (bf16) matmul operands
  * plain     — materialize [T,k] distances + argmin (reference-style)
  * resident  — ops.vq_pallas.vqEncodeResident (codebook VMEM-resident,
                k loop inside the kernel; round-3 experiment closing the
                round-2 verdict's open Pallas question)

Run ON TPU (no JAX_PLATFORMS override). Prints one JSON line per variant.
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
M, T, D, K = 2, 15360, 64, 8192  # qp-2 level 0 at 10x768x512


def main(dtype=jnp.bfloat16):
    from functools import partial

    from mcquic_tpu.ops.vq import vqEncodeChunked
    from mcquic_tpu.ops.vq_pallas import vqEncodeResident

    rng = np.random.default_rng(0)
    # [n,h,w,m,d] layout for the vq.py entry points; n*h*w = T
    x = jnp.asarray(rng.normal(size=(1, 120, 128, M, D)), dtype)
    cb = jnp.asarray(rng.normal(size=(M, K, D)), jnp.float32)
    xg = jnp.asarray(x.reshape(T, M, D).transpose(1, 0, 2))  # [m,T,d]

    def chunkedBf16(x_, cb_, chunk=1024):
        n, h, w, m, d = x_.shape
        k = cb_.shape[1]
        xT = x_.reshape(n * h * w, m, d).transpose(1, 0, 2)
        cbc = cb_.astype(x_.dtype)
        nChunks = k // chunk
        cbChunks = cbc.reshape(m, nChunks, chunk, d).transpose(1, 0, 2, 3)
        c2all = jnp.sum(cb_.astype(jnp.float32) ** 2, -1).reshape(m, nChunks, chunk).transpose(1, 0, 2)
        Tn = n * h * w
        init = (jnp.full((m, Tn), jnp.inf, jnp.float32), jnp.zeros((m, Tn), jnp.int32))

        def body(carry, inp):
            best, barg = carry
            ci, cbC, c2 = inp
            scores = jnp.einsum("mtd,mkd->mtk", xT, cbC,
                                preferred_element_type=jnp.float32)
            dist = c2[:, None, :] - 2.0 * scores
            localMin = jnp.min(dist, -1)
            localArg = jnp.argmin(dist, -1).astype(jnp.int32) + ci * chunk
            better = localMin < best
            return (jnp.where(better, localMin, best),
                    jnp.where(better, localArg, barg)), None

        (best, barg), _ = jax.lax.scan(
            body, init, (jnp.arange(nChunks, dtype=jnp.int32), cbChunks, c2all))
        return barg.transpose(1, 0).reshape(n, h, w, m)

    def plain(x_, cb_):
        c = cb_.astype(jnp.float32)
        c2 = jnp.sum(c * c, -1)
        inter = jnp.einsum("nhwmd,mkd->nhwmk", x_.astype(jnp.float32), c,
                           preferred_element_type=jnp.float32)
        return jnp.argmin(c2 - 2.0 * inter, axis=-1).astype(jnp.int32)

    variants = {
        "chunked": (lambda a, b: vqEncodeChunked(a, b), x, cb),
        "chunkbf16": (chunkedBf16, x, cb),
        "plain": (plain, x, cb),
        "resident": (lambda a, b: vqEncodeResident(a, b), xg, cb),
    }
    only = sys.argv[1:] or list(variants)

    results = {}
    for name in only:
        fn, a, b = variants[name]

        @jax.jit
        def loop(a_, b_):
            def body(i, carry):
                shifted = a_ * (1.0 + i.astype(a_.dtype) * 1e-3)
                return fn(shifted, b_)
            return jax.lax.fori_loop(0, ITERS, body, fn(a_, b_))

        try:
            t0 = time.perf_counter()
            out = loop(a, b)
            jax.block_until_ready(out)
            compileS = time.perf_counter() - t0
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = loop(a, b)
                jax.block_until_ready(out)
                np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
                best = min(best, time.perf_counter() - t0)
            results[name] = {"msPerIter": round(best / ITERS * 1e3, 3),
                             "compileS": round(compileS, 1)}
        except Exception as e:  # noqa: BLE001 — report and continue
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({name: results[name]}), flush=True)

    # agreement check (codes may differ at ties/precision; report mismatch rate)
    if "resident" in only and "chunked" in only:
        want = np.asarray(vqEncodeChunked(x, cb)).reshape(T, M).transpose(1, 0)
        got = np.asarray(vqEncodeResident(xg, cb))
        print(json.dumps({"residentMismatchRate":
                          float((want != got).mean())}), flush=True)


if __name__ == "__main__":
    main()
