"""Benchmark: qp-2 codec throughput on one chip, reference protocol.

Protocol parity with `mcquic/validate/validator.py:60-97`: 50 iterations of a
10 x 768 x 512 batch through compress then decompress, model at qp-2 geometry
(channel 128, m 2, k [8192,2048,512]; reference README.md:301-308). Includes
the host-side rANS entropy coding (the reference speed test ran the full
compress()/decompress() path through its C++ coder).

Prints ONE json line:
  {"metric": ..., "value": Mpps, "unit": "Mpps", "vs_baseline": ratio}
vs_baseline compares round-trip throughput against the reference's combined
encode+decode rate on RTX 3090: 1/(1/25.45 + 1/22.03) = 11.81 Mpps.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50
BATCH, H, W = 10, 768, 512
BASELINE_COMBINED = 1.0 / (1.0 / 25.45 + 1.0 / 22.03)  # 11.81 Mpps


def main():
    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.models.engine import CompressorEngine

    from mcquic_tpu.utils.initialization import fastInit

    module = Compressor(channel=128, m=2, k=(8192, 2048, 512), dtype=jnp.bfloat16)
    x0 = jnp.zeros((BATCH, H, W, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    # host-side init: avoids compiling the full init graph (throughput bench
    # only needs shape-faithful random weights)
    variables = fastInit(module, {"params": rng, "gumbel": rng}, x0, train=False)
    engine = CompressorEngine(module, variables, qp="2")

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (BATCH, H, W, 3)).astype(np.float32)

    # ---- warm up (compiles encode + decode, builds CDFs/LUTs)
    codes, binaries, headers = engine.compress(img)
    restored = engine.decompress(binaries, headers)
    assert restored.shape == img.shape

    # ---- encode: device model + host rANS per iteration
    t0 = time.perf_counter()
    for _ in range(ITERS):
        codes, binaries, headers = engine.compress(img)
    tEnc = time.perf_counter() - t0

    # ---- decode
    t0 = time.perf_counter()
    for _ in range(ITERS):
        restored = engine.decompress(binaries, headers)
    tDec = time.perf_counter() - t0

    pixels = ITERS * BATCH * H * W
    encMpps = pixels / tEnc / 1e6
    decMpps = pixels / tDec / 1e6
    combined = pixels / (tEnc + tDec) / 1e6

    print(json.dumps({
        "metric": "qp2 768x512x10 round-trip (encode+decode incl. rANS) per chip",
        "value": round(combined, 3),
        "unit": "Mpps",
        "vs_baseline": round(combined / BASELINE_COMBINED, 3),
        "detail": {"encodeMpps": round(encMpps, 3), "decodeMpps": round(decMpps, 3),
                   "refEncodeMpps": 25.45, "refDecodeMpps": 22.03},
    }))


if __name__ == "__main__":
    main()
