"""Probe whether Mosaic/Pallas kernels compile on the current attach path.

Round-1 finding (NOTES.md): Pallas kernels never finished compiling through
the axon remote-compile service (>10 min vs seconds for plain XLA). This
probe compiles the smallest possible kernel with a wall-clock report so each
round can cheaply re-check whether the path healed.

Run ON TPU. Prints one JSON line; exits 0 on success.
"""
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def kernel(xRef, oRef):
    oRef[...] = xRef[...] * 2.0 + 1.0


def main():
    x = jnp.ones((256, 256), jnp.float32)
    t0 = time.perf_counter()
    fn = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))
    y = jax.jit(fn)(x)
    jax.block_until_ready(y)
    compileS = time.perf_counter() - t0
    ok = bool(jnp.allclose(y, x * 2 + 1))
    print(json.dumps({"pallasCompiles": ok, "wallS": round(compileS, 1),
                      "backend": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
