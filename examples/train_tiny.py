"""Train a small Compressor from scratch on synthetic data (BASELINE config 4
smoke: single-host training with in-graph VQ + EMA updates on TPU).

Usage: python examples/train_tiny.py [steps] [--tpu]
Prints step metrics; asserts the loss decreased by the end.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(steps: int = 100):
    import jax
    import jax.numpy as jnp
    import optax

    from mcquic_tpu.loss import MsSSIM
    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.train.state import TrainState, codeUsage, makeTrainStep

    module = Compressor(channel=32, m=1, k=(1024, 512), dtype=jnp.bfloat16)
    tx = optax.adam(1e-4)
    stepFn = makeTrainStep(module, tx, MsSSIM())

    batch, size = 4, 256
    x0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x0, train=True)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(2))
    jitStep = jax.jit(stepFn, donate_argnums=(0,))

    # synthetic "images": smooth random fields (compressible structure)
    rng = np.random.default_rng(0)

    def makeBatch():
        base = rng.normal(size=(batch, size // 8, size // 8, 3)).astype(np.float32)
        up = np.repeat(np.repeat(base, 8, 1), 8, 2)
        noise = 0.1 * rng.normal(size=(batch, size, size, 3)).astype(np.float32)
        return np.clip(up * 0.3 + noise, -1, 1)

    first = None
    t0 = time.time()
    for step in range(1, steps + 1):
        state, metrics = jitStep(state, jnp.asarray(makeBatch()))
        if step == 1 or step % 10 == 0:
            loss = float(metrics["loss"])
            if first is None:
                first = loss
            print(f"step {step:4d}  loss {loss:.4f}  distortion {float(metrics['distortion']):.4f}"
                  f"  gradNorm {float(metrics['gradNorm']):.3f}"
                  f"  ({(time.time() - t0) / step:.2f}s/step)", flush=True)
    last = float(metrics["loss"])
    usage = float(codeUsage(jax.device_get(state)))
    print(f"first loss {first:.4f} -> last loss {last:.4f}; codeUsage {usage:.3f}")
    assert last < first, "loss did not decrease"
    print("OK")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    main(n)
