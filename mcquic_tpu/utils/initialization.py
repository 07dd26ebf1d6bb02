"""Fast host-side parameter materialization.

`module.init` traces AND compiles the full forward just to produce initial
params — over a remote-TPU tunnel that is minutes of latency. `fastInit`
instead runs `jax.eval_shape` (trace only, no compile) and materializes every
leaf host-side with numpy. Distributions are approximate (trunc-normal-ish
scaled by fan-in); use real `module.init` when exact init statistics matter
(training), and `fastInit` for benchmarks / compile checks / shape probing.
"""
from functools import partial

import jax
import numpy as np


def fastInit(module, rngs, *args, seed: int = 0, scale: float = 0.02, **kwargs):
    """Shape-faithful random variables for `module` without compiling."""
    shapes = jax.eval_shape(partial(module.init, **kwargs), rngs, *args)
    rng = np.random.default_rng(seed)

    def materialize(path, sd):
        names = [getattr(p, "key", "") for p in path]
        if any("freqEMA" in str(n) for n in names):
            # frequency tables must be valid pmfs: uniform 1/k
            k = sd.shape[-1]
            return np.full(sd.shape, 1.0 / k, np.dtype(sd.dtype))
        if any("temperature" in str(n) for n in names):
            return np.ones(sd.shape, np.dtype(sd.dtype))
        if np.issubdtype(sd.dtype, np.floating):
            fanIn = sd.shape[-2] if len(sd.shape) >= 2 else max(sd.shape[-1] if sd.shape else 1, 1)
            std = min(scale, (2.0 / (5.0 * max(fanIn, 1))) ** 0.5)
            return rng.standard_normal(sd.shape).astype(np.dtype(sd.dtype)) * np.dtype(sd.dtype).type(std)
        return np.zeros(sd.shape, sd.dtype)

    return jax.tree_util.tree_map_with_path(materialize, shapes)
