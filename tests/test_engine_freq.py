"""Integration: trained frequency tables flow into the rANS CDFs.

Covers the reference loop: training updates freqEMA via the entropy coder
(entropyCoder.py:306-322) -> CDFs lazily rebuilt (entropyCoder.py:50-63) ->
compress uses the learned tables, shrinking skewed-code streams.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mcquic_tpu.models.compressor import Compressor
from mcquic_tpu.models.engine import CompressorEngine


@pytest.mark.slow
def test_freq_ema_improves_compression():
    module = Compressor(channel=8, m=1, k=(16,))
    x0 = jnp.zeros((2, 128, 128, 3))
    rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}
    variables = module.init(rngs, x0, train=True)

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)

    engine = CompressorEngine(module, variables, qp="0", base=128)
    codes, binariesUniform, headers = engine.compress(img)
    sizeUniform = sum(len(b) for b in binariesUniform[0])

    # run several "training" forwards on the same image so freqEMA sharpens
    # around the codes this image uses
    coder = variables["coder"]
    for i in range(30):
        (_, _, _, _), mut = module.apply(
            {"params": variables["params"], "coder": coder},
            jnp.asarray(img), train=True,
            rngs={"gumbel": jax.random.PRNGKey(2 + i)}, mutable=["coder"])
        coder = mut["coder"]

    engine.updateVariables({"params": variables["params"], "coder": coder})
    codes2, binariesTrained, _ = engine.compress(img)
    np.testing.assert_array_equal(codes[0], codes2[0])  # same params -> same codes
    sizeTrained = sum(len(b) for b in binariesTrained[0])
    assert sizeTrained < sizeUniform, (sizeTrained, sizeUniform)


def test_engine_refresh_freq_resets_cdfs():
    module = Compressor(channel=8, m=1, k=(16,))
    x0 = jnp.zeros((1, 32, 32, 3))
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x0, train=False)
    engine = CompressorEngine(module, variables, qp="0", base=32)
    cdfs1 = engine.coder.CDFs
    # perturb freq and refresh
    newCoder = jax.tree_util.tree_map(
        lambda f: np.asarray(f) * np.linspace(0.5, 2.0, f.shape[-1]),
        jax.device_get(variables["coder"]))
    engine.updateVariables({"params": variables["params"], "coder": newCoder})
    cdfs2 = engine.coder.CDFs
    assert cdfs1 != cdfs2


def test_find_freq_emas_many_levels_ordering():
    """17-level UMGM naming: freqEMA10 must not sort before freqEMA2."""
    from mcquic_tpu.models.engine import _findFreqEMAs
    state = {"_quantizer": {f"freqEMA{i}": np.full((1, 4), i, np.float32)
                            for i in range(17)}}
    freqs = _findFreqEMAs(state)
    assert len(freqs) == 17
    for i, f in enumerate(freqs):
        assert float(f[0, 0]) == i


def test_metrics_logger_degrades_without_wandb():
    from mcquic_tpu.train.logging import EMATracker, MetricsLogger
    logger = MetricsLogger(project="test", enabled=True)  # wandb missing -> stdlib
    logger.log(1, {"loss": 1.0})
    logger.log(2, {"loss": 0.5})
    logger.finish()
    ema = EMATracker(0.5)
    assert ema.step(1.0) == 1.0
    assert ema.step(0.0) == 0.5
