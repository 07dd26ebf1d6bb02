"""Hook phase dispatch, epoch cap, and validation observability wiring
(reference hooks.py phase ABCs :74-97; wandb logging trainer.py:463-493)."""
import numpy as np
import pytest

# heavyweight integration module: runs in the CI slow tier
pytestmark = pytest.mark.slow

from mcquic_tpu.config import Config
from mcquic_tpu.models.compressor import Compressor
from mcquic_tpu.train.hooks import HookType
from mcquic_tpu.train.trainer import Trainer
from mcquic_tpu.utils.registry import HookRegistry


def _cfg(tmpPath, totalStep=6, epoch=1, valFreq=3, hooks=None):
    return Config.deserialize({
        "model": {"key": "Compressor", "params": {"channel": 8, "m": 2, "k": [16, 8]}},
        "train": {
            "totalStep": totalStep, "batchSize": 1, "epoch": epoch,
            "valFreq": valFreq, "trainSet": "unused", "valSet": "unused",
            "saveDir": str(tmpPath / "saved"), "target": "PSNR",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "Placeholder", "params": {}},
            "gpu": {"gpus": 8},
            **({"hooks": hooks} if hooks else {}),
        },
    })


class _Recorder:
    """Fake MetricsLogger recording calls."""

    def __init__(self):
        self.scalars, self.histograms, self.imageLogs = [], [], []

    def log(self, step, metrics):
        self.scalars.append((step, dict(metrics)))

    def histogram(self, step, name, values):
        self.histograms.append((step, name, np.asarray(values).shape))

    def images(self, step, name, images):
        self.imageLogs.append((step, name, len(images)))


@HookRegistry.register
class _PhaseProbe:
    """Counts invocations per phase through fresh class instances."""

    calls = {}
    hookType = HookType.EpochStartHook

    def __init__(self):
        _PhaseProbe.calls = {t: 0 for t in HookType}

    def __call__(self, trainer, step):
        _PhaseProbe.calls[self.hookType] += 1


def _loaderFn(batches=3, hw=32):
    rng = np.random.default_rng(0)
    data = [rng.uniform(-1, 1, (8, hw, hw, 3)).astype(np.float32)
            for _ in range(batches)]

    def fn():
        yield from data

    return fn


def _valLoaderFn(hw=64):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (1, hw, hw, 3), dtype=np.uint8)

    def fn():
        yield img, "val0"

    return fn


def test_epoch_start_hook_runs_per_epoch_not_per_step(tmp_path):
    cfg = _cfg(tmp_path, totalStep=6, epoch=2,
               hooks=[{"key": "_PhaseProbe", "params": {}}])
    trainer = Trainer(cfg, module=Compressor(channel=8, m=2, k=(16, 8)),
                      lpipsFn=False, inputShape=(32, 32))
    trainer.train(_loaderFn(batches=3), onStep=lambda s, m: None)
    # 6 steps over 2 epochs of 3 batches -> the epochStart hook fired twice
    assert _PhaseProbe.calls[HookType.EpochStartHook] == 2
    assert int(trainer.state.step) == 6


def test_epoch_caps_training(tmp_path):
    """`epoch` bounds loader passes even below totalStep (the key now does
    what it says instead of being silently ignored)."""
    cfg = _cfg(tmp_path, totalStep=100, epoch=2)
    trainer = Trainer(cfg, module=Compressor(channel=8, m=2, k=(16, 8)),
                      lpipsFn=False, inputShape=(32, 32))
    trainer.train(_loaderFn(batches=2), onStep=lambda s, m: None)
    assert int(trainer.state.step) == 4  # 2 epochs x 2 batches


def test_validation_observability_logged(tmp_path):
    """At ValFreq the metrics logger receives freq histograms, code maps and
    raw/restored image pairs (reference trainer.py:463-493)."""
    cfg = _cfg(tmp_path, totalStep=3, epoch=1, valFreq=3)
    trainer = Trainer(cfg, module=Compressor(channel=8, m=2, k=(16, 8)),
                      lpipsFn=False, inputShape=(32, 32))
    rec = _Recorder()
    trainer.train(_loaderFn(batches=3), valLoader=_valLoaderFn(),
                  metricsLogger=rec)
    assert any(name.startswith("freq/") for _, name, _ in rec.histograms)
    names = {name for _, name, _ in rec.imageLogs}
    assert {"val/codeMaps", "val/raw", "val/restored"} <= names
    counts = {name: n for _, name, n in rec.imageLogs}
    assert counts["val/raw"] == counts["val/restored"] == 1


def test_validator_collects_extras(tmp_path):
    from mcquic_tpu.models.engine import CompressorEngine
    from mcquic_tpu.validate.validator import Validator
    import jax

    module = Compressor(channel=8, m=2, k=(16, 8))
    import jax.numpy as jnp
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)},
                            jnp.zeros((1, 64, 64, 3)), train=False)
    engine = CompressorEngine(module, {"params": variables["params"],
                                       "coder": variables["coder"]}, qp="t")
    validator = Validator(engine)
    results = validator.validate(_valLoaderFn())
    for key in ("msssim", "psnr", "bpp", "idealBpp"):
        assert np.isfinite(results[key]), key
    assert len(validator.collected["pairs"]) == 1
    assert validator.collected["codes"] is not None
