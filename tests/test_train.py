"""Trainer + multi-device SPMD tests on the 8-device virtual CPU mesh."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# heavyweight integration module: runs in the CI slow tier
pytestmark = pytest.mark.slow

from mcquic_tpu.config import Config
from mcquic_tpu.models.compressor import Compressor
from mcquic_tpu.train.trainer import Trainer

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _tinyConfig(tmpPath, hooks=True):
    return Config.deserialize({
        "model": {"key": "Compressor", "params": {"channel": 8, "m": 2, "k": [16, 8]}},
        "train": {
            "totalStep": 4, "batchSize": 1, "epoch": 1, "valFreq": 20,
            "trainSet": "unused", "valSet": "unused", "saveDir": str(tmpPath / "saved"),
            "target": "PSNR",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "CosineAnnealingWarmupRestarts",
                      "params": {"first_cycle_steps": 100, "warmup_steps": 5}},
            "gpu": {"gpus": 8},
            **({"hooks": [{"key": "CodebookReassign", "params": {"freq": 2}}]} if hooks else {}),
        },
    })


def test_devices_available():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train")
    cfg = _tinyConfig(tmp)
    module = Compressor(channel=8, m=2, k=(16, 8))
    return Trainer(cfg, module=module, inputShape=(32, 32)), tmp


def test_train_steps_and_metrics(trainer):
    tr, _ = trainer
    rng = np.random.default_rng(0)
    batch = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
    m1 = tr.trainStep(batch)
    m2 = tr.trainStep(batch)
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["gradNorm"]) > 0
    assert int(tr.state.step) == 2


def test_codebook_reassign_and_usage(trainer):
    tr, _ = trainer
    prop = tr.reassignCodebooks()
    assert 0.0 <= prop <= 1.0
    usage = tr.codeUsage()
    assert 0.0 < usage <= 1.0


def test_save_and_resume(trainer):
    tr, tmp = trainer
    stepBefore = int(tr.state.step)
    tr.save()
    tr.close()  # Saver refuses a second live in-process holder
    cfg = _tinyConfig(tmp)
    module = Compressor(channel=8, m=2, k=(16, 8))
    tr2 = Trainer(cfg, module=module, inputShape=(32, 32))
    assert tr2.tryResume()
    assert int(tr2.state.step) == stepBefore
    # params identical after resume
    p1 = jax.device_get(tr.state.params)
    p2 = jax.device_get(tr2.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b)


def test_dryrun_multichip_8():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_orbax_saver_roundtrip(tmp_path):
    import jax.numpy as jnp

    from mcquic_tpu.train.orbax_saver import OrbaxSaver

    tree = {"a": jnp.arange(8, dtype=jnp.float32), "b": {"c": jnp.ones((2, 3))}}
    saver = OrbaxSaver(str(tmp_path), maxItems=2)
    saver.save(1, jax.device_get(tree))
    saver.save(2, jax.device_get(jax.tree_util.tree_map(lambda x: x * 2, tree)))
    saver.waitUntilFinished()
    assert saver.latestStep() == 2
    restored = saver.restore(tree)
    np.testing.assert_allclose(restored["a"], np.arange(8) * 2)
    np.testing.assert_allclose(restored["b"]["c"], np.ones((2, 3)) * 2)
    saver.close()


def test_trainer_orbax_backend_save_resume(tmp_path):
    """MCQUIC_CKPT_BACKEND=orbax: async sharded checkpoints + resume into the
    existing shardings (multi-host path; replaces OSS consolidate+rank0-save,
    reference trainer.py:112-117)."""
    cfg = _tinyConfig(tmp_path, hooks=False)
    module = Compressor(channel=8, m=2, k=(16, 8))
    tr = Trainer(cfg, module=module, lpipsFn=False, inputShape=(32, 32),
                 ckptBackend="orbax")
    rng = np.random.default_rng(0)
    batch = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
    tr.trainStep(batch)
    tr.trainStep(batch)
    tr.save()
    tr._orbax.waitUntilFinished()
    tr.close()  # Saver refuses a second live in-process holder

    tr2 = Trainer(cfg, module=module, lpipsFn=False, inputShape=(32, 32),
                  ckptBackend="orbax")
    assert tr2.tryResume()
    assert int(tr2.state.step) == 2
    a = jax.tree_util.tree_leaves(tr.state.params)[0]
    b = jax.tree_util.tree_leaves(tr2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_input_shape_derived_from_model_geometry(tmp_path):
    """Neon-family tokenizers train on size[0]*16 crops (reference
    configs/a800_8.yaml: 17-level size[0]=16 -> 256^2); v1 keeps 512^2.
    The CLI loader cropSize follows trainer.inputSize."""
    from mcquic_tpu.models.compressor import Neon
    cfg = _tinyConfig(tmp_path)
    neon = Neon(channel=8, k=16, size=(2, 1, 1))
    tr = Trainer(cfg, module=neon, lpipsFn=False)
    assert tr.inputSize == 32
    tr.close()  # Saver refuses a second live in-process holder
    trV1 = Trainer(cfg, module=Compressor(channel=8, m=2, k=(16, 8)),
                   lpipsFn=False, inputShape=(32, 32))
    assert trV1.inputSize == 32
