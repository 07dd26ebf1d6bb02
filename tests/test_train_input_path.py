"""The training input boundary: REAL loader output (uint8) must reach the
jitted step and trigger the device-side augmentation + normalization branch
in BOTH stages (reference GPU transform at trainer.py:266 /
genTrainer.py:260 + data/transforms.py:37-43).

Round-1 regression: `Trainer.trainStep` cast every batch to float32 before
the jitted step, so real uint8 loader batches bypassed augmentation and the
model received raw 0-255 floats. Every other test feeds pre-normalized
floats, which is why the suite could not see it.
"""
import numpy as np
import pytest
from PIL import Image

import mcquic_tpu.data.augment as augment
from mcquic_tpu.config import Config
from mcquic_tpu.models.compressor import Compressor
from mcquic_tpu.train.trainer import Trainer


def _writeImages(folder, n=10, size=80, seed=0):
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        Image.fromarray(rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
                        ).save(folder / f"{i:04d}.png")


def _stage1Config(tmp):
    return Config.deserialize({
        "model": {"key": "Compressor", "params": {"channel": 8, "m": 1, "k": [16]}},
        "train": {
            "totalStep": 2, "batchSize": 1, "epoch": 100, "valFreq": 20,
            "trainSet": "unused", "valSet": "unused",
            "saveDir": str(tmp / "saved"), "target": "PSNR",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "Placeholder", "params": {}},
            "gpu": {"gpus": 8},
        },
    })


def test_training_transform_normalizes_and_augments():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    out = augment.trainingTransform(jax.random.PRNGKey(0), jnp.asarray(batch))
    out = np.asarray(out)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    # augmented: with planckian p=1.0 the output differs from plain
    # normalization (unless the drawn illuminant is the identity, which has
    # probability 0 over the 48-entry table for this key)
    plain = (batch.astype(np.float32) / 255.0 - 0.5) / 0.5
    assert not np.allclose(out, plain)


def test_stage1_real_loader_batch_hits_augmentation(tmp_path, monkeypatch):
    """Drive trainer.train() with the REAL loader (uint8 PNG folder) and
    assert the jitted step traces the augmentation branch on uint8 input."""
    from mcquic_tpu.data import getTrainLoader

    _writeImages(tmp_path / "imgs")
    seen = {}
    orig = augment.trainingTransform

    def probe(key, batch, gen=False):
        # called at trace time inside the jitted step
        seen["dtype"] = batch.dtype
        seen["gen"] = gen
        return orig(key, batch, gen=gen)

    monkeypatch.setattr(augment, "trainingTransform", probe)

    cfg = _stage1Config(tmp_path)
    module = Compressor(channel=8, m=1, k=(16,))
    tr = Trainer(cfg, module=module, inputShape=(32, 32))
    loaderFn = getTrainLoader(str(tmp_path / "imgs"), 8, cropSize=32)
    batch = next(iter(loaderFn()))
    assert batch.dtype == np.uint8, "loader must yield raw uint8"
    m = tr.trainStep(batch)
    assert np.isfinite(float(m["loss"]))
    assert seen.get("dtype") == np.uint8
    assert seen.get("gen") is False


def test_stage2_real_loader_batch_hits_gen_transform(tmp_path, monkeypatch):
    from mcquic_tpu.data.imagenet_classes import getGenLoader
    from mcquic_tpu.train.genTrainer import GenTrainer

    for wnid in ("n01440764", "n01443537"):
        _writeImages(tmp_path / "data" / wnid, n=5, size=70)

    seen = {}
    orig = augment.trainingTransform

    def probe(key, batch, gen=False):
        seen["dtype"] = batch.dtype
        seen["gen"] = gen
        return orig(key, batch, gen=gen)

    monkeypatch.setattr(augment, "trainingTransform", probe)

    cfg = Config.deserialize({
        "model": {"key": "GeneratorV3SelfAttention",
                  "params": {"channel": 8, "k": 16, "size": [2, 1, 1],
                             "hiddenSize": 32, "depth": 1, "nHeads": 4,
                             "numClasses": 10}},
        "train": {
            "totalStep": 1, "batchSize": 1, "epoch": 1, "valFreq": 10,
            "trainSet": "unused", "valSet": "unused",
            "saveDir": str(tmp_path / "gsaved"), "target": "MsSSIM",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "Placeholder", "params": {}},
            "gpu": {"gpus": 8},
        },
    })
    trainer = GenTrainer(cfg, imageSize=32)
    loaderFn = getGenLoader(str(tmp_path / "data"), 8, cropSize=32)
    images, labels = next(iter(loaderFn()))
    assert images.dtype == np.uint8
    m = trainer.trainStep(images, labels)
    assert np.isfinite(float(m["loss"]))
    assert seen.get("dtype") == np.uint8
    assert seen.get("gen") is True


@pytest.mark.slow
def test_stage1_uint8_loss_decreases(tmp_path):
    """e2e: loss decreases when training from REAL uint8 batches."""
    cfg = _stage1Config(tmp_path)
    module = Compressor(channel=8, m=1, k=(16,))
    tr = Trainer(cfg, module=module, inputShape=(32, 32))
    rng = np.random.default_rng(1)
    # a fixed, structured batch (gradient signal) as raw uint8
    base = np.linspace(0, 255, 32, dtype=np.float32)
    img = np.broadcast_to(base[None, :, None], (32, 32, 3)).astype(np.uint8)
    batch = np.stack([img] * 8) + rng.integers(0, 8, (8, 32, 32, 3), dtype=np.uint8)
    losses = [float(tr.trainStep(batch)["loss"]) for _ in range(30)]
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
