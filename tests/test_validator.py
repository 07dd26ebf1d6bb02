"""Validator end-to-end on synthetic images + trainer validate wiring."""
import numpy as np
import pytest


def test_validator_on_synthetic_folder(tmp_path):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from mcquic_tpu.data import getValLoader
    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.models.engine import CompressorEngine
    from mcquic_tpu.validate.validator import Validator

    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / f"im{i}.png")

    module = Compressor(channel=8, m=1, k=(16,))
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x, train=False)
    engine = CompressorEngine(module, variables, qp="0", base=64)
    validator = Validator(engine)
    results = validator.validate(getValLoader(str(tmp_path), base=64))
    assert results["images"] == 2
    assert np.isfinite(results["psnr"])
    assert 0 <= results["msssim"] <= 1
    assert results["bpp"] > 0
    assert results["idealBpp"] > 0
    # ideal bound must not exceed the actual rANS bpp by much (rANS overhead
    # is small); actual >= ideal - tolerance
    assert results["bpp"] >= results["idealBpp"] * 0.7


def test_trainer_validate_path(tmp_path):
    """Trainer.validate wires current weights into a real-coder eval."""
    import numpy as np
    from PIL import Image

    from mcquic_tpu.config import Config
    from mcquic_tpu.data import getValLoader
    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.train.trainer import Trainer

    rng = np.random.default_rng(1)
    valDir = tmp_path / "val"
    valDir.mkdir()
    Image.fromarray(rng.integers(0, 256, (70, 70, 3), dtype=np.uint8)).save(valDir / "a.png")

    cfg = Config.deserialize({
        "model": {"key": "Compressor", "params": {"channel": 8, "m": 1, "k": [16]}},
        "train": {
            "totalStep": 1, "batchSize": 1, "epoch": 1, "valFreq": 1,
            "trainSet": "x", "valSet": str(valDir), "saveDir": str(tmp_path / "s"),
            "target": "PSNR",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "Placeholder", "params": {}},
            "gpu": {"gpus": 8},
        }})
    trainer = Trainer(cfg, module=Compressor(channel=8, m=1, k=(16,)),
                      inputShape=(32, 32))
    results = trainer.validate(getValLoader(str(valDir), base=64))
    assert results["images"] == 1
    assert np.isfinite(results["psnr"]) and results["bpp"] > 0


def test_inception_score_handler_with_fake_classifier():
    from mcquic_tpu.validate.inception import InceptionScoreHandler

    rng = np.random.default_rng(0)

    def fakeClassifier(imgs):
        # deterministic peaked logits per image -> high IS
        n = imgs.shape[0]
        logits = np.full((n, 1000), -5.0)
        for i in range(n):
            logits[i, i % 1000] = 10.0
        return logits

    handler = InceptionScoreHandler(classifierFn=fakeClassifier, splits=2)
    imgs = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    handler(restored=imgs)
    score = handler.result()
    assert score > 1.5  # diverse peaked predictions -> IS well above 1

    gated = InceptionScoreHandler()
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        gated(restored=imgs)
