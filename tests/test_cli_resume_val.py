"""CLI auto-resume + in-training validation (reference train/cli.py:31-39 +
trainer.py:355-362, 519-529).

Round-1 regression: the CLI probed `latest/saved.ckpt.npz` AFTER the Saver
had rotated `latest/` away, so auto-resume never fired and a preempted run
restarted from step 0. And the config's valSet was parsed and discarded, so
validation never ran in the product path.
"""
import numpy as np
import pytest
import yaml
from PIL import Image


def _writeImages(folder, n=10, size=80, seed=0):
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        Image.fromarray(rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
                        ).save(folder / f"{i:04d}.png")


def _cfg(tmp_path, totalStep, valFreq=100):
    return {
        "model": {"key": "Compressor", "params": {"channel": 8, "m": 1, "k": [16]}},
        "train": {
            "totalStep": totalStep, "batchSize": 1, "epoch": 100, "valFreq": valFreq,
            "trainSet": str(tmp_path / "imgs"), "valSet": str(tmp_path / "val"),
            "saveDir": str(tmp_path / "saved"), "target": "PSNR",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "Placeholder", "params": {}},
            "gpu": {"gpus": 8},
        },
    }


def _writeCfg(tmp_path, cfg):
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.dump(cfg))
    return p


@pytest.mark.slow
def test_cli_auto_resume_continues_from_saved_step(tmp_path, monkeypatch):
    import mcquic_tpu.train.cli as trainCli
    from mcquic_tpu.data import getTrainLoader
    from mcquic_tpu.train.trainer import Trainer

    _writeImages(tmp_path / "imgs")
    # small crops so the tiny model trains fast
    monkeypatch.setattr(trainCli, "getTrainLoader",
                        lambda p, b, cropSize=512, **kw: getTrainLoader(p, b, cropSize=32, **kw))

    # run 1: train 2 steps, save, "preempt"
    cfgPath = _writeCfg(tmp_path, _cfg(tmp_path, totalStep=2))
    tr1 = trainCli.main(cfgPath)
    assert int(tr1.state.step) == 2
    assert (tmp_path / "saved" / "latest" / "saved.ckpt.npz").exists()

    # run 2: raise the horizon to 3; must RESUME at 2 and do exactly 1 step
    calls = []
    origStep = Trainer.trainStep

    def counted(self, batch):
        calls.append(1)
        return origStep(self, batch)

    monkeypatch.setattr(Trainer, "trainStep", counted)
    cfgPath = _writeCfg(tmp_path, _cfg(tmp_path, totalStep=3))
    tr2 = trainCli.main(cfgPath)
    assert int(tr2.state.step) == 3
    assert len(calls) == 1, f"resume failed: ran {len(calls)} steps instead of 1"


@pytest.mark.slow
def test_cli_runs_validation_and_saves_best(tmp_path, monkeypatch):
    import mcquic_tpu.train.cli as trainCli
    from mcquic_tpu.data import getTrainLoader

    _writeImages(tmp_path / "imgs")
    # val images must be >= the 256px aligned crop (smaller ones are skipped)
    _writeImages(tmp_path / "val", n=2, size=256, seed=7)
    monkeypatch.setattr(trainCli, "getTrainLoader",
                        lambda p, b, cropSize=512, **kw: getTrainLoader(p, b, cropSize=32, **kw))

    valCalls = []
    from mcquic_tpu.train.trainer import Trainer
    origValidate = Trainer.validate

    def spyValidate(self, valLoader):
        results = origValidate(self, valLoader)
        valCalls.append(results)
        return results

    monkeypatch.setattr(Trainer, "validate", spyValidate)
    cfgPath = _writeCfg(tmp_path, _cfg(tmp_path, totalStep=2, valFreq=2))
    trainCli.main(cfgPath)
    assert len(valCalls) == 1, "valSet was parsed but validation never ran"
    results = valCalls[0]
    assert {"msssim", "psnr", "bpp"} <= set(results)
    assert all(np.isfinite(v) for v in results.values())
    assert (tmp_path / "saved" / "latest" / "best.ckpt.npz").exists()
