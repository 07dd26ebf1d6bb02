"""LPIPS: bundled lin heads, backbone assembly, trainer wiring.

The reference bundles the five learned 1x1 heads (loss/lpips_vgg.pth) and
relies on torchvision's pretrained VGG16 for the backbone (reference
loss/lpips.py:13-56); the objective weights the term 2x (trainer.py:276).
"""
import os

import numpy as np
import pytest

from mcquic_tpu.loss import lpips as L

REF_PTH = "/root/reference/mcquic/loss/lpips_vgg.pth"

# torchvision vgg16 `features.` conv layer indices, in order
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG16_SHAPES = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
                 (256, 256), (256, 256), (512, 256), (512, 512), (512, 512),
                 (512, 512), (512, 512), (512, 512)]


def _syntheticVggSd(rng):
    sd = {}
    for idx, (cOut, cIn) in zip(_VGG16_CONV_IDX, _VGG16_SHAPES):
        sd[f"features.{idx}.weight"] = rng.normal(
            0, 0.05, (cOut, cIn, 3, 3)).astype(np.float32)
        sd[f"features.{idx}.bias"] = np.zeros(cOut, np.float32)
    return sd


def test_bundled_lin_heads_match_reference_pth():
    if not os.path.exists(REF_PTH):
        pytest.skip("reference lpips_vgg.pth unavailable")
    bundled = L.loadBundledLinHeads()
    fresh = L.convertTorchLpips(REF_PTH)
    assert sorted(bundled) == [f"lin{i}" for i in range(5)]
    for name in bundled:
        np.testing.assert_array_equal(bundled[name]["kernel"],
                                      fresh[name]["kernel"], err_msg=name)
        assert bundled[name]["kernel"].shape[:2] == (1, 1)
        assert (bundled[name]["kernel"] >= 0).all()  # reference heads are non-neg


def test_default_lpips_none_without_backbone(monkeypatch, tmp_path):
    monkeypatch.delenv("MCQUIC_VGG16_WEIGHTS", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))  # empty cache dir
    L._warnedOnce = False
    assert L.makeDefaultLpipsFn() is None
    assert L._warnedOnce  # the loud banner fired


def test_proxy_lpips_opt_in(monkeypatch, tmp_path):
    """MCQUIC_LPIPS_PROXY=1 fills the perceptual slot with the seeded
    random-feature proxy when no backbone exists: deterministic, zero on
    identical inputs, positive on distinct (Amir & Weiss 2021 rationale in
    makeProxyLpipsFn)."""
    monkeypatch.delenv("MCQUIC_VGG16_WEIGHTS", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))  # empty cache dir
    monkeypatch.setenv("MCQUIC_LPIPS_PROXY", "1")
    fn = L.makeDefaultLpipsFn()
    assert fn is not None
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.3, x.shape).astype(np.float32), -1, 1)
    same = float(fn(x, x))
    diff1 = float(fn(x, y))
    diff2 = float(L.makeProxyLpipsFn()(x, y))  # same seed -> same distance
    assert abs(same) < 1e-6
    assert diff1 > 0 and np.isfinite(diff1)
    np.testing.assert_allclose(diff1, diff2, rtol=1e-5)


def test_default_lpips_proxy_not_active_without_env(monkeypatch, tmp_path):
    monkeypatch.delenv("MCQUIC_VGG16_WEIGHTS", raising=False)
    monkeypatch.delenv("MCQUIC_LPIPS_PROXY", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    assert L.makeDefaultLpipsFn() is None


@pytest.mark.slow
def test_lpips_fn_full_pipeline_with_backbone(monkeypatch, tmp_path):
    """Synthetic VGG16 backbone via MCQUIC_VGG16_WEIGHTS -> working fn with
    the bundled heads: zero on identical inputs, positive on distinct."""
    import torch

    sd = {k: torch.from_numpy(v) for k, v in
          _syntheticVggSd(np.random.default_rng(0)).items()}
    path = tmp_path / "vgg16.pth"
    torch.save(sd, str(path))
    monkeypatch.setenv("MCQUIC_VGG16_WEIGHTS", str(path))
    fn = L.makeDefaultLpipsFn()
    assert fn is not None
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.2, x.shape).astype(np.float32), -1, 1)
    same = float(fn(x, x))
    diff = float(fn(x, y))
    assert abs(same) < 1e-6
    assert diff > 0 and np.isfinite(diff)


@pytest.mark.slow
def test_trainer_auto_wires_lpips(monkeypatch, tmp_path):
    """Trainer.__init__ assembles the lpips term when weights are present;
    the step's `lpips` metric is then nonzero (reference compound.py:35-42)."""
    import torch

    from mcquic_tpu.config import Config
    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.train.trainer import Trainer

    sd = {k: torch.from_numpy(v) for k, v in
          _syntheticVggSd(np.random.default_rng(0)).items()}
    path = tmp_path / "vgg16.pth"
    torch.save(sd, str(path))
    monkeypatch.setenv("MCQUIC_VGG16_WEIGHTS", str(path))

    cfg = Config.deserialize({
        "model": {"key": "Compressor", "params": {"channel": 8, "m": 2, "k": [16, 8]}},
        "train": {
            "totalStep": 2, "batchSize": 1, "epoch": 1, "valFreq": 20,
            "trainSet": "unused", "valSet": "unused",
            "saveDir": str(tmp_path / "saved"), "target": "PSNR",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "CosineAnnealingWarmupRestarts",
                      "params": {"first_cycle_steps": 100, "warmup_steps": 5}},
            "gpu": {"gpus": 8},
        },
    })
    trainer = Trainer(cfg, module=Compressor(channel=8, m=2, k=(16, 8)),
                      inputShape=(32, 32))
    batch = np.random.default_rng(2).uniform(
        -1, 1, (8, 32, 32, 3)).astype(np.float32)
    metrics = trainer.trainStep(batch)
    assert float(metrics["lpips"]) > 0
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_trainer_explicit_opt_out(tmp_path):
    """lpipsFn=False skips both auto-assembly and the warning path."""
    from mcquic_tpu.config import Config
    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.train.trainer import Trainer

    cfg = Config.deserialize({
        "model": {"key": "Compressor", "params": {"channel": 8, "m": 2, "k": [16, 8]}},
        "train": {
            "totalStep": 2, "batchSize": 1, "epoch": 1, "valFreq": 20,
            "trainSet": "unused", "valSet": "unused",
            "saveDir": str(tmp_path / "saved"), "target": "PSNR",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "CosineAnnealingWarmupRestarts",
                      "params": {"first_cycle_steps": 100, "warmup_steps": 5}},
            "gpu": {"gpus": 8},
        },
    })
    trainer = Trainer(cfg, module=Compressor(channel=8, m=2, k=(16, 8)),
                      lpipsFn=False, inputShape=(32, 32))
    batch = np.random.default_rng(2).uniform(
        -1, 1, (8, 32, 32, 3)).astype(np.float32)
    metrics = trainer.trainStep(batch)
    assert float(metrics["lpips"]) == 0.0
