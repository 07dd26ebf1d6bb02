"""Config system + .mcq container tests."""
import numpy as np
import pytest

import mcquic_tpu
from mcquic_tpu.config import Config, General
from mcquic_tpu.container import CodeSize, File, FileHeader, ImageSize


def _cfgDict():
    return {
        "model": {"key": "Compressor", "params": {"channel": 32, "m": 2, "k": [16, 8]}},
        "train": {
            "totalStep": 100, "batchSize": 4, "epoch": 1, "valFreq": 10,
            "trainSet": "x", "valSet": "y", "saveDir": "z", "target": "MsSSIM",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "Placeholder", "params": {}},
            "gpu": {"gpus": 8},
        },
    }


def test_config_roundtrip():
    cfg = Config.deserialize(_cfgDict())
    assert cfg.Model.Key == "Compressor"
    assert cfg.Train.BatchSize == 4
    again = Config.deserialize(cfg.serialize())
    assert again.serialize() == cfg.serialize()


def test_config_rejects_unknown_keys():
    d = _cfgDict()
    d["train"]["bogus"] = 1
    with pytest.raises(KeyError):
        Config.deserialize(d)


def test_config_strips_dollar_keys():
    d = _cfgDict()
    d["$schema"] = "whatever"
    cfg = Config.deserialize(d)
    assert cfg.Model.Key == "Compressor"


def test_lr_world_scaling():
    """reference config.py:144-153: lr /= 2**(3 - log2(globalBatch)/2)."""
    cfg = Config.deserialize(_cfgDict())
    scaled = cfg.Train.scaledOptim(worldSize=16)  # globalBatch 64 -> exponent 6
    # scale = 3 - 3 = 0 -> lr unchanged
    assert scaled.Params["lr"] == pytest.approx(1e-4)
    scaled = cfg.Train.scaledOptim(worldSize=4)   # globalBatch 16 -> scale = 1
    assert scaled.Params["lr"] == pytest.approx(1e-4 / 2)


def test_file_container_roundtrip():
    header = FileHeader(mcquic_tpu.__version__, "2",
                        CodeSize([2, 2], [4, 2], [4, 2], [16, 8]),
                        ImageSize(height=50, width=70, channel=3))
    contents = [b"\x01\x02\x03", b"\xff" * 10]
    f = File(header, contents)
    blob = f.serialize()
    g = File.deserialize(blob)
    assert g.FileHeader.QuantizationParameter == "2"
    assert g.FileHeader.CodeSize.heights == [4, 2]
    assert g.FileHeader.ImageSize.Pixels == 3500
    assert g.Content == contents
    assert g.BPP == pytest.approx(13 * 8 / 3500)
    assert isinstance(g.size(True), str)


def test_version_check_rejects_newer_major():
    from mcquic_tpu.utils import versionCheck
    assert versionCheck(mcquic_tpu.__version__)
    with pytest.raises(ValueError):
        versionCheck("99.0.0")
