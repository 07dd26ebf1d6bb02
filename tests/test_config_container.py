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


def test_config_crop_size_optional():
    """cropSize: absent -> None (model-derived); explicit value round-trips."""
    cfg = Config.deserialize(_cfgDict())
    assert cfg.Train.CropSize is None
    assert "cropSize" not in cfg.serialize()["train"]
    d = _cfgDict()
    d["train"]["cropSize"] = 256
    cfg = Config.deserialize(d)
    assert cfg.Train.CropSize == 256
    assert Config.deserialize(cfg.serialize()).Train.CropSize == 256


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


def test_reference_shaped_mcq_blob_parses():
    """A .mcq packed exactly as the reference's marshmallow FileSchema dump
    (specification.py:149-156 layout) must parse here."""
    import msgpack
    refDict = {
        "fileHeader": {
            "qp": "2",
            "version": mcquic_tpu.__version__,
            "codeSize": {"m": [2, 2, 2], "heights": [48, 24, 12],
                         "widths": [32, 16, 8], "k": [8192, 2048, 512]},
            "imageSize": {"height": 768, "width": 512, "channel": 3},
        },
        "contents": [b"\x01\x02", b"\x03", b"\x04\x05\x06"],
    }
    blob = msgpack.packb(refDict, use_bin_type=True)
    f = File.deserialize(blob)
    assert f.FileHeader.QuantizationParameter == "2"
    assert f.FileHeader.CodeSize.k == [8192, 2048, 512]
    assert f.FileHeader.ImageSize.Pixels == 768 * 512
    assert f.Content == refDict["contents"]
    # and our serialization round-trips through the same dict shape
    back = msgpack.unpackb(f.serialize(), raw=False)
    assert set(back.keys()) == {"fileHeader", "contents"}
    assert set(back["fileHeader"].keys()) == {"qp", "version", "codeSize", "imageSize"}


def test_profiling_utils():
    from mcquic_tpu.utils.profiling import syncAndFetch, wallClock
    import jax.numpy as jnp
    sink = {}
    with wallClock("op", sink):
        x = syncAndFetch(jnp.ones((4, 4)) * 2)
    assert sink["op"] >= 0
    assert float(x[0, 0]) == 2.0
