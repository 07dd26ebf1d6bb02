"""End-to-end stage-1 product path: yaml config -> tar shards -> train/cli.main
-> checkpoint -> export -> validate (the reference's operational loop)."""
import io
import tarfile

import numpy as np
import pytest
import yaml


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    from PIL import Image

    # --- build a tiny shard dataset
    shardDir = tmp_path / "shards"
    shardDir.mkdir()
    rng = np.random.default_rng(0)
    with tarfile.open(shardDir / "mcquic_DATA_00000.tar", "w") as tf:
        for i in range(8):
            img = Image.fromarray(rng.integers(0, 256, (80, 80, 3), dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            info = tarfile.TarInfo(f"{i:06d}.png")
            info.size = buf.getbuffer().nbytes
            tf.addfile(info, io.BytesIO(buf.getvalue()))

    # --- tiny config
    cfg = {
        "model": {"key": "Compressor", "params": {"channel": 8, "m": 1, "k": [16]}},
        "train": {
            "totalStep": 3, "batchSize": 1, "epoch": 100, "valFreq": 30,
            "trainSet": str(shardDir / "*.tar"), "valSet": "unused",
            "saveDir": str(tmp_path / "saved"), "target": "PSNR",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "Placeholder", "params": {}},
            "gpu": {"gpus": 8},
        },
    }
    cfgPath = tmp_path / "cfg.yaml"
    cfgPath.write_text(yaml.dump(cfg))

    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    from mcquic_tpu.train.cli import main as trainMain
    # NOTE: loader crops to 512 by default -> override via small crop by
    # patching getTrainLoader through the config path is heavy; use direct call
    import mcquic_tpu.train.cli as trainCli
    from mcquic_tpu.data import getTrainLoader

    origLoader = trainCli.getTrainLoader
    trainCli.getTrainLoader = lambda p, b, cropSize=512, **kw: origLoader(p, b, cropSize=32, **kw)
    try:
        trainer = trainMain(cfgPath)
    finally:
        trainCli.getTrainLoader = origLoader
    assert int(trainer.state.step) == 3
    ckpt = tmp_path / "saved" / "latest" / "saved.ckpt.npz"
    assert ckpt.exists()

    # --- validate CLI on the checkpoint (speed skipped: just export)
    from mcquic_tpu.train.saver import exportModel, loadTree
    tree, meta = loadTree(ckpt)
    assert meta["config"]["model"]["key"] == "Compressor"
    exported = exportModel(tmp_path / "export.npz",
                           {"params": tree["params"], "coder": tree["coder"]},
                           meta["config"], qp="0")
    assert exported.exists()

    # --- exported model loads in the demo path and round-trips an image
    from mcquic_tpu.demo import loadModel
    engine = loadModel(local=str(exported))
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    file = engine.compressImage(img)
    restored = engine.decompressImage(file)
    assert restored.shape == img.shape
