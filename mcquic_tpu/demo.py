"""Compress / restore app (reference `mcquic/demo.py`).

Dispatch by suffix (`demo.py:45-77`): image → `.mcq`, `.mcq` → image.
Model loading (`demo.py:137-163`): by `-qp` from the pretrained model zoo
(URL + sha256 gate) or from a `--local` exported model file (saver.exportModel
.npz format with `{config, version, qp}` sidecar metadata).
"""
import logging
import os
import urllib.request
from pathlib import Path

import numpy as np

import mcquic_tpu
from mcquic_tpu.config import Config
from mcquic_tpu.container import File
from mcquic_tpu.data.transforms import alignedCrop
from mcquic_tpu.models.engine import CompressorEngine
from mcquic_tpu.train.saver import loadTree
from mcquic_tpu.utils import versionCheck
from mcquic_tpu.utils.registry import ModelRegistry

logger = logging.getLogger("mcquic_tpu")

# qp -> release asset (same naming scheme as reference MODELS_URL, demo.py:20-24).
MODELS_URL_BASE = os.environ.get("MCQUIC_MODELS_URL", "")
MODELS_HASH = {}


def _buildModule(config: Config):
    from mcquic_tpu.train.trainer import _adaptModelParams
    key = config.Model.Key
    params = _adaptModelParams(config.Model.Params)
    if "k" in params and isinstance(params.get("k"), list):
        params["k"] = tuple(params["k"])
    if "size" in params:
        params["size"] = tuple(params["size"])
    return ModelRegistry.get(key)(**params)


def loadModel(qp: int = None, local: str = None, mse: bool = False) -> CompressorEngine:
    """Load an exported model (demo.py:137-163 semantics)."""
    if local:
        path = Path(local)
    else:
        if not MODELS_URL_BASE:
            raise RuntimeError(
                "No --local model given and no model zoo URL configured "
                "(set MCQUIC_MODELS_URL). This environment has no network egress; "
                "use `mcquic validate --export` to produce a local model file.")
        suffix = "mse" if mse else "msssim"
        name = f"qp_{qp}_{suffix}.mcquic.npz"
        path = Path(mcquic_tpu.Consts.TempDir) / name
        urllib.request.urlretrieve(MODELS_URL_BASE + name, path)
    tree, meta = loadTree(path)
    if meta is None:
        raise RuntimeError(f"Model file {path} lacks metadata sidecar.")
    versionCheck(meta["version"])
    config = Config.deserialize(meta["config"])
    module = _buildModule(config)
    engine = CompressorEngine(module, {"params": tree["params"], "coder": tree.get("coder", {})},
                              qp=str(meta.get("qp", qp if qp is not None else -1)))
    return engine


def readImage(path: Path) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    return np.asarray(img)


def writeImage(path: Path, img: np.ndarray):
    from PIL import Image
    Image.fromarray(img).save(path)


def main(qp: int, local, disable_gpu: bool, mse: bool, crop: bool,
         inputPath: Path, outputPath: Path):
    """Suffix dispatch (demo.py:45-77)."""
    inputPath = Path(inputPath)
    if inputPath.suffix.lower() == ".mcq":
        file = File.deserialize(inputPath.read_bytes())
        if local is None and qp is None:
            # qp auto-detect from header (demo.py:79-107)
            qp = int(file.FileHeader.QuantizationParameter)
        engine = loadModel(qp=qp, local=local, mse=mse)
        restored = engine.decompressImage(file)
        out = Path(outputPath) if outputPath else inputPath.with_suffix(".png")
        if out.is_dir():
            out = out / (inputPath.stem + ".png")
        writeImage(out, restored)
        logger.info("Restored %s -> %s", inputPath, out)
        return out
    else:
        img = readImage(inputPath)
        if crop:
            img = alignedCrop(img, 128)
        engine = loadModel(qp=qp, local=local, mse=mse)
        file = engine.compressImage(img)
        out = Path(outputPath) if outputPath else inputPath.with_suffix(".mcq")
        if out.is_dir():
            out = out / (inputPath.stem + ".mcq")
        out.write_bytes(file.serialize())
        logger.info("Compressed %s -> %s\n%s", inputPath, out, file)
        return out
