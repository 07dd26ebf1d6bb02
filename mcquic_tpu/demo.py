"""Compress / restore app (reference `mcquic/demo.py`).

Dispatch by suffix (`demo.py:45-77`): image → `.mcq`, `.mcq` → image.
Model loading (`demo.py:137-163`): by `-qp` from the pretrained model zoo
(URL + sha256 gate) or from a `--local` exported model file (saver.exportModel
.npz format with `{config, version, qp}` sidecar metadata).
"""
import json
import logging
import os
import urllib.request
from pathlib import Path
from typing import Dict, Optional

import numpy as np

import mcquic_tpu
from mcquic_tpu.config import Config
from mcquic_tpu.container import File
from mcquic_tpu.data.transforms import alignedCrop
from mcquic_tpu.models.engine import CompressorEngine
from mcquic_tpu.train.saver import loadTree, upcastBf16
from mcquic_tpu.utils import hashOfFile, versionCheck
from mcquic_tpu.utils.registry import ModelRegistry

logger = logging.getLogger("mcquic_tpu")

# Model zoo (reference MODELS_URL/MODELS_HASH, demo.py:20-24): assets named
# `qp_{qp}_{mse|msssim}_{sha256[:8]}.mcquic.npz` (+ `.json` sidecar), the
# hash table maintained by ci/update_model_hash.py. The URL base and hash
# file are env-overridable so zoo mirrors / test fixtures can stand in.
_HASH_FILE_DEFAULT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "models_hash.json")


def modelsUrlBase() -> str:
    return os.environ.get("MCQUIC_MODELS_URL", "")


def bundledZooDir() -> str:
    """In-repo zoo directory (assets/zoo): self-trained artifacts committed
    with the source so `-qp N` works with zero configuration / zero egress.
    The reference ships its zoo via GitHub release downloads (demo.py:20-24);
    a checkout-local directory is the no-egress equivalent. Env-overridable
    for tests and for deployments that relocate the assets."""
    default = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "assets", "zoo")
    return os.environ.get("MCQUIC_BUNDLED_ZOO", default)


def modelsHash() -> Dict[str, str]:
    path = os.environ.get("MCQUIC_MODELS_HASH_FILE", _HASH_FILE_DEFAULT)
    if os.path.exists(path):
        with open(path) as fp:
            return json.load(fp)
    return {}


def zooCacheDir() -> Path:
    cache = Path(os.environ.get("MCQUIC_CACHE",
                                os.path.expanduser("~/.cache/mcquic_tpu"))) / "zoo"
    cache.mkdir(parents=True, exist_ok=True)
    return cache


def fetchZooModel(qp: int, mse: bool = False) -> Path:
    """Resolve a qp slot to a verified local model file: cache lookup,
    download from the zoo URL, sha256-prefix verification (the reference's
    torch.hub hash gate, demo.py:137-163)."""
    key = f"qp_{qp}_{'mse' if mse else 'msssim'}"
    hashes = modelsHash()
    if key not in hashes:
        known = sorted(hashes) or ["<none registered>"]
        raise RuntimeError(
            f"No model registered for slot `{key}`. Known slots: {known}. "
            "Register artifacts with ci/update_model_hash.py or pass --local.")
    digest = hashes[key].lower()
    name = f"{key}_{digest}.mcquic.npz"
    bundled = Path(bundledZooDir()) / name
    if bundled.exists():
        # committed artifact: hash-verify in place, no cache copy needed
        actual = hashOfFile(str(bundled))
        if not actual.startswith(digest):
            raise RuntimeError(
                f"Bundled zoo asset {bundled} does not match registered hash "
                f"prefix {digest} (got {actual[:len(digest)]}).")
        if not bundled.with_suffix(".json").exists():
            # same loud, early failure as the download path — without the
            # metadata sidecar the npz only fails later in loadModel with a
            # less actionable error
            raise RuntimeError(
                f"Bundled zoo asset {bundled} lacks its metadata sidecar "
                f"{bundled.with_suffix('.json').name}; the artifact is "
                "incomplete — re-export it with `mcquic_tpu validate -e`.")
        return bundled
    path = zooCacheDir() / name
    if not path.exists():
        base = modelsUrlBase()
        if not base:
            raise RuntimeError(
                "Model zoo URL not configured (set MCQUIC_MODELS_URL); "
                "this environment has no network egress — use --local or a "
                "file:// mirror.")
        if not base.endswith("/"):
            base += "/"
        logger.info("downloading %s", base + name)
        urllib.request.urlretrieve(base + name, path)
        sidecar = name[:-len(".npz")] + ".json"
        try:
            urllib.request.urlretrieve(base + sidecar, path.with_suffix(".json"))
        except Exception as exc:
            # a cached npz without its metadata sidecar would be permanently
            # unusable — drop the payload so the next call re-fetches both
            path.unlink(missing_ok=True)
            raise RuntimeError(
                f"Failed to fetch model metadata sidecar {sidecar}: {exc}"
            ) from exc
    actual = hashOfFile(str(path))
    if not actual.startswith(digest):
        path.unlink(missing_ok=True)
        raise RuntimeError(
            f"Hash mismatch for {name}: expected prefix {digest}, got "
            f"{actual[:len(digest)]} — corrupted download removed.")
    return path


def _buildModule(config: Config):
    from mcquic_tpu.train.trainer import resolveStage1Model
    key, params = resolveStage1Model(config)
    return ModelRegistry.get(key)(**params)


def loadModel(qp: int = None, local: str = None, mse: bool = False) -> CompressorEngine:
    """Load an exported model (demo.py:137-163 semantics)."""
    if local:
        path = Path(local)
    else:
        path = fetchZooModel(qp, mse=mse)
    tree, meta = loadTree(path)
    tree = upcastBf16(tree)  # bf16 deploy exports serve as fp32
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
         inputPath: Path, outputPath: Path, tile: int = 0):
    """Suffix dispatch (demo.py:45-77); `tile` > 0 codes high-resolution
    images as a fixed tile grid (models/tiling.py, BASELINE config 3)."""
    from mcquic_tpu.models.tiling import (TiledFile, compressTiled,
                                          decompressTiled)

    inputPath = Path(inputPath)
    if inputPath.suffix.lower() == ".mcq":
        data = inputPath.read_bytes()
        if TiledFile.isTiled(data):
            tf = TiledFile.deserialize(data)
            if local is None and qp is None:
                qp = int(tf.qp)
            engine = loadModel(qp=qp, local=local, mse=mse)
            restored = decompressTiled(engine, tf)
        else:
            file = File.deserialize(data)
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
        if tile:
            file = compressTiled(engine, img, tile=tile)
        else:
            file = engine.compressImage(img)
        out = Path(outputPath) if outputPath else inputPath.with_suffix(".mcq")
        if out.is_dir():
            out = out / (inputPath.stem + ".mcq")
        out.write_bytes(file.serialize())
        logger.info("Compressed %s -> %s\n%s", inputPath, out, file)
        return out
