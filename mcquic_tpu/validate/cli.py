"""Validate CLI backend: checkpoint → eval + speed (+ export).

Parity with reference `mcquic/validate/cli.py:40-100`: accepts either a raw
trainer checkpoint (saved.ckpt.npz with full TrainState) or an exported model
file; runs validation + speed; optionally exports the deploy model with
config + version + sha256-suffixed filename.
"""
import json
import logging
from pathlib import Path

from mcquic_tpu.config import Config
from mcquic_tpu.data import getValLoader
from mcquic_tpu.models.engine import CompressorEngine
from mcquic_tpu.train.saver import exportModel, loadTree, upcastBf16
from mcquic_tpu.validate.validator import Validator

logger = logging.getLogger("mcquic_tpu.validate")


def loadAnyCheckpoint(path: Path):
    """Return (variables, config) from trainer ckpt or exported model."""
    tree, meta = loadTree(path)
    tree = upcastBf16(tree)  # bf16 deploy exports evaluate as fp32
    if meta is None or "config" not in meta:
        raise RuntimeError(f"{path} lacks config metadata")
    config = Config.deserialize(meta["config"])
    variables = {"params": tree["params"], "coder": tree.get("coder", {})}
    return variables, config, meta


def main(path: Path, images, export=None, bf16: bool = False):
    from mcquic_tpu.demo import _buildModule

    variables, config, meta = loadAnyCheckpoint(Path(path))
    module = _buildModule(config)
    engine = CompressorEngine(module, variables, qp=str(meta.get("qp", "-1")))
    validator = Validator(engine)

    if images is not None:
        results = validator.validate(getValLoader(str(images)))
        logger.info("validation: %s", json.dumps(results))
        print(json.dumps(results))

    # Export FIRST: it is pure host-side serialization and must not be lost
    # to a speed-bench failure (the remote-compile service can 500 on the
    # speed executable after validation already succeeded — seen live).
    if export is not None:
        final = exportModel(Path(export), variables, config.serialize(),
                            qp=str(meta.get("qp", "-1")), bf16=bf16)
        logger.info("exported deploy model to %s", final)
        print(str(final))

    try:
        encMpps, decMpps = validator.speed()
    except Exception:
        logger.exception("speed bench failed (eval + export above are valid)")
    else:
        logger.info("speed: encode %.2f Mpps, decode %.2f Mpps", encMpps, decMpps)
        print(json.dumps({"encodeMpps": encMpps, "decodeMpps": decMpps}))
