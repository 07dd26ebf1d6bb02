"""Kodak RD sweep (BASELINE config 2): evaluate bpp/PSNR/MS-SSIM for one or
more exported models over an image folder; prints a JSON RD table.

Usage: python examples/rd_sweep.py kodak/ model_qp1.npz model_qp2.npz ...
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(imageDir: str, modelPaths):
    from mcquic_tpu.data import getValLoader
    from mcquic_tpu.demo import loadModel
    from mcquic_tpu.validate.validator import Validator

    points = []
    for path in modelPaths:
        engine = loadModel(local=str(path))
        validator = Validator(engine)
        results = validator.validate(getValLoader(imageDir))
        points.append({"model": str(path), "qp": engine.QuantizationParameter,
                       **results})
        print(json.dumps(points[-1]), flush=True)
    print(json.dumps({"rdCurve": points}))
    return points


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
