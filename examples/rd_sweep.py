"""RD sweep (BASELINE config 2): evaluate bpp/PSNR/MS-SSIM for one or more
exported models over an image folder; prints a JSON RD table.

`--per-image` additionally validates every image separately so the output
carries the per-image spread, not just the folder mean (round-3 verdict
item 4: a single-photo mean hides generalization failures). Reference
protocol per image: real compress -> rANS bytes -> decompress
(`mcquic/validate/validator.py:40-58`).

Usage: python examples/rd_sweep.py IMAGE_DIR model1.npz [model2.npz ...]
       [--per-image]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(imageDir: str, modelPaths, perImage: bool = False):
    from mcquic_tpu.data import getValLoader
    from mcquic_tpu.demo import loadModel
    from mcquic_tpu.validate.validator import Validator

    points = []
    for path in modelPaths:
        engine = loadModel(local=str(path))
        validator = Validator(engine)
        results = validator.validate(getValLoader(imageDir))
        row = {"model": str(path), "qp": engine.QuantizationParameter,
               **results}
        if perImage:
            rows = {}
            for batch, stem in getValLoader(imageDir)():
                one = validator.validate(lambda b=batch, s=stem: iter([(b, s)]))
                one.pop("images", None)
                rows[stem] = one
                print(json.dumps({"image": stem, **one}), flush=True)
            row["perImage"] = rows
        points.append(row)
        print(json.dumps(points[-1]), flush=True)
    print(json.dumps({"rdCurve": points}))
    return points


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--per-image"]
    main(args[0], args[1:], perImage="--per-image" in sys.argv)
