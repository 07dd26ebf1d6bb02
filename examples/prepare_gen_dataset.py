"""Build a class-conditional generation dataset from the upstream demo photo.

Stage-2 (`GeneratorV3SelfAttention`) trains on (image, class) pairs — the
reference streams ImageNet webdataset shards (reference
`mcquic/data/__init__.py:109-122`, `train/genTrainer.py:225-304`). With zero
egress, the only photographic content available is the demo asset, so classes
are made SPATIAL: the photo is split into a GxG grid and each cell becomes one
wnid-style class (`n00000000`..). A class-conditional model trained on this
must learn a distinct content distribution per class, which is exactly the
signal the per-level CE trajectory and the sample grid need to demonstrate.

Layout produced matches `data/imagenet_classes.getGenLoader`'s folder path:
  OUTDIR/n000000XX/crop00000.png

Usage: python examples/prepare_gen_dataset.py OUTDIR [cropsPerClass] [grid]
"""
import sys
from pathlib import Path

import numpy as np

DEFAULT_SRC = "/root/reference/assets/sample.png"
REPO_FALLBACK = Path(__file__).resolve().parent.parent / "assets" / "photo_768x512.png"


def main(outDir: str, cropsPerClass: int = 96, grid: int = 3,
         src: str = DEFAULT_SRC):
    from PIL import Image

    srcPath = Path(src) if Path(src).exists() else REPO_FALLBACK
    img = np.asarray(Image.open(srcPath).convert("RGB"))
    h, w = img.shape[:2]
    out = Path(outDir)
    rng = np.random.default_rng(1207)

    cellH, cellW = h // grid, w // grid
    crop = min(320, cellH, cellW)
    for gy in range(grid):
        for gx in range(grid):
            cls = gy * grid + gx
            clsDir = out / f"n{cls:08d}"
            clsDir.mkdir(parents=True, exist_ok=True)
            cell = img[gy * cellH:(gy + 1) * cellH, gx * cellW:(gx + 1) * cellW]
            ch, cw = cell.shape[:2]
            for i in range(cropsPerClass):
                top = int(rng.integers(0, ch - crop + 1))
                left = int(rng.integers(0, cw - crop + 1))
                patch = cell[top:top + crop, left:left + crop]
                if rng.random() < 0.5:
                    patch = patch[:, ::-1]
                Image.fromarray(np.ascontiguousarray(patch)).save(
                    clsDir / f"crop{i:05d}.png")
    n = grid * grid
    print(f"wrote {n} classes x {cropsPerClass} crops ({crop}^2) under {out}")


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if not x.startswith("--")]
    src = DEFAULT_SRC
    for x in sys.argv[1:]:
        if x.startswith("--src="):
            src = x.split("=", 1)[1]
    main(a[0], int(a[1]) if len(a) > 1 else 96,
         int(a[2]) if len(a) > 2 else 3, src)
