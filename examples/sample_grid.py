"""Tile `generate`-CLI sample PNGs into one grid image.

`mcquic_tpu generate -c 0,1,... CKPT OUTDIR` writes one PNG per class
(`class{c}_{i}.png`); this packs them row-major into a single grid for the
checked-in training-evidence write-up (reference equivalent: the wandb image
panels logged by genTrainer).

Usage: python examples/sample_grid.py SAMPLE_DIR OUT_PNG [--cols N]
"""
import re
import sys
from pathlib import Path

import numpy as np
from PIL import Image


def main(sampleDir: str, outPath: str, cols: int = 4):
    files = sorted(Path(sampleDir).glob("*.png"),
                   key=lambda p: [int(t) if t.isdigit() else t
                                  for t in re.split(r"(\d+)", p.name)])
    if not files:
        raise SystemExit(f"no PNGs in {sampleDir}")
    imgs = [np.asarray(Image.open(f).convert("RGB")) for f in files]
    h = max(i.shape[0] for i in imgs)
    w = max(i.shape[1] for i in imgs)
    imgs = [np.pad(i, ((0, h - i.shape[0]), (0, w - i.shape[1]), (0, 0)))
            for i in imgs]
    rows = (len(imgs) + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for n, img in enumerate(imgs):
        r, c = divmod(n, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = img
    Image.fromarray(grid).save(outPath)
    print(f"{len(imgs)} samples -> {outPath} ({rows}x{cols} grid)")


if __name__ == "__main__":
    cols = int(sys.argv[sys.argv.index("--cols") + 1]) if "--cols" in sys.argv else 4
    main(sys.argv[1], sys.argv[2], cols)
