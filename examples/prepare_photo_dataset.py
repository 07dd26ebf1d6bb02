"""Build a real-photograph training dataset from the upstream demo photo
(BASELINE config 1 fallback: no egress, so the only real photographic
content available is `/root/reference/assets/sample.png`, 2048x1152).

Split protocol (held-out eval is spatially disjoint from training):
  * train region: left 1280x1152 of the photo
  * val images:   two 768x512 (Kodak-resolution) windows from the RIGHT
    768px strip (top + bottom) — never seen at train time
  * train samples: N random-scale crops (640x640) from the train region
    with flip/transpose augmentation, written as PNGs, then packed into
    tar shards by the product dataset builder (`mcquic dataset`).

Usage: python examples/prepare_photo_dataset.py OUTDIR [N] [--src PATH]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_SRC = "/root/reference/assets/sample.png"
REPO_FALLBACK = Path(__file__).resolve().parent.parent / "assets" / "photo_768x512.png"


def main(outDir: str, n: int = 600, src: str = DEFAULT_SRC):
    from PIL import Image

    out = Path(outDir)
    (out / "train_imgs").mkdir(parents=True, exist_ok=True)
    (out / "val").mkdir(parents=True, exist_ok=True)

    srcPath = Path(src) if Path(src).exists() else REPO_FALLBACK
    img = np.asarray(Image.open(srcPath).convert("RGB"))
    h, w = img.shape[:2]

    if w >= 2048 and h >= 1024:
        trainRegion = img[:, : w - 768]
        valStrip = img[:, w - 768:]
        vals = [valStrip[:512], valStrip[h - 512:]]
    else:  # small fallback source: top half trains, bottom half validates
        trainRegion = img[: h // 2]
        vals = [img[h // 2:]]
    for i, v in enumerate(vals):
        Image.fromarray(v).save(out / "val" / f"val{i}.png")

    rng = np.random.default_rng(3407)
    th, tw = trainRegion.shape[:2]
    crop = 640
    for i in range(n):
        # random scale: zoom out up to 1.8x before cropping (multi-scale
        # statistics; the train loader adds its own RandomResizedCrop)
        scale = float(rng.uniform(1.0, 1.8))
        ch = min(int(crop * scale), th)
        cw = min(int(crop * scale), tw)
        top = int(rng.integers(0, th - ch + 1))
        left = int(rng.integers(0, tw - cw + 1))
        patch = trainRegion[top:top + ch, left:left + cw]
        if ch != crop or cw != crop:
            patch = np.asarray(Image.fromarray(patch).resize((crop, crop),
                                                             Image.LANCZOS))
        k = int(rng.integers(0, 4))
        patch = np.rot90(patch, k)
        if rng.random() < 0.5:
            patch = patch[:, ::-1]
        Image.fromarray(np.ascontiguousarray(patch)).save(
            out / "train_imgs" / f"crop{i:05d}.png")

    print(f"wrote {n} train crops + {len(vals)} val images under {out}")
    print(f"next: python -m mcquic_tpu dataset -j 1 {out / 'train_imgs'} "
          f"{out / 'shards'}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = DEFAULT_SRC
    for a in sys.argv[1:]:
        if a.startswith("--src="):
            src = a.split("=", 1)[1]
    main(args[0], int(args[1]) if len(args) > 1 else 600, src)
