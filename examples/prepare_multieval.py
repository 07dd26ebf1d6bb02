"""Build a multi-image held-out RD evaluation set (round-3 verdict item 4).

Single-photo-domain RD says little about generalization; this materializes
every held-out-able image producible in this zero-egress environment, each
with a provenance label:

  natural, held out (never seen in training — train crops come only from
  the LEFT 1280px of the upstream sample photo):
    * val0, val1    — the two 768x512 RIGHT-strip windows
    * kodim24       — the original kodim24 recovered from the reference's
                      RD-figure panel (examples/extract_kodim24.py)
  natural, scale-shifted (contains train-region content at ~0.5x scale —
  NOT fully held out; labeled so the table can say so):
    * fullview      — the whole 2048x1152 photo Lanczos-resized to 1024x576,
                      center-cropped 768x512
  synthetic, out-of-domain (classic codec test patterns; zero overlap with
  any training statistics):
    * deadleaves    — occluding power-law discs (the standard natural-image-
                      statistics model used in camera/codec evaluation)
    * pinknoise     — 1/f-spectrum RGB noise
    * zoneplate     — radial chirp (worst-case high-frequency content)

Usage: python examples/prepare_multieval.py [OUTDIR]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/reference/assets/sample.png"
H, W = 512, 768


def deadLeaves(rng, h=H, w=W, n=4000):
    """Occluding discs with power-law radii, drawn back-to-front."""
    img = np.full((h, w, 3), 0.5, np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # power-law radii (alpha=3) clipped to [4, 120] px
    u = rng.uniform(0.0, 1.0, n).astype(np.float32)
    rmin, rmax, alpha = 4.0, 120.0, 3.0
    radii = (rmin ** (1 - alpha) + u * (rmax ** (1 - alpha) - rmin ** (1 - alpha))) ** (1 / (1 - alpha))
    for i in range(n):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        color = rng.uniform(0.05, 0.95, 3).astype(np.float32)
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= radii[i] ** 2
        img[mask] = color
    return (img * 255).astype(np.uint8)


def pinkNoise(rng, h=H, w=W):
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    f = np.sqrt(fy ** 2 + fx ** 2)
    f[0, 0] = 1.0
    out = []
    for _ in range(3):
        spec = (rng.normal(size=(h, w)) + 1j * rng.normal(size=(h, w))) / f
        ch = np.fft.ifft2(spec).real
        ch = (ch - ch.min()) / (ch.max() - ch.min() + 1e-9)
        out.append(ch)
    return (np.stack(out, -1) * 255).astype(np.uint8)


def zonePlate(h=H, w=W):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = h / 2, w / 2
    r2 = (yy - cy) ** 2 + (xx - cx) ** 2
    z = 0.5 + 0.5 * np.cos(np.pi * r2 / (0.6 * max(h, w)))
    return (np.repeat(z[..., None], 3, -1) * 255).astype(np.uint8)


def main(outDir: str = ".scratch/multieval"):
    from PIL import Image

    from examples.extract_kodim24 import main as extractKodim

    out = Path(outDir)
    out.mkdir(parents=True, exist_ok=True)

    srcPath = Path(SRC)
    if not srcPath.exists():
        srcPath = Path(__file__).resolve().parent.parent / "assets" / "photo_768x512.png"
    img = np.asarray(Image.open(srcPath).convert("RGB"))
    h, w = img.shape[:2]
    if w >= 2048 and h >= 1024:  # provenance: see module docstring
        valStrip = img[:, w - 768:]
        Image.fromarray(valStrip[:512]).save(out / "val0.png")
        Image.fromarray(valStrip[h - 512:]).save(out / "val1.png")
        full = Image.fromarray(img).resize((1024, 576), Image.LANCZOS)
        fullArr = np.asarray(full)
        top, left = (576 - H) // 2, (1024 - W) // 2
        Image.fromarray(fullArr[top:top + H, left:left + W]).save(out / "fullview.png")

    try:
        extractKodim(str(out / "kodim24.png"))
    except FileNotFoundError:
        print("reference figure unavailable; skipping kodim24")

    rng = np.random.default_rng(3407)
    Image.fromarray(deadLeaves(rng)).save(out / "deadleaves.png")
    Image.fromarray(pinkNoise(rng)).save(out / "pinknoise.png")
    Image.fromarray(zonePlate()).save(out / "zoneplate.png")
    names = sorted(p.name for p in out.glob("*.png"))
    print(f"wrote {len(names)} eval images to {out}: {names}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
