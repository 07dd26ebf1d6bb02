"""Recover the original kodim24 photograph from the reference paper figure.

The reference repo ships no raw Kodak images, but its RD-comparison figure
(`/root/reference/assets/paper/kodim24-light.png`) embeds the uncompressed
"Original kodim24.png" as its top-left panel (922x615, a 1.2005x upscale of
the native 768x512). This script crops that panel and Lanczos-resamples it
back to 768x512, giving a genuinely held-out natural image for RD evaluation
(training data derives only from `assets/photo_768x512.png`).

Caveat (documented, visible): the panel carries two thin red crop-marker
rectangles drawn by the figure generator; they cover <0.4% of pixels.

Usage: python examples/extract_kodim24.py [out.png]
"""
import sys
from pathlib import Path

from PIL import Image

FIGURE = "/root/reference/assets/paper/kodim24-light.png"
# Panel bounds found by scanning for the figure's black gutters: content
# spans cols 38..2804 (three 922-wide panels) and rows 79..694 (top row).
PANEL = (38, 79, 960, 694)


def main(out: str = "/tmp/photo_ds/val/val2_kodim24.png") -> None:
    im = Image.open(FIGURE).convert("RGB")
    panel = im.crop(PANEL).resize((768, 512), Image.LANCZOS)
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    panel.save(out)
    print(f"wrote {out} {panel.size}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
