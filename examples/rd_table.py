"""Render the round-4 RD markdown tables from committed rd_sweep JSONs.

Input: one or more `<name>_rd.json` files produced by `examples/rd_sweep.py
--per-image` (each line-oriented: per-image rows, a folder-mean row, then an
`{"rdCurve": [...]}` summary). Output: a markdown table with one row per
(model, image) plus a mean row per model, ready to paste into
`docs/RD_RESULTS_r04.md` §3/§4 (round-3 verdict item 4: an RD *table*, not a
row — reference publishes a table at README.md:301-310).

Usage: python examples/rd_table.py rateA=path/rateA_rd.json rateB=path/rateB_rd.json
"""
import json
import sys


def loadSummary(path: str) -> dict:
    last = None
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            if "rdCurve" in row:
                curve = row["rdCurve"]
                if len(curve) != 1:
                    raise ValueError(
                        f"{path}: expected a single-rate rdCurve, got "
                        f"{len(curve)} entries — pass one file per rate "
                        "point (this renderer emits one table block per "
                        "model)")
                return curve[0]
            last = row
    if last is None:
        raise ValueError(f"{path}: empty rd_sweep output")
    return last  # file without the rdCurve trailer: last mean row


def main(specs):
    models = []
    for spec in specs:
        name, _, path = spec.partition("=")
        models.append((name, loadSummary(path)))
    images = sorted(models[0][1]["perImage"])
    print("| model | image | PSNR (dB) | MS-SSIM | bpp | ideal bpp |")
    print("|---|---|---|---|---|---|")
    for name, s in models:
        for img in images:
            r = s["perImage"][img]
            print(f"| {name} | {img} | {r['psnr']:.2f} | {r['msssim']:.4f} "
                  f"| {r['bpp']:.4f} | {r['idealBpp']:.4f} |")
        print(f"| **{name}** | **mean ({s['images']})** | **{s['psnr']:.2f}** "
              f"| **{s['msssim']:.4f}** | **{s['bpp']:.4f}** "
              f"| **{s['idealBpp']:.4f}** |")


if __name__ == "__main__":
    main(sys.argv[1:])
