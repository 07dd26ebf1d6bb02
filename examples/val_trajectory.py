"""Extract the in-training validation trajectory from a trainer log.

The Trainer logs one line per validation pass (`step N validation: {...}`,
`train/trainer.py`); this collects them into a JSON list + markdown table —
the quality-over-training record that backs the RD write-up (reference
protocol: real-coder eval on held-out images, `validate/validator.py:40-58`).

Usage: python examples/val_trajectory.py TRAIN_LOG [--md]
"""
import ast
import json
import re
import sys

LINE = re.compile(r"step (\d+) validation: (\{.*\})")


def parse(path: str):
    rows = []
    with open(path, errors="replace") as f:
        for line in f:
            m = LINE.search(line)
            if m:
                rows.append({"step": int(m.group(1)),
                             **ast.literal_eval(m.group(2))})
    # keep the last entry per step (resumes may re-validate)
    byStep = {r["step"]: r for r in rows}
    return [byStep[s] for s in sorted(byStep)]


def main(path: str, md: bool = False):
    rows = parse(path)
    if md:
        print("| step | PSNR (dB) | MS-SSIM | bpp | ideal bpp |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['step']} | {r.get('psnr', float('nan')):.2f} "
                  f"| {r.get('msssim', float('nan')):.4f} "
                  f"| {r.get('bpp', float('nan')):.4f} "
                  f"| {r.get('idealBpp', float('nan')):.4f} |")
    else:
        print(json.dumps(rows, indent=1))
    return rows


if __name__ == "__main__":
    main(sys.argv[1], md="--md" in sys.argv[2:])
