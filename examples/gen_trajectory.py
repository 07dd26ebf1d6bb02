"""Extract the stage-2 per-level CE trajectory from a GenTrainer log.

GenTrainer logs `step N: {'loss': ..., 'ceLv00': ..., 'ceLv01': ...}` every
100 steps (`train/genTrainer.py`); this collects the per-level cross-entropy
into a JSON list + markdown table — the "per-level CE descending" evidence
for generation training at scale (reference genTrainer.py:225-304 logs the
same quantity per residual level).

Usage: python examples/gen_trajectory.py TRAIN_LOG [--md] [--every K]
  --every K  keep one row per K logged steps (table thinning, default 1)
"""
import ast
import json
import re
import sys

LINE = re.compile(r"step (\d+): (\{.*\})")


def parse(path: str):
    rows = []
    with open(path, errors="replace") as f:
        for line in f:
            m = LINE.search(line)
            if m:
                try:
                    d = ast.literal_eval(m.group(2))
                except (ValueError, SyntaxError):
                    continue
                if any(k.startswith("ceLv") for k in d):
                    rows.append({"step": int(m.group(1)), **d})
    byStep = {r["step"]: r for r in rows}  # last wins across resumes
    return [byStep[s] for s in sorted(byStep)]


def main(path: str, md: bool = False, every: int = 1):
    rows = parse(path)
    kept = [r for i, r in enumerate(rows) if i % every == 0 or i == len(rows) - 1]
    if md and rows:
        levels = sorted(k for k in rows[0] if k.startswith("ceLv"))
        print("| step | loss | " + " | ".join(l.replace("ceLv", "CE lv") for l in levels) + " |")
        print("|" + "---|" * (len(levels) + 2))
        for r in kept:
            cells = " | ".join(f"{r.get(l, float('nan')):.3f}" for l in levels)
            print(f"| {r['step']} | {r.get('loss', float('nan')):.3f} | {cells} |")
    else:
        print(json.dumps(kept, indent=1))
    return rows


if __name__ == "__main__":
    every = 1
    if "--every" in sys.argv:
        every = int(sys.argv[sys.argv.index("--every") + 1])
    main(sys.argv[1], md="--md" in sys.argv[2:], every=every)
