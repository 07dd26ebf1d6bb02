"""Regenerate the model-zoo hash table (mcquic_tpu/models_hash.json).

Counterpart of reference `ci/pre_commit/update_model_hash.py`, which scrapes
the GitHub `generic` release; without egress this version scans a local
directory of exported assets instead (the directory you are about to upload
as release assets).

usage: python ci/update_model_hash.py <assetDir> [outJson]

Assets must follow the release naming convention
`qp_{qp}_{mse|msssim}_{sha256[:8]}.mcquic.npz` (saver.exportModel produces
the hash suffix); each file's embedded hash prefix is re-verified against
its content before registration.
"""
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mcquic_tpu.utils import hashOfFile  # noqa: E402

NAME_RE = re.compile(r"^(qp_[0-9]+_(?:mse|msssim))_([0-9a-fA-F]{8,})\.mcquic\.npz$")


def main(assetDir: str, outJson: str = None):
    out = {}
    for path in sorted(Path(assetDir).glob("*.mcquic.npz")):
        match = NAME_RE.match(path.name)
        if not match:
            raise ValueError(f"Naming convention broken with `{path.name}`.")
        key, digest = match.group(1), match.group(2).lower()
        actual = hashOfFile(str(path))
        if not actual.startswith(digest):
            raise ValueError(f"{path.name}: embedded hash prefix {digest} does "
                             f"not match content hash {actual[:len(digest)]}")
        if key in out:
            raise ValueError(f"Duplicate slot {key}")
        out[key] = digest
    target = Path(outJson) if outJson else (
        Path(__file__).resolve().parent.parent / "mcquic_tpu" / "models_hash.json")
    target.write_text(json.dumps(out, indent=2, sort_keys=True) + "\n")
    print(f"registered {len(out)} model(s) -> {target}")
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
