"""Dataset-builder CLI backend: image folder → webdataset-style tar shards.

Parity with reference `mcquic/data/cli.py`:
  * strict filtering: images ≥ 512x512 with mean total variation > 64
    (`data/cli.py:58-77`), run in parallel (`:110-113`),
  * `jobs` parallel shard writers into `split###/` staging dirs
    (`createwdsSingle`, `data/cli.py:123-131`) producing
    `mcquic_DATA_%05d.tar.gz`,
  * split merging: staged shards renumbered into the output dir
    (`combineAllSplits`, `data/cli.py:133-148`),
  * `metadata.json` with the sample count (`:193-198`),
  * `-G` image-text variant adds a `txt` member per sample
    (`data/cli_image_text.py:34-42`).

Unlike the reference (which shuffles the file list), the writer order is
deterministic: same inputs at the same `jobs` produce byte-identical shards
run-to-run, and the SAMPLE SET is identical across `jobs` values (shard-file
composition follows the split boundaries, so shard bytes differ between
different `jobs` settings).
"""
import gzip
import io
import json
import logging
import shutil
import tarfile
import time
from pathlib import Path
from typing import List, Optional

import numpy as np

from mcquic_tpu.data.dataset import listImages

logger = logging.getLogger("mcquic_tpu.data")

SHARD_PATTERN = "mcquic_DATA_%05d.tar.gz"
MAX_PER_SHARD = 100000


def _passesFilter(img: np.ndarray, minSize: int = 512, minTv: float = 64.0) -> bool:
    if img.shape[0] < minSize or img.shape[1] < minSize:
        return False
    # piq total_variation on a center crop is expensive; subsample for speed.
    sub = img[::4, ::4]
    x = sub.astype(np.float32)
    tv = np.abs(np.diff(x, axis=0)).sum() + np.abs(np.diff(x, axis=1)).sum()
    return tv / (sub.shape[0] * sub.shape[1]) > minTv / 64.0


def _validateOne(path: Path) -> Optional[Path]:
    """Open + filter one candidate (reference _joblibValidateImage)."""
    from PIL import Image

    try:
        with Image.open(path) as img:
            arr = np.asarray(img.convert("RGB"))
    except Exception:
        return None
    return path if _passesFilter(arr) else None


class _ShardFile:
    """tar.gz writer with gzip mtime pinned to 0 so identical inputs yield
    byte-identical shards (tarfile does not close external fileobjs)."""

    def __init__(self, path: Path):
        self._gz = gzip.GzipFile(str(path), "wb", mtime=0)
        self._tar = tarfile.open(fileobj=self._gz, mode="w")

    def addfile(self, info: tarfile.TarInfo, fileobj):
        self._tar.addfile(info, fileobj)

    def close(self):
        self._tar.close()
        self._gz.close()


def _openShard(path: Path) -> "_ShardFile":
    return _ShardFile(path)


def _writeSplit(rank: int, start: int, files: List[Path], outDir: Path,
                gen: bool) -> int:
    """One parallel shard writer over its file chunk (reference
    createwdsSingle, data/cli.py:123-131). Sample keys are globally
    sequential via `start`."""
    from PIL import Image

    splitDir = Path(outDir) / f"split{rank:03d}"
    shutil.rmtree(splitDir, ignore_errors=True)
    splitDir.mkdir(parents=True, exist_ok=True)
    shardIdx, inShard, written = 0, 0, 0
    tf = _openShard(splitDir / (SHARD_PATTERN % shardIdx))
    for i, path in enumerate(files):
        try:
            img = Image.open(path).convert("RGB")
        except Exception:
            continue
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=95)
        data = buf.getvalue()
        key = f"{start + i:09d}"
        info = tarfile.TarInfo(f"{key}.jpg")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
        if gen:
            caption = path.stem.replace("_", " ").encode()
            tInfo = tarfile.TarInfo(f"{key}.txt")
            tInfo.size = len(caption)
            tf.addfile(tInfo, io.BytesIO(caption))
        written += 1
        inShard += 1
        if inShard >= MAX_PER_SHARD:
            tf.close()
            shardIdx += 1
            inShard = 0
            tf = _openShard(splitDir / (SHARD_PATTERN % shardIdx))
    tf.close()
    return written


def _mergeSplits(output: Path) -> int:
    """Renumber staged split shards into the output dir and drop the staging
    dirs (reference combineAllSplits, data/cli.py:133-148)."""
    current = 0
    for split in sorted(Path(output).glob("split*")):
        for tar in sorted(split.glob("*.tar.gz")):
            shutil.move(str(tar), str(Path(output) / (SHARD_PATTERN % current)))
            current += 1
        shutil.rmtree(split)
    return current


def main(images: Path, output: Path, jobs: int = 1, gen: bool = False):
    from joblib import Parallel, delayed

    jobs = max(int(jobs), 1)
    output = Path(output)
    output.mkdir(parents=True, exist_ok=True)
    files = listImages(images)
    logger.info("scanning %d candidate images", len(files))
    start = time.time()

    # ---- parallel validation pass (reference data/cli.py:110-116)
    kept: List[Path] = [f for f in Parallel(n_jobs=jobs, backend="threading")(
        delayed(_validateOne)(f) for f in files) if f is not None]
    logger.info("%d/%d images pass the filter (%.1f img/s)", len(kept),
                len(files), len(files) / max(time.time() - start, 1e-9))

    # ---- parallel shard writers over deterministic contiguous chunks
    # (empty chunks are dropped — they would stage empty archives)
    chunk = (len(kept) + jobs - 1) // jobs if kept else 0
    groups = [(r, r * chunk, kept[r * chunk:(r + 1) * chunk])
              for r in range(jobs) if kept[r * chunk:(r + 1) * chunk]]
    counts = Parallel(n_jobs=max(len(groups), 1), backend="threading")(
        delayed(_writeSplit)(rank, st, grp, output, gen)
        for rank, st, grp in groups)
    total = int(sum(counts))

    shards = _mergeSplits(output)
    (output / "metadata.json").write_text(json.dumps({
        "count": total, "shards": shards, "imageText": bool(gen)}))
    logger.info("wrote %d samples into %d shard(s) at %s", total, shards, output)
    return total
