"""Dataset-builder CLI backend: image folder → webdataset-style tar shards.

Parity with reference `mcquic/data/cli.py`:
  * strict filtering: images ≥ 512x512 with mean total variation > 64
    (`data/cli.py:58-77`),
  * shard writers producing `mcquic_DATA_%05d.tar.gz` (`:123-131`),
  * `metadata.json` with the sample count (`:193-198`),
  * `-G` image-text variant adds a `txt` member per sample
    (`data/cli_image_text.py:34-42`).
"""
import io
import json
import logging
import tarfile
import time
from pathlib import Path

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


def main(images: Path, output: Path, jobs: int = 1, gen: bool = False):
    from PIL import Image

    output = Path(output)
    output.mkdir(parents=True, exist_ok=True)
    files = listImages(images)
    logger.info("scanning %d candidate images", len(files))

    shardIdx, count, total = 0, 0, 0
    tf = tarfile.open(output / (SHARD_PATTERN % shardIdx), "w:gz")
    start = time.time()
    for i, path in enumerate(files):
        try:
            img = Image.open(path).convert("RGB")
        except Exception:
            continue
        arr = np.asarray(img)
        if not _passesFilter(arr):
            continue
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=95)
        data = buf.getvalue()
        key = f"{total:09d}"
        info = tarfile.TarInfo(f"{key}.jpg")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
        if gen:
            caption = path.stem.replace("_", " ").encode()
            tInfo = tarfile.TarInfo(f"{key}.txt")
            tInfo.size = len(caption)
            tf.addfile(tInfo, io.BytesIO(caption))
        count += 1
        total += 1
        if count >= MAX_PER_SHARD:
            tf.close()
            shardIdx += 1
            count = 0
            tf = tarfile.open(output / (SHARD_PATTERN % shardIdx), "w:gz")
        if (i + 1) % 1000 == 0:
            logger.info("%d/%d scanned, %d kept (%.1f img/s)", i + 1, len(files),
                        total, (i + 1) / (time.time() - start))
    tf.close()
    (output / "metadata.json").write_text(json.dumps({
        "count": total, "shards": shardIdx + 1, "imageText": bool(gen)}))
    logger.info("wrote %d samples into %d shard(s) at %s", total, shardIdx + 1, output)
    return total
