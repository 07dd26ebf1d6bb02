"""Datasets: image folders and webdataset-style tar shards.

Parity with reference `mcquic/data/dataset.py` (`Basic` folder dataset,
`:67-123`) and the webdataset shard pipeline (`data/__init__.py:96-151`) —
implemented without the webdataset dependency: tar shards with
`{key}.{jpg,png}` members, glob patterns (brace-free), shard shuffling,
per-host shard splitting (`split_by_node` equivalent), sample shuffling with
a bounded buffer, and random-resized-crop decoding.
"""
import glob
import io
import random
import tarfile
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def listImages(root) -> List[Path]:
    root = Path(root)
    return sorted(p for p in root.rglob("*") if p.suffix.lower() in IMG_EXTENSIONS)


def _decodeImage(data: bytes) -> Optional[np.ndarray]:
    from PIL import Image
    try:
        img = Image.open(io.BytesIO(data))
        img = img.convert("RGB")
        return np.asarray(img)
    except Exception:
        return None


def randomResizedCrop(rng: random.Random, img: np.ndarray, size: int,
                      scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)) -> np.ndarray:
    """Torchvision-style RandomResizedCrop on numpy HWC, PIL for resize."""
    from PIL import Image
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        targetArea = area * rng.uniform(*scale)
        logRatio = (np.log(ratio[0]), np.log(ratio[1]))
        aspect = np.exp(rng.uniform(*logRatio))
        cw = int(round(np.sqrt(targetArea * aspect)))
        ch = int(round(np.sqrt(targetArea / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = rng.randint(0, h - ch)
            left = rng.randint(0, w - cw)
            crop = img[top:top + ch, left:left + cw]
            return np.asarray(Image.fromarray(crop).resize((size, size), Image.BILINEAR))
    # fallback: center crop of the short side
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    crop = img[top:top + s, left:left + s]
    return np.asarray(Image.fromarray(crop).resize((size, size), Image.BILINEAR))


class BasicFolder:
    """Folder-of-images dataset (reference dataset.py:67-123)."""

    def __init__(self, root):
        self._files = listImages(root)
        if not self._files:
            raise FileNotFoundError(f"No images under {root}")

    def __len__(self):
        return len(self._files)

    def __getitem__(self, idx) -> np.ndarray:
        img = _decodeImage(Path(self._files[idx]).read_bytes())
        if img is None:
            raise RuntimeError(f"Cannot decode {self._files[idx]}")
        return img

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class TarShards:
    """Iterate `{key}.{ext}` samples from tar shards (webdataset layout)."""

    def __init__(self, pattern: str, hostId: int = 0, hostCount: int = 1,
                 shuffleShards: bool = True, seed: int = 0):
        if isinstance(pattern, (list, tuple)):
            shards = [str(p) for p in pattern]
        else:
            shards = sorted(glob.glob(str(pattern)))
        if not shards:
            raise FileNotFoundError(f"No shards match {pattern}")
        # per-host split (wds.split_by_node, reference data/__init__.py:132)
        self._shards = shards[hostId::hostCount]
        self._shuffle = shuffleShards
        self._seed = seed
        self._epoch = 0

    def __iter__(self) -> Iterator[np.ndarray]:
        shards = list(self._shards)
        if self._shuffle:
            random.Random(self._seed + self._epoch).shuffle(shards)
        self._epoch += 1
        for shard in shards:
            mode = "r:gz" if shard.endswith(".gz") else "r"
            try:
                with tarfile.open(shard, mode) as tf:
                    for member in tf:
                        if not member.isfile():
                            continue
                        suffix = Path(member.name).suffix.lower()
                        if suffix not in IMG_EXTENSIONS:
                            continue
                        data = tf.extractfile(member).read()
                        img = _decodeImage(data)
                        if img is not None:
                            yield img
            except (tarfile.TarError, OSError):
                continue


def shuffled(iterable, bufferSize: int = 500, seed: int = 0):
    """Bounded-buffer shuffle (wds .shuffle(500), data/__init__.py:134)."""
    rng = random.Random(seed)
    buf = []
    for item in iterable:
        if len(buf) < bufferSize:
            buf.append(item)
            continue
        idx = rng.randrange(bufferSize)
        yield buf[idx]
        buf[idx] = item
    rng.shuffle(buf)
    yield from buf


def batched(iterable, batchSize: int):
    buf = []
    for item in iterable:
        buf.append(item)
        if len(buf) == batchSize:
            yield np.stack(buf)
            buf = []
