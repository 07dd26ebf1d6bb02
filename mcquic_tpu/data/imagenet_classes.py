"""ImageNet-1k class indexing utilities.

Parity with reference `mcquic/data/imagenet_classes.py` (wnid→label tables
used to map HF webdataset labels to class ids, data/__init__.py:81-93): here
class ids are derived structurally — the sorted order of the 1000 WordNet ids
is the canonical ImageNet-1k index, so a label mapping needs no hard-coded
table. Human-readable label text, when needed, is loaded from a user-supplied
`imagenet_classes.json` ({wnid: label}) next to the dataset.
"""
import json
import re
from pathlib import Path
from typing import Dict, List, Optional

_WNID = re.compile(r"^n\d{8}$")


def classIndexFromWnids(wnids) -> Dict[str, int]:
    """Sorted-wnid -> class id (the canonical ImageNet-1k ordering)."""
    uniq = sorted(set(wnids))
    return {w: i for i, w in enumerate(uniq)}


def folderClassIndex(root) -> Dict[str, int]:
    """Class index for an imagenet-style folder (root/wnid/*.JPEG)."""
    root = Path(root)
    wnids = [d.name for d in root.iterdir() if d.is_dir() and _WNID.match(d.name)]
    if not wnids:
        # fall back to any directory-per-class layout
        wnids = [d.name for d in root.iterdir() if d.is_dir()]
    return classIndexFromWnids(wnids)


def loadLabelText(path) -> Optional[Dict[str, str]]:
    p = Path(path)
    if not p.exists():
        return None
    return json.loads(p.read_text())


def shardClassIndex(pattern: str) -> Dict[str, int]:
    """Class index for wnid-keyed webdataset shards (reference derives the
    label from `__key__.split('_')[0]`, data/__init__.py:89). A `classes.json`
    sidecar (list of wnids, or {wnid: label}) next to the shards defines the
    full class set; otherwise one scan over the shard members collects it."""
    import glob as _glob
    import tarfile

    shards = sorted(_glob.glob(str(pattern)))
    if not shards:
        raise FileNotFoundError(f"No shards match {pattern}")
    sidecar = Path(shards[0]).parent / "classes.json"
    if sidecar.exists():
        loaded = json.loads(sidecar.read_text())
        wnids = list(loaded.keys()) if isinstance(loaded, dict) else list(loaded)
        return classIndexFromWnids(wnids)
    wnids = set()
    for shard in shards:
        mode = "r:gz" if shard.endswith(".gz") else "r"
        with tarfile.open(shard, mode) as tf:
            for member in tf:
                stem = Path(member.name).stem
                wnid = stem.split("_")[0]
                if _WNID.match(wnid):
                    wnids.add(wnid)
    if not wnids:
        raise FileNotFoundError(f"No wnid-keyed samples in {pattern}")
    return classIndexFromWnids(wnids)


def _genShardLoader(pattern: str, batchSize: int, cropSize: int,
                    hostId: int, hostCount: int, seed: int):
    """Stream (image, label) batches from wnid-keyed tar shards (the
    reference's HF-webdataset gen path, data/__init__.py:109-122)."""
    import glob as _glob
    import random
    import tarfile

    import numpy as np

    from mcquic_tpu.data.dataset import (IMG_EXTENSIONS, _decodeImage,
                                         randomResizedCrop, shuffled)

    index = shardClassIndex(pattern)
    allShards = sorted(_glob.glob(str(pattern)))[hostId::hostCount]
    if not allShards:
        raise FileNotFoundError(f"No shards for host {hostId} in {pattern}")
    epochBox = [0]

    def loaderFn():
        epoch = epochBox[0]
        epochBox[0] += 1
        rng = random.Random(seed + epoch)
        shards = list(allShards)
        rng.shuffle(shards)

        def samples():
            for shard in shards:
                mode = "r:gz" if shard.endswith(".gz") else "r"
                try:
                    with tarfile.open(shard, mode) as tf:
                        for member in tf:
                            if not member.isfile():
                                continue
                            if Path(member.name).suffix.lower() not in IMG_EXTENSIONS:
                                continue
                            wnid = Path(member.name).stem.split("_")[0]
                            if wnid not in index:
                                continue
                            img = _decodeImage(tf.extractfile(member).read())
                            if img is not None:
                                yield img, index[wnid]
                except (tarfile.TarError, OSError):
                    continue

        def gen():
            imgs, lbls = [], []
            for img, cls in shuffled(samples(), 500, seed=seed + epoch):
                if img.shape[0] < cropSize // 2 or img.shape[1] < cropSize // 2:
                    continue
                imgs.append(randomResizedCrop(rng, img, cropSize))
                lbls.append(cls)
                if len(imgs) == batchSize:
                    yield np.stack(imgs), np.asarray(lbls, np.int32)
                    imgs, lbls = [], []

        return gen()

    return loaderFn


def getGenLoader(root: str, batchSize: int, cropSize: int = 256,
                 hostId: int = 0, hostCount: int = 1, seed: int = 0):
    """Loader for class-conditional generation training: yields
    (uint8 images [n,s,s,3], int32 labels [n]) from an imagenet-style folder
    OR wnid-keyed webdataset tar shards (glob / .tar path — the reference gen
    path streams HF webdataset, data/__init__.py:109-122)."""
    import random

    import numpy as np

    from mcquic_tpu.data.dataset import IMG_EXTENSIONS, _decodeImage, randomResizedCrop

    rootS = str(root)
    if any(ch in rootS for ch in "*?[") or rootS.endswith((".tar", ".tar.gz")):
        return _genShardLoader(rootS, batchSize, cropSize, hostId, hostCount, seed)
    rootP = Path(root)
    index = folderClassIndex(rootP)
    files: List = []
    for wnid, cls in index.items():
        for f in (rootP / wnid).rglob("*"):
            if f.suffix.lower() in IMG_EXTENSIONS:
                files.append((f, cls))
    files = files[hostId::hostCount]
    if not files:
        raise FileNotFoundError(f"No class-labeled images under {root}")
    epochBox = [0]

    def loaderFn():
        epoch = epochBox[0]
        epochBox[0] += 1
        rng = random.Random(seed + epoch)
        order = list(range(len(files)))
        rng.shuffle(order)

        def gen():
            imgs, lbls = [], []
            for idx in order:
                path, cls = files[idx]
                img = _decodeImage(path.read_bytes())
                if img is None or img.shape[0] < cropSize // 2 or img.shape[1] < cropSize // 2:
                    continue
                imgs.append(randomResizedCrop(rng, img, cropSize))
                lbls.append(cls)
                if len(imgs) == batchSize:
                    yield np.stack(imgs), np.asarray(lbls, np.int32)
                    imgs, lbls = [], []

        return gen()

    return loaderFn
