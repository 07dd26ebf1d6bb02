"""Data loaders.

Parity with reference `mcquic/data/__init__.py`:
  * `getTrainLoader` (`:96-151`): shard pipeline — shard split by host,
    shard+sample shuffle, random-resized-crop to cropSize, batch; yields
    uint8 NHWC numpy batches (device-side augmentation happens in the train
    step via data.augment.trainingTransform).
  * `getValLoader` (`:154-170`): folder dataset, batch 1, aligned crop.
A background prefetch thread stands in for torch DataLoader workers.
"""
import queue
import random
import threading
from typing import Iterable, Iterator

from mcquic_tpu.data.dataset import (BasicFolder, TarShards, batched,
                                     randomResizedCrop, shuffled)
from mcquic_tpu.data.transforms import alignedCrop


def prefetched(gen: Iterable, depth: int = 4) -> Iterator:
    """Run the generator in a background thread with a bounded queue."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    DONE = object()

    def worker():
        try:
            for item in gen:
                q.put(item)
        finally:
            q.put(DONE)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is DONE:
            break
        yield item


def getTrainLoader(pattern: str, batchSize: int, cropSize: int = 512,
                   hostId: int = 0, hostCount: int = 1, seed: int = 0,
                   shuffleBuffer: int = 500, prefetch: int = 4):
    """Returns a zero-arg callable producing a fresh epoch iterator
    (the reference recreates the wds loader each epoch, trainer.py:258-262)."""
    epochBox = [0]

    def loaderFn():
        epoch = epochBox[0]
        epochBox[0] += 1
        rng = random.Random(seed + epoch)

        def samples():
            src = str(pattern)
            if any(ch in src for ch in "*?[") or src.endswith((".tar", ".tar.gz")):
                it = TarShards(src, hostId=hostId, hostCount=hostCount, seed=seed + epoch)
            else:
                it = BasicFolder(src)
            for img in shuffled(iter(it), shuffleBuffer, seed=seed + epoch):
                if img.shape[0] < 64 or img.shape[1] < 64:
                    continue
                yield randomResizedCrop(rng, img, cropSize)

        return prefetched(batched(samples(), batchSize), depth=prefetch)

    return loaderFn


def getValLoader(path: str, base: int = 256):
    """Batch-1 eval loader with aligned crop (data/__init__.py:154-170).

    Images smaller than `base` would aligned-crop to zero pixels; they are
    skipped with a warning instead of silently producing empty tensors."""
    import logging

    def gen():
        ds = BasicFolder(path)
        for i, img in enumerate(ds):
            if img.shape[0] < base or img.shape[1] < base:
                logging.getLogger("mcquic_tpu.data").warning(
                    "val image %s is smaller than the %dpx aligned crop; skipped",
                    ds._files[i], base)
                continue
            cropped = alignedCrop(img, base)
            name = str(ds._files[i].stem)
            yield cropped[None], name

    return gen
