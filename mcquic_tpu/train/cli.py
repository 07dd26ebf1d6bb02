"""Train CLI backend.

Parity with reference `mcquic/train/cli.py:24-49` + `train/ddp.py:90-163`:
deserialize yaml, auto-resume from `saveDir/latest/saved.ckpt` if present,
import user `externalLib` plugin files into the registries, build the
trainer, and run. The torchrun/NCCL world bootstrap is replaced by a JAX
mesh (single-program SPMD); multi-host launch uses `jax.distributed` outside
this function.
"""
import importlib.util
import logging
import sys
from pathlib import Path

from mcquic_tpu.config import Config
from mcquic_tpu.data import getTrainLoader
from mcquic_tpu.train.trainer import Trainer

logger = logging.getLogger("mcquic_tpu.train")


def registerExternal(paths):
    """Import user python files to extend registries (reference ddp.py:40-50)."""
    for p in paths:
        p = Path(p)
        spec = importlib.util.spec_from_file_location(p.stem, p)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[p.stem] = mod
        spec.loader.exec_module(mod)
        logger.info("registered external lib %s", p)


def _maybeInitDistributed():
    """Multi-host bootstrap (scripts/multinode.sh; the reference's torchrun
    rendezvous, multinode.sh:22-30). MCQUIC_MULTIHOST=auto uses the Cloud-TPU
    metadata path; explicit MCQUIC_COORDINATOR drives any cluster."""
    import os
    if os.environ.get("MCQUIC_MULTIHOST", "").lower() == "auto":
        import jax
        jax.distributed.initialize()
        return True
    coordinator = os.environ.get("MCQUIC_COORDINATOR")
    if coordinator:
        import jax
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ["MCQUIC_NUM_PROCESSES"]),
            process_id=int(os.environ["MCQUIC_PROCESS_ID"]))
        return True
    return False


def main(configPath, resume: bool = False, gen: bool = False):
    multihost = _maybeInitDistributed()
    config = Config.load(str(configPath))
    train = config.Train
    registerExternal(train.ExternalLib)

    if gen:
        from mcquic_tpu.train.genTrainer import GenTrainer
        trainer = GenTrainer(config)
    else:
        trainer = Trainer(config)

    # Auto-resume (reference train/cli.py:31-39): the trainer's Saver has
    # already rotated a pre-existing `latest/` into a timestamped dir, so
    # probing `latest/` here would always miss — tryResume() follows the
    # rotation and is a no-op when there is nothing to resume.
    if trainer.tryResume():
        logger.info("auto-resumed training from %s", train.SaveDir)

    # batchSize is per data-parallel shard (reference semantics: per GPU);
    # each process loads only ITS slice of the global batch — the trainer
    # assembles the global array from per-process local data.
    hostId, hostCount = 0, 1
    if multihost:
        import jax
        hostId, hostCount = jax.process_index(), jax.process_count()
    globalBatch = train.BatchSize * trainer.dataParallelSize
    localBatch = max(globalBatch // hostCount, 1)
    if gen:
        # class-conditional loader: (images, labels) from an imagenet-style
        # folder or wnid-keyed shards (reference gen path,
        # data/__init__.py:109-122)
        from mcquic_tpu.data.imagenet_classes import getGenLoader
        loaderFn = getGenLoader(train.TrainSet, localBatch, cropSize=256,
                                hostId=hostId, hostCount=hostCount)
        trainer.train(loaderFn)
    else:
        loaderFn = getTrainLoader(train.TrainSet, localBatch,
                                  cropSize=trainer.inputSize,
                                  hostId=hostId, hostCount=hostCount)
        # Real-coder validation every ValFreq + best-ckpt saving
        # (reference trainer.py:355-362, 519-529).
        valLoader = None
        if train.ValSet and Path(train.ValSet).exists():
            from mcquic_tpu.data import getValLoader
            valLoader = getValLoader(train.ValSet)
        else:
            logger.warning("valSet %r not found: training without validation",
                           train.ValSet)
        trainer.train(loaderFn, valLoader=valLoader)
    return trainer
