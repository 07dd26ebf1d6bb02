"""Stage-2 generation trainer.

Parity with reference `mcquic/train/genTrainer.py`: model is the generator
only (`:67-70`), frozen tokenizer inside, bf16 activations (autocast
equivalent: module dtype bf16 with fp32 params — no grad scaler needed on
TPU, bf16 has fp32 range), grad-clip 2.0 (`:283`), per-level CE logging
(`:418-441`), LAMB/Adam via optax, ZeRO-sharded optimizer state. The frozen
compressor subtree is excluded from optimization with optax.masked
(reference sets requires_grad_(False), generator_3_self_attn.py:156-158).
"""
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

import mcquic_tpu.models.generator  # noqa: F401  (populates GeneratorRegistry)
import mcquic_tpu.models.generator_var  # noqa: F401
from mcquic_tpu.config import Config
from mcquic_tpu.data import augment  # module scope: holds jnp constants
from mcquic_tpu.parallel import batchSharding, makeMesh, replicated, zeroShardings
from mcquic_tpu.train.lrSchedulers import getSchedule
from mcquic_tpu.train.optim import getOptimizer
from mcquic_tpu.train.saver import Saver, loadTree, upcastBf16
from mcquic_tpu.train.state import TrainState
from mcquic_tpu.utils.registry import GeneratorRegistry

logger = logging.getLogger("mcquic_tpu.train.gen")

SEED = 3407


def _trainableMask(params):
    """False for the frozen compressor subtree, True elsewhere."""
    def mark(path, leaf):
        return "compressor" not in [str(p.key) if hasattr(p, "key") else str(p)
                                    for p in path]
    return jax.tree_util.tree_map_with_path(mark, params)


def makeGenTrainStep(module, tx, clipNorm: float = 2.0):
    def stepFn(state: TrainState, images, labels):
        rng, subAug = jax.random.split(state.rng)
        if images.dtype == jnp.uint8:
            # Device-side gen transform: planckian jitter + normalize to
            # [-1,1], no flips (reference getTrainingTransform(gen=True),
            # data/transforms.py:37-43; applied at genTrainer.py:260).
            images = augment.trainingTransform(subAug, images, gen=True)

        def lossFn(params):
            (_, loss, _, _, perLevel), _ = module.apply(
                {"params": params, "coder": state.coder}, images, labels,
                train=True, mutable=["coder"])
            return loss, perLevel

        (loss, perLevel), grads = jax.value_and_grad(lossFn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, clipNorm / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, optState = tx.update(grads, state.optState, state.params)
        params = optax.apply_updates(state.params, updates)
        # Non-finite guard (same contract as stage-1 makeTrainStep): a
        # poisoned batch skips the update, state can never go NaN.
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        newState = jax.lax.cond(
            ok,
            lambda: state.replace(step=state.step + 1, params=params,
                                  optState=optState, rng=rng),
            lambda: state.replace(step=state.step + 1, rng=rng))
        metrics = {"loss": loss, "gradNorm": gnorm,
                   "skipped": 1.0 - ok.astype(jnp.float32),
                   **{f"ceLv{i:02d}": l for i, l in enumerate(perLevel)}}
        return newState, metrics

    return stepFn


def constructGenerator(key: str, params: dict):
    """Build a registered generator, dropping config params its dataclass
    doesn't take — the reference ctors swallow extras via catch-alls (e.g.
    GeneratorVAR takes no qk_norm). Shared by the trainer and the generate
    CLI so a checkpoint that trains also samples."""
    import dataclasses

    cls = GeneratorRegistry.get(key)
    known = {f.name for f in dataclasses.fields(cls)}
    dropped = sorted((set(params) - known) - {"loadFrom"})
    if dropped:
        logger.info("ignoring config params not taken by %s: %s", key, dropped)
    return cls(**{k: (tuple(v) if isinstance(v, list) else v)
                  for k, v in params.items() if k in known})


def loadCompressorParams(ckptPath, modelParams: dict = None):
    """Stage-1 checkpoint params -> generator `compressor` subtree
    (reference prefix-strip load, generator_3_self_attn.py:148-158).

    Accepts our npz exports AND reference torch trainer checkpoints: a torch
    pickle is detected, prefix-stripped (`module._compressor.`) and converted
    through utils/convert.convertNeon using the generator's declared
    channel/k/size — so `loadFrom: <reference stage-1 ckpt>` works verbatim
    for migrating users."""
    path = Path(ckptPath)
    try:
        tree, _ = loadTree(path)
        tree = upcastBf16(tree)  # frozen tokenizer runs fp32 in the trainer
        return tree["params"], tree.get("coder", {})
    except Exception as npzErr:
        from mcquic_tpu.utils.convert import convertNeon, loadTorchStateDict

        try:
            sd = loadTorchStateDict(path)
        except Exception as torchErr:
            raise ValueError(
                f"loadFrom {path} is neither a readable npz export "
                f"({npzErr!r}) nor a torch checkpoint ({torchErr!r})"
            ) from npzErr
    if not modelParams or not {"channel", "k", "size"} <= set(modelParams):
        raise ValueError(
            "loadFrom points at a torch checkpoint; converting it needs the "
            "generator config's channel/k/size to rebuild the Neon geometry")
    variables = convertNeon(sd, int(modelParams["channel"]),
                            int(modelParams["k"]), list(modelParams["size"]),
                            bool(modelParams.get("denseNorm", False)))
    logger.info("converted reference torch stage-1 checkpoint %s", path)
    return variables["params"], variables.get("coder", {})


class GenTrainer:
    def __init__(self, config: Config, module=None, mesh=None, imageSize: int = 256):
        self._config = config
        self._mesh = mesh if mesh is not None else makeMesh()
        train = config.Train
        params = dict(config.Model.Params)
        loadFrom = params.pop("loadFrom", None)

        if module is None:
            module = constructGenerator(config.Model.Key, params)
        self._module = module

        worldSize = int(np.prod(list(self._mesh.shape.values())))
        optimCfg = train.scaledOptim(worldSize)
        baseLr = optimCfg.Params.get("lr", 1e-4)
        schedule = getSchedule(train.Schdr.Key, baseLr, train.Schdr.Params)

        inner = getOptimizer(optimCfg.Key, schedule, optimCfg.Params)
        # LAMB growth-bound guard (found on hardware, round 4): LAMB's trust
        # ratio caps each layer's update norm at lr*||w||, so tiny-init
        # layers (the VAR-style logits head) grow at most by e^(lr*steps)
        # over the run — the reference's a800_gen_16.yaml survives on
        # 25k steps x 8 workers; a short single-chip run sits at uniform CE
        # for its whole budget (scripts/gen_overfit_probe.py; the executed
        # 3,200-step control run in docs/RD_RESULTS_r04.md §2). Warn loudly
        # when the budget cannot grow small-init layers by even e^2.
        if optimCfg.Key in ("Lamb", "FusedLAMB") and baseLr * train.TotalStep < 2.0:
            logger.warning(
                "optimizer %s with lr*totalStep = %.3g < 2: LAMB's trust "
                "ratio grows small-init layers only ~e^(lr*steps) (x%.2f "
                "over this run) — the logits head may stay at uniform CE "
                "for the whole budget. Use Adam at this scale, raise lr, "
                "or extend totalStep (docs/RD_RESULTS_r04.md §2).",
                optimCfg.Key, baseLr * train.TotalStep,
                float(np.exp(baseLr * train.TotalStep)))

        rng = jax.random.PRNGKey(SEED)
        dummyImg = jnp.zeros((max(worldSize, 1), imageSize, imageSize, 3), jnp.float32)
        dummyLbl = jnp.zeros((max(worldSize, 1),), jnp.int32)
        variables = module.init({"params": jax.random.PRNGKey(SEED),
                                 "gumbel": jax.random.PRNGKey(SEED + 1)},
                                dummyImg, dummyLbl, train=True)
        variables = dict(variables)

        if loadFrom:
            cParams, cCoder = loadCompressorParams(loadFrom, params)
            newParams = dict(variables["params"])
            newParams["compressor"] = cParams
            variables["params"] = newParams
            if cCoder:
                newCoder = dict(variables.get("coder", {}))
                newCoder["compressor"] = cCoder
                variables["coder"] = newCoder
            logger.info("loaded frozen compressor from %s", loadFrom)

        self._tx = optax.masked(inner, _trainableMask(variables["params"]))
        state = TrainState.create(variables, self._tx, rng)

        rep = replicated(self._mesh)
        self._stateShardings = TrainState(
            step=rep,
            params=jax.tree_util.tree_map(lambda _: rep, state.params),
            coder=jax.tree_util.tree_map(lambda _: rep, state.coder),
            optState=zeroShardings(self._mesh, state.optState),
            rng=rep)
        self._batchSharding = batchSharding(self._mesh)
        self._state = jax.device_put(state, self._stateShardings)

        stepFn = makeGenTrainStep(module, self._tx)
        self._jitStep = jax.jit(stepFn,
                                in_shardings=(self._stateShardings,
                                              self._batchSharding, self._batchSharding),
                                out_shardings=(self._stateShardings, None),
                                donate_argnums=(0,))

        self._saver = Saver(train.SaveDir) if train.SaveDir else None
        self._resumePath = self._saver.PreviousCkpt if self._saver else None
        self._schedule = schedule
        from mcquic_tpu.train.hooks import getAllHooks
        self._hooks = getAllHooks(train.Hooks)  # phase -> [hook]

    def _runHooks(self, phase, step: int):
        from mcquic_tpu.train.hooks import HookType
        for hook in self._hooks.get(HookType(phase), []):
            hook(self, step)

    @property
    def state(self):
        return self._state

    @property
    def dataParallelSize(self) -> int:
        return int(self._mesh.shape["data"])

    @property
    def module(self):
        return self._module

    def trainStep(self, images: np.ndarray, labels: np.ndarray) -> dict:
        from mcquic_tpu.train.trainer import _putBatch
        images = _putBatch(np.asarray(images), self._batchSharding)
        labels = _putBatch(np.asarray(labels, np.int32), self._batchSharding)
        self._state, metrics = self._jitStep(self._state, images, labels)
        return metrics

    def save(self):
        if self._saver is None:
            return
        optLeaves = jax.tree_util.tree_leaves(jax.device_get(self._state.optState))
        tree = {"step": np.asarray(self._state.step),
                "params": jax.device_get(self._state.params),
                "coder": jax.device_get(self._state.coder),
                "optState": {f"{i:05d}": np.asarray(l) for i, l in enumerate(optLeaves)},
                "rng": np.asarray(self._state.rng)}
        self._saver.save(tree, {"config": self._config.serialize()})

    def close(self):
        """Release the saveDir lock (Saver refuses a second live in-process
        holder; run() releases on exit — callers driving trainStep/save
        directly must close() before constructing a successor)."""
        if self._saver is not None:
            self._saver.close()

    def tryResume(self) -> bool:
        path = self._resumePath
        if path is None or not Path(path).exists():
            return False
        tree, _ = Saver.load(path)
        optLeaves = [tree["optState"][k] for k in sorted(tree["optState"])]
        tDef = jax.tree_util.tree_structure(self._state.optState)
        if tDef.num_leaves != len(optLeaves):
            raise ValueError("optimizer state layout changed; cannot resume")
        self._state = self._state.replace(
            step=jnp.asarray(tree["step"], jnp.int32),
            params=tree["params"], coder=tree["coder"],
            optState=jax.tree_util.tree_unflatten(tDef, optLeaves),
            rng=jnp.asarray(tree["rng"], jnp.uint32))
        self._state = jax.device_put(self._state, self._stateShardings)
        return True

    def train(self, loaderFn, onStep=None):
        train = self._config.Train
        total = train.TotalStep
        saveFreq = max(train.ValFreq // 10, 1)
        # Same crash insurance as Trainer.train: cap the save interval when
        # validation is disabled (see MCQUIC_SAVE_FREQ there).
        import os as _osEnv
        envSave = _osEnv.environ.get("MCQUIC_SAVE_FREQ")
        if envSave:
            saveFreq = min(saveFreq, max(int(envSave), 1))
        step = int(self._state.step)
        import math as _math
        import time as _time
        lastLog = _time.time()
        badLogs = 0
        self._runHooks("beforeRun", step)
        while step < total:
            self._runHooks("epochStart", step)
            for images, labels in loaderFn():
                self._runHooks("stepStart", step)
                metrics = self.trainStep(images, labels)
                step += 1
                self._runHooks("stepFinish", step)
                if step % 100 == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    if not _math.isfinite(m["loss"]):
                        if m.get("skipped", 0) >= 1 and badLogs < 2:
                            badLogs += 1
                            logger.warning(
                                "step %d: non-finite loss — update skipped "
                                "by the step guard (%d consecutive)",
                                step, badLogs)
                            lastLog = _time.time()
                            continue
                        raise RuntimeError(f"Loss is NaN/Inf at step {step}: {m}")
                    badLogs = 0
                    m["stepsPerSec"] = 100 / (_time.time() - lastLog)
                    lastLog = _time.time()
                    logger.info("step %d: %s", step, m)
                    if onStep is not None:
                        onStep(step, m)
                if step % saveFreq == 0:
                    self.save()
                if step >= total:
                    break
            self._runHooks("epochFinish", step)
        self.save()
        self._runHooks("afterRun", step)
        if self._saver is not None:
            self._saver.close()  # release the saveDir lock for in-process reruns
        return self._state
