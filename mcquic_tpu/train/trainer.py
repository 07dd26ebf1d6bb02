"""Training runtime: SPMD trainer with hooks, checkpointing, validation.

Parity with reference `mcquic/train/trainer.py` (stage-1 `_baseTrainer`/
`MainTrainer`) re-architected for single-program SPMD:
  * one jitted train step over a ('data','model') mesh — replaces process-
    per-GPU + ShardedDDP + OSS (trainer.py:67-106),
  * loss `0.5*distortion + 0.5*mse + 2*lpips`, grad clip 4.0 (trainer.py:276-283),
  * periodic save every valFreq//10, validation every valFreq (trainer.py:355-362),
  * CodebookReassign hook via `refreshCodebooks` (hooks.py:100-121),
  * NaN crash guard (trainer.py:434-437),
  * auto-resume from `latest/saved.ckpt` (train/cli.py:31-39),
  * seed-3407 determinism culture (train/utils.py:332-335) via explicit keys.
"""
import logging
import math
import time
from pathlib import Path
from functools import partial
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

import mcquic_tpu.models  # noqa: F401  (populates ModelRegistry)
from mcquic_tpu.config import Config
from mcquic_tpu.loss import LossRegistry
from mcquic_tpu.parallel import batchSharding, makeMesh, replicated, zeroShardings
from mcquic_tpu.train.lrSchedulers import getSchedule
from mcquic_tpu.train.optim import getOptimizer
from mcquic_tpu.train.saver import Saver
from mcquic_tpu.train.state import TrainState, codeUsage, makeTrainStep, refreshCodebooks
from mcquic_tpu.utils.registry import ModelRegistry

logger = logging.getLogger("mcquic_tpu.train")

SEED = 3407  # reference train/utils.py:332


class Trainer:
    def __init__(self, config: Config, module=None, lpipsFn: Optional[Callable] = None,
                 mesh=None, inputShape=None, ckptBackend: Optional[str] = None):
        self._config = config
        self._mesh = mesh if mesh is not None else makeMesh()
        train = config.Train

        if module is None:
            key, params = resolveStage1Model(config)
            module = ModelRegistry.get(key)(**params)
        self._module = module
        if inputShape is None:
            if train.CropSize:
                edge = train.CropSize
            else:
                # Neon-family tokenizers fix their input: 3 stride-2 stages to
                # the latent (= size[0]*2), whose first pyramid level halves it
                # — so input = size[0]*16 (e.g. the 17-level size[0]=16 config
                # trains on 256^2 crops, reference configs/a800_8.yaml). v1
                # Compressor has no size list and keeps the reference 512^2 crop.
                sizeList = getattr(module, "size", None)
                edge = int(sizeList[0]) * 16 if sizeList else 512
            inputShape = (edge, edge)
        self._inputShape = tuple(inputShape)

        worldSize = int(np.prod(list(self._mesh.shape.values())))
        optimCfg = train.scaledOptim(worldSize)
        baseLr = optimCfg.Params.get("lr", 1e-4)
        schedule = getSchedule(train.Schdr.Key, baseLr, train.Schdr.Params)
        self._tx = getOptimizer(optimCfg.Key, schedule, optimCfg.Params)
        self._schedule = schedule

        if lpipsFn is None:
            # Auto-assemble the 2x-weighted perceptual term when its weights
            # are locatable; loud one-time warning otherwise (reference
            # trainer.py:276, compound.py:35-42).
            from mcquic_tpu.loss.lpips import makeDefaultLpipsFn
            lpipsFn = makeDefaultLpipsFn()
        elif lpipsFn is False:  # explicit opt-out (tests / stage-2 handoff)
            lpipsFn = None
        distortion = LossRegistry.get(train.Target)()
        self._distortion = distortion
        self._stepFn = makeTrainStep(module, self._tx, distortion, lpipsFn)

        # --- init state (replicated params; ZeRO-sharded optimizer state)
        rng = jax.random.PRNGKey(SEED)
        h, w = self._inputShape
        dummy = jnp.zeros((max(worldSize, 1), h, w, 3), jnp.float32)
        variables = module.init({"params": jax.random.PRNGKey(SEED),
                                 "gumbel": jax.random.PRNGKey(SEED + 1)},
                                dummy, train=True)
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

        self._jitStep = jax.jit(self._stepFn,
                                in_shardings=(self._stateShardings, self._batchSharding),
                                out_shardings=(self._stateShardings, None),
                                donate_argnums=(0,))

        # Saver.__init__ rotates the previous `latest/` into a timestamped dir
        # (reference train/utils.py:63-77); resume from the rotated checkpoint
        # (reference auto-resume semantics, train/cli.py:31-39).
        self._saver = Saver(train.SaveDir) if train.SaveDir else None
        self._resumePath = self._saver.PreviousCkpt if self._saver else None
        # Checkpoint backend: 'npz' (rank-0 gather, default) or 'orbax'
        # (async per-shard writes + restore-into-sharding — the multi-host
        # path; reference analogue is OSS consolidate + rank-0 save,
        # trainer.py:112-117). Select via arg or MCQUIC_CKPT_BACKEND.
        import os as _os
        backend = ckptBackend or _os.environ.get("MCQUIC_CKPT_BACKEND", "npz")
        if backend not in ("npz", "orbax"):
            raise ValueError(f"unknown ckptBackend {backend!r}")
        self._orbax = None
        if backend == "orbax" and train.SaveDir:
            from mcquic_tpu.train.orbax_saver import OrbaxSaver
            self._orbax = OrbaxSaver(train.SaveDir)
        self._bestDistortion = float("-inf")
        self._lastValExtras = {"pairs": [], "codes": None}
        from mcquic_tpu.train.hooks import getAllHooks
        self._hooks = getAllHooks(train.Hooks)  # phase -> [hook]

    def _runHooks(self, phase, step: int):
        from mcquic_tpu.train.hooks import HookType
        for hook in self._hooks.get(HookType(phase), []):
            hook(self, step)

    # ------------------------------------------------------------------ state
    @property
    def state(self) -> TrainState:
        return self._state

    @property
    def inputSize(self) -> int:
        """Square crop edge the model trains on (loader cropSize must match)."""
        return self._inputShape[0]

    @property
    def dataParallelSize(self) -> int:
        """Config batchSize is per data-parallel shard (reference: per GPU
        process); the SPMD loader must deliver batchSize * this."""
        return int(self._mesh.shape["data"])

    @property
    def totalStep(self) -> int:
        """Configured training step budget (hooks use it to avoid terminal-
        step actions that the model can never re-adapt to)."""
        return int(self._config.Train.TotalStep)

    @property
    def module(self):
        return self._module

    def variables(self):
        return {"params": jax.device_get(self._state.params),
                "coder": jax.device_get(self._state.coder)}

    # ----------------------------------------------------------------- resume
    def tryResume(self) -> bool:
        if self._orbax is not None:
            if self._orbax.latestStep() is None:
                return False
            self._state = jax.device_put(self._orbax.restore(self._state),
                                         self._stateShardings)
            logger.info("Resumed from orbax step %s", int(self._state.step))
            return True
        path = self._resumePath
        if path is None or not Path(path).exists():
            return False
        tree, meta = Saver.load(path)
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
        logger.info("Resumed from %s at step %s", path, tree["step"])
        return True

    def save(self):
        if self._orbax is not None:
            self._orbax.save(int(self._state.step), self._state)
            return
        if self._saver is None:
            return
        # optax states are namedtuples — store leaves by index and restore
        # onto the in-memory template structure on resume.
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

    # ------------------------------------------------------------------ train
    def trainStep(self, batch: np.ndarray) -> dict:
        # Preserve uint8: raw loader batches must reach the jitted step as
        # uint8 so the device-side augmentation+normalization branch fires
        # (reference GPU transform, trainer.py:266). Float inputs are assumed
        # pre-normalized to [-1,1] (test/debug path).
        batch = np.asarray(batch)
        if batch.dtype != np.uint8:
            batch = batch.astype(np.float32, copy=False)
        batch = _putBatch(batch, self._batchSharding)
        self._state, metrics = self._jitStep(self._state, batch)
        return metrics

    def train(self, loaderFn: Callable[[], Iterable], valLoader=None,
              onStep: Optional[Callable] = None, metricsLogger=None):
        train = self._config.Train
        total = train.TotalStep
        # `epoch` caps the number of loader passes; the reference declares it
        # but leaves it vestigial (trainer.py:327,457 commented) — honored
        # here so the accepted key does what it says.
        maxEpochs = max(int(getattr(train, "Epoch", 0) or 0), 0) or None
        valFreq = train.ValFreq
        # Long runs with validation disabled (valFreq huge) would otherwise
        # never checkpoint until the final step — a tunnel drop then loses
        # hours. MCQUIC_SAVE_FREQ caps the save interval independently.
        import os as _osEnv
        saveFreq = max(valFreq // 10, 1)
        envSave = _osEnv.environ.get("MCQUIC_SAVE_FREQ")
        if envSave:
            saveFreq = min(saveFreq, max(int(envSave), 1))
        if metricsLogger is None and onStep is None:
            # wandb project parity (reference trainer.py:319-344); degrades to
            # stdlib logging when wandb is unavailable.
            from mcquic_tpu.train.logging import MetricsLogger
            metricsLogger = MetricsLogger(project="mcquic-stage-1",
                                          config=self._config.serialize())
        if onStep is None:
            onStep = lambda step, m: metricsLogger.log(step, m)

        # Save-and-exit on SIGTERM (the reference carries this handler
        # commented out, trainer.py:376-390; with auto-resume it makes
        # preemption lossless).
        import signal

        def _onSigterm(signum, frame):
            logger.warning("SIGTERM: saving checkpoint before exit")
            self.save()
            raise SystemExit(143)

        try:
            prevHandler = signal.signal(signal.SIGTERM, _onSigterm)
        except ValueError:  # non-main thread
            prevHandler = None
        step = int(self._state.step)
        # Guard the schedule-vs-budget trap observed on hardware (cosine cycle
        # shorter than TotalStep after a resume trains at lr~0; NOTES.md).
        # Strict mode refuses; default warns. Runs AFTER resume so a raised
        # TotalStep on relaunch is checked against the resumed step.
        import os as _os
        from mcquic_tpu.train.lrSchedulers import checkScheduleCoversBudget
        checkScheduleCoversBudget(
            self._schedule, self._config.Train.scaledOptim(
                int(np.prod(list(self._mesh.shape.values())))).Params.get("lr", 1e-4),
            step, total, strict=_os.environ.get("MCQUIC_STRICT_SCHEDULE") == "1")
        epoch = 0
        badLogs = 0  # consecutive %100 logs with a skipped (non-finite) step
        lastLog = time.time()
        self._runHooks("beforeRun", step)
        while step < total and (maxEpochs is None or epoch < maxEpochs):
            self._runHooks("epochStart", step)
            for batch in loaderFn():
                self._runHooks("stepStart", step)
                metrics = self.trainStep(batch)
                step += 1
                if step % 100 == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    if not math.isfinite(m["loss"]):
                        # the step guard skipped this update (state stays
                        # clean) — crash only when the condition PERSISTS
                        if m.get("skipped", 0) >= 1 and badLogs < 2:
                            badLogs += 1
                            logger.warning(
                                "step %d: non-finite loss — update skipped "
                                "by the step guard (%d consecutive)",
                                step, badLogs)
                            lastLog = time.time()
                            continue
                        raise RuntimeError(f"Loss is NaN/Inf at step {step}: {m}")
                    badLogs = 0
                    m["lr"] = float(self._schedule(step))
                    m["stepsPerSec"] = 100 / (time.time() - lastLog)
                    if step % 1000 == 0:
                        # codebook-usage telemetry (reference logs CodeUsage,
                        # trainer.py:463-493)
                        m["codeUsage"] = self.codeUsage()
                    lastLog = time.time()
                    logger.info("step %d: %s", step, m)
                    if onStep is not None:
                        onStep(step, m)
                self._runHooks("stepFinish", step)
                if step % saveFreq == 0:
                    self.save()
                if valLoader is not None and step % valFreq == 0:
                    results = self.validate(valLoader)
                    logger.info("step %d validation: %s", step, results)
                    if onStep is not None:
                        onStep(step, {f"val/{k}": v for k, v in results.items()})
                    if metricsLogger is not None:
                        self._logValObservability(metricsLogger, step,
                                                  self._lastValExtras)
                    if self._saver is not None and results.get("msssim", 0) > self._bestDistortion:
                        self._bestDistortion = results["msssim"]
                        from mcquic_tpu.train.saver import saveTree
                        saveTree(self._saver.SaveDir / f"best.ckpt.npz",
                                 {"params": jax.device_get(self._state.params),
                                  "coder": jax.device_get(self._state.coder)},
                                 {"config": self._config.serialize(), "step": step})
                if step >= total:
                    break
            epoch += 1
            self._runHooks("epochFinish", step)
        self.save()
        self._runHooks("afterRun", step)
        if prevHandler is not None:
            import signal
            signal.signal(signal.SIGTERM, prevHandler)
        if self._saver is not None:
            self._saver.close()  # release the saveDir lock for in-process reruns
        return self._state

    def validate(self, valLoader) -> dict:
        """Real-coder validation with current weights (reference
        trainer.py:495-529 validate-and-save-best)."""
        results, self._lastValExtras = self.validateWithExtras(valLoader)
        return results

    def validateWithExtras(self, valLoader):
        """(metrics dict, observability payload) — payload carries image
        pairs + last codes for the wandb sink (reference trainer.py:463-493)."""
        from mcquic_tpu.models.engine import CompressorEngine
        from mcquic_tpu.validate.validator import Validator
        engine = CompressorEngine(self._module, self.variables(), qp="train")
        validator = Validator(engine)
        results = validator.validate(valLoader)
        return results, validator.collected

    def _logValObservability(self, metricsLogger, step: int, extras: dict):
        """Histograms of per-level code frequency, code-map visualizations,
        and raw/restored pairs (reference trainer.py:463-493)."""
        from mcquic_tpu.validate.validator import visualizeCodeMaps
        coder = jax.device_get(self._state.coder)
        for name, freq in _freqLeaves(coder):
            metricsLogger.histogram(step, f"freq/{name}",
                                    np.asarray(freq).ravel())
        if extras.get("codes"):
            metricsLogger.images(step, "val/codeMaps",
                                 [m[0] for m in visualizeCodeMaps(extras["codes"])])
        pairs = extras.get("pairs") or []
        if pairs:
            metricsLogger.images(step, "val/raw", [p[0] for p in pairs])
            metricsLogger.images(step, "val/restored", [p[1] for p in pairs])

    def reassignCodebooks(self) -> float:
        self._state, prop = jax.jit(
            partial(refreshCodebooks, module=self._module),
            in_shardings=(self._stateShardings,),
            out_shardings=(self._stateShardings, None))(self._state)
        return float(prop)

    def codeUsage(self) -> float:
        return float(codeUsage(jax.device_get(self._state)))


def _putBatch(batch: np.ndarray, sharding):
    """Single-process: plain device_put. Multi-process: each host holds its
    LOCAL slice of the global batch; assemble the global array from the
    process-local data (device_put onto non-addressable shards would fail)."""
    if jax.process_count() > 1:
        globalShape = (batch.shape[0] * jax.process_count(), *batch.shape[1:])
        return jax.make_array_from_process_local_data(sharding, batch,
                                                      globalShape)
    return jax.device_put(jnp.asarray(batch), sharding)


def _adaptModelParams(params: dict) -> dict:
    """Map reference yaml model params to module ctor kwargs."""
    params = dict(params)
    if "size" in params:  # Neon-style
        return {k: v for k, v in params.items()
                if k in ("channel", "k", "size", "denseNorm")}
    return {k: v for k, v in params.items()
            if k in ("channel", "m", "k", "permutationRate")}


def resolveStage1Model(config) -> tuple:
    """(registry key, ctor params) for a stage-1 config, mirroring reference
    semantics: the model key is ignored when the params carry a `size`
    pyramid (the reference always builds Neon, ddp.py:79-83), and legacy
    configs' uniform list-valued `m` (e.g. neon.yaml `m: [1,1,1,1,1]`)
    normalizes to the constant int the v1 ctor takes."""
    params = _adaptModelParams(config.Model.Params)
    key = config.Model.Key
    if "size" in params:
        if key != "Neon":
            logger.info("model params carry a `size` pyramid: building Neon "
                        "(reference stage-1 semantics)")
            key = "Neon"
        params["size"] = tuple(params["size"])
        if isinstance(params.get("k"), (list, tuple)):
            params["k"] = int(params["k"][0])
    else:
        m = params.get("m")
        if isinstance(m, (list, tuple)):
            if len(set(m)) != 1:
                raise ValueError(f"per-level m {m} is not supported by the "
                                 "v1 Compressor (must be uniform)")
            params["m"] = int(m[0])
        if isinstance(params.get("k"), list):
            params["k"] = tuple(params["k"])
    return key, params


def _freqLeaves(coder: dict):
    """Flatten the coder collection into (name, [m,k] freq) pairs per level."""
    out = []

    def walk(node, prefix):
        if isinstance(node, dict):
            for key, val in node.items():
                walk(val, f"{prefix}/{key}" if prefix else str(key))
        else:
            arr = np.asarray(node)
            if arr.ndim >= 3:  # stacked [L, m, k] (Neon shared codebook)
                for lv in range(arr.shape[0]):
                    out.append((f"{prefix}/lv{lv:02d}", arr[lv]))
            else:
                out.append((prefix, arr))

    walk(coder, "")
    return out
