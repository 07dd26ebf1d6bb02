"""Functional training state + the SPMD train step.

TPU-native replacement for the reference trainer internals
(`mcquic/train/trainer.py:67-305`): one jitted step carries
forward + loss (0.5*distortion + 0.5*mse + 2*lpips, trainer.py:276),
grad-clip 4.0 (trainer.py:280), optimizer update, and the in-graph freqEMA
update that the reference does via `dist.all_reduce` inside the entropy coder
(entropyCoder.py:306-322) — here it is just a global sum under GSPMD.
"""
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

# Imported at module scope on purpose: augment holds module-level jnp
# constants (the planckian table); importing it lazily inside a jitted step
# would create those constants as tracers and leak them across traces.
from mcquic_tpu.data import augment
from mcquic_tpu.ops.vq import reassignCodebook


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    coder: Any                    # freqEMA collection
    optState: Any
    rng: jnp.ndarray

    @classmethod
    def create(cls, variables, tx, rng):
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   coder=variables.get("coder", {}), optState=tx.init(params), rng=rng)


def makeTrainStep(module, tx: optax.GradientTransformation,
                  distortionFn: Callable, lpipsFn: Optional[Callable] = None,
                  clipNorm: float = 4.0,
                  distortionWeight: float = 0.5, mseWeight: float = 0.5,
                  lpipsWeight: float = 2.0):
    """Build the pure (state, batch) -> (state, metrics) step."""

    def stepFn(state: TrainState, batch: jnp.ndarray):
        rng, sub, subAug = jax.random.split(state.rng, 3)
        if batch.dtype == jnp.uint8:
            # Device-side augmentation (reference runs these on GPU,
            # trainer.py:266): planckian jitter + flips + normalize.
            batch = augment.trainingTransform(subAug, batch)

        def lossFn(params):
            (xHat, yHat, codes, logits), mut = module.apply(
                {"params": params, "coder": state.coder}, batch, train=True,
                rngs={"gumbel": sub}, mutable=["coder"])
            distortion = distortionFn(xHat, batch, codes, logits)
            mse = jnp.mean((xHat - batch) ** 2)
            lpips = lpipsFn(xHat, batch) if lpipsFn is not None else jnp.asarray(0.0)
            loss = distortionWeight * distortion + mseWeight * mse + lpipsWeight * lpips
            return loss, (mut["coder"], distortion, mse, lpips)

        (loss, (newCoder, distortion, mse, lpips)), grads = jax.value_and_grad(
            lossFn, has_aux=True)(state.params)

        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, clipNorm / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

        updates, optState = tx.update(grads, state.optState, state.params)
        params = optax.apply_updates(state.params, updates)

        # Non-finite guard: a single poisoned batch (inf/NaN loss or grads)
        # SKIPS the whole update — params/coder/optState stay untouched, so
        # the state can never be poisoned; only rng/step advance. The
        # reference crashes outright (trainer.py:434-437); here the trainer
        # crashes only on PERSISTENT skips (preemption-safe production
        # behavior on long unattended runs).
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        newState = jax.lax.cond(
            ok,
            lambda: state.replace(step=state.step + 1, params=params,
                                  coder=newCoder, optState=optState, rng=rng),
            lambda: state.replace(step=state.step + 1, rng=rng))
        metrics = {"loss": loss, "distortion": distortion, "mse": mse,
                   "lpips": lpips, "gradNorm": gnorm,
                   "skipped": 1.0 - ok.astype(jnp.float32)}
        return newState, metrics

    return stepFn


def refreshCodebooks(state: TrainState, module) -> Tuple[TrainState, jnp.ndarray]:
    """Dead-code reassignment over every codebook (reference Compound.refresh,
    compound.py:52-58 + quantizer reAssignCodebook semantics).

    Runs identically on all hosts from the replicated freqEMA — no broadcast.
    """
    params = state.params
    coder = state.coder
    qParams = dict(params["_quantizer"])
    qCoder = coder["_quantizer"]
    rng, sub = jax.random.split(state.rng)

    props = []
    if "codebook" in qParams:  # shared-codebook (Neon): freqEMA [L, m, k]
        freq = qCoder["freqEMA"]
        # all levels share one codebook: use the mean frequency across levels
        # of the *normalized* tables so dead == dead at every level.
        f = freq / jnp.sum(freq, -1, keepdims=True)
        mergedFreq = jnp.mean(f, 0)
        newCb, prop = reassignCodebook(sub, qParams["codebook"], mergedFreq)
        qParams["codebook"] = newCb
        props.append(prop)
    else:  # per-level codebooks (UMGM)
        i = 0
        while f"codebook{i}" in qParams:
            freq = qCoder[f"freqEMA{i}"]
            f = freq / jnp.sum(freq, -1, keepdims=True)
            sub, use = jax.random.split(sub)
            newCb, prop = reassignCodebook(use, qParams[f"codebook{i}"], f)
            qParams[f"codebook{i}"] = newCb
            props.append(prop)
            i += 1

    newParams = dict(params)
    newParams["_quantizer"] = qParams
    return state.replace(params=newParams, rng=rng), jnp.mean(jnp.stack(props))


def codeUsage(state: TrainState, eps: float = 1e-6) -> jnp.ndarray:
    """Fraction of codewords in use (reference compressor.py:63-65)."""
    leaves = jax.tree_util.tree_leaves(state.coder)
    used = [jnp.mean(((f / jnp.sum(f, -1, keepdims=True)) > eps).astype(jnp.float32))
            for f in leaves]
    return jnp.mean(jnp.stack(used))
