"""Optimizer factories (optax).

Parity with reference `mcquic/train/ddp.py:53-76` builtin registrations:
Adam, AdamW, SGD, and LAMB (TPU-native replacement for Apex `FusedLAMB` —
optax's LAMB is XLA-fused on TPU, so "fused" comes for free).

Each factory takes a step->lr schedule plus reference-style kwargs and
returns an optax.GradientTransformation.
"""
import optax

from mcquic_tpu.utils.registry import OptimizerRegistry


def _common(schedule, maker):
    return maker(schedule)


@OptimizerRegistry.register(key="Adam")
def adam(schedule, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_):
    if weight_decay:
        return optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    return optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)


@OptimizerRegistry.register(key="AdamW")
def adamw(schedule, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2, **_):
    return optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)


@OptimizerRegistry.register(key="SGD")
def sgd(schedule, momentum=0.0, nesterov=False, weight_decay=0.0, **_):
    tx = optax.sgd(schedule, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@OptimizerRegistry.register(key="Lamb")
@OptimizerRegistry.register(key="FusedLAMB")
def lamb(schedule, betas=(0.9, 0.999), eps=1e-6, weight_decay=0.0, **_):
    return optax.lamb(schedule, b1=betas[0], b2=betas[1], eps=eps,
                      weight_decay=weight_decay)


def getOptimizer(key: str, schedule, params: dict) -> optax.GradientTransformation:
    params = {k: v for k, v in params.items() if k != "lr"}
    # reference configs may carry apex-only flags
    params.pop("use_nvlamb", None)
    return OptimizerRegistry.get(key)(schedule, **params)
