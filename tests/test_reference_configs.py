"""Every yaml the reference ships must load through our Config and resolve to
a constructible model — the switchover contract for reference users.
(The reference ignores the stage-1 model key and always builds Neon,
ddp.py:79-83; its configs say "Compressor" with Neon geometry.)"""
import glob
import os

import pytest

import mcquic_tpu.models  # noqa: F401  (populate registries)
import mcquic_tpu.models.generator  # noqa: F401
import mcquic_tpu.models.generator_var  # noqa: F401
from mcquic_tpu.config import Config
from mcquic_tpu.train.trainer import resolveStage1Model
from mcquic_tpu.utils.registry import GeneratorRegistry, ModelRegistry

REF_CONFIGS = sorted(p for p in glob.glob(
    "/root/reference/configs/**/*.yaml", recursive=True) if "schema" not in p)

pytestmark = pytest.mark.skipif(not REF_CONFIGS,
                                reason="reference configs unavailable")


@pytest.mark.parametrize("path", REF_CONFIGS,
                         ids=[p.split("configs/")[-1] for p in REF_CONFIGS])
def test_reference_yaml_loads_and_model_resolves(path):
    cfg = Config.load(path)
    key = cfg.Model.Key
    assert cfg.Train.TotalStep > 0 or cfg.Train.Epoch > 0
    if key in GeneratorRegistry:
        # stage-2 config: the generator must construct from the declared
        # params, dropping what the class doesn't take — the reference ctors
        # swallow extras via catch-alls (loadFrom resolves at train time)
        import dataclasses
        cls = GeneratorRegistry.get(key)
        known = {f.name for f in dataclasses.fields(cls)}
        params = {kk: (tuple(vv) if isinstance(vv, (list, tuple)) else vv)
                  for kk, vv in cfg.Model.Params.items()
                  if kk in known and kk != "loadFrom"}
        module = cls(**params)
        assert module is not None
        return
    key, params = resolveStage1Model(cfg)
    module = ModelRegistry.get(key)(**params)
    # flax construction is lazy, so assert field types actually normalized
    # (legacy configs carry list-valued m/k that would blow up at init time)
    if key == "Compressor":
        assert isinstance(module.m, int), module.m
    else:
        assert isinstance(module.k, int), module.k
        assert all(isinstance(s, int) for s in module.size)


def test_stage1_neon_geometry_under_compressor_key(tmp_path):
    """The trainer mirrors the reference's key-ignoring stage-1 dispatch."""
    from mcquic_tpu.models.compressor import Neon
    from mcquic_tpu.train.trainer import Trainer

    cfg = Config.deserialize({
        "model": {"key": "Compressor",
                  "params": {"channel": 8, "k": 16, "size": [2, 1, 1]}},
        "train": {
            "totalStep": 1, "batchSize": 1, "epoch": 1, "valFreq": 10,
            "trainSet": "unused", "valSet": "unused",
            "saveDir": str(tmp_path / "saved"), "target": "PSNR",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "Placeholder", "params": {}},
            "gpu": {"gpus": 8},
        },
    })
    trainer = Trainer(cfg, lpipsFn=False, inputShape=(16, 16))
    assert isinstance(trainer.module, Neon)
