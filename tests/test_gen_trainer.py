"""GenTrainer: frozen-compressor masking + one training step on the mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# heavyweight integration module: runs in the CI slow tier
pytestmark = pytest.mark.slow

from mcquic_tpu.config import Config
from mcquic_tpu.models.generator import GeneratorV3SelfAttention
from mcquic_tpu.train.genTrainer import GenTrainer


def _cfg(tmp):
    return Config.deserialize({
        "model": {"key": "GeneratorV3SelfAttention",
                  "params": {"channel": 8, "k": 16, "size": [2, 1, 1],
                             "denseNorm": False, "qk_norm": True,
                             "norm_eps": 1e-5, "hiddenSize": 32, "depth": 2,
                             "nHeads": 4, "numClasses": 10}},
        "train": {
            "totalStep": 2, "batchSize": 1, "epoch": 1, "valFreq": 10,
            "trainSet": "unused", "valSet": "unused", "saveDir": str(tmp / "gen_saved"),
            "target": "MsSSIM",
            "optim": {"key": "Adam", "params": {"lr": 1e-4}},
            "schdr": {"key": "Placeholder", "params": {}},
            "gpu": {"gpus": 8},
        },
    })


def test_gen_trainer_step_and_frozen_compressor(tmp_path):
    trainer = GenTrainer(_cfg(tmp_path), imageSize=32)
    before = jax.device_get(trainer.state.params["compressor"])
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 10, 8).astype(np.int32)
    m1 = trainer.trainStep(images, labels)
    m2 = trainer.trainStep(images, labels)
    assert np.isfinite(float(m1["loss"]))
    assert "ceLv00" in m1 and "ceLv01" in m1
    after = jax.device_get(trainer.state.params["compressor"])
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)  # frozen subtree untouched
    # the transformer DID move
    tBefore = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params["transformer"]))
    assert int(trainer.state.step) == 2
    trainer.save()
    trainer.close()  # release the saveDir lock (Saver refuses live dual holders)
    # resume round-trip
    trainer2 = GenTrainer(_cfg(tmp_path), imageSize=32)
    assert trainer2.tryResume()
    assert int(trainer2.state.step) == 2


def test_gen_trainer_loads_frozen_compressor_from_stage1(tmp_path):
    """Stage-1 ckpt -> stage-2 loadFrom handoff (reference workflow:
    train Neon, then train the generator over the frozen tokenizer)."""
    import jax.numpy as jnp

    from mcquic_tpu.models.compressor import Neon
    from mcquic_tpu.train.saver import saveTree

    # fabricate a "stage-1 checkpoint" with recognizable params
    module = Neon(channel=8, k=16, size=(2, 1, 1), useRemat=False)
    x = jnp.zeros((1, 32, 32, 3))
    variables = module.init({"params": jax.random.PRNGKey(7),
                             "gumbel": jax.random.PRNGKey(8)}, x, train=False)
    ckpt = tmp_path / "stage1.npz"
    saveTree(ckpt, {"params": variables["params"], "coder": variables["coder"]}, {})

    cfg = _cfg(tmp_path)
    cfg.Model.Params["loadFrom"] = str(ckpt)
    trainer = GenTrainer(cfg, imageSize=32)
    loaded = jax.device_get(trainer.state.params["compressor"])
    want = jax.device_get(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(loaded), jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(a, b)
    # freqEMA came along too
    coder = jax.device_get(trainer.state.coder)
    assert "compressor" in coder


def test_stage2_loads_reference_torch_stage1_ckpt(tmp_path):
    """`loadFrom: <reference trainer ckpt>` converts through convertNeon and
    lands in the frozen compressor subtree (migration path)."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from ref_scaffold import loadReference
    loadReference()
    from mcquic.modules.compressor import Neon as RefNeon

    from mcquic_tpu.train.genTrainer import loadCompressorParams

    channel, k, size = 8, 16, [4, 2, 2]
    torch.manual_seed(1)
    refNeon = RefNeon(channel, k, size, False)
    sd = {f"module._compressor.{key}": val
          for key, val in refNeon.state_dict().items()}
    ckpt = tmp_path / "ref_stage1.ckpt"
    torch.save({"trainer": {"_model": sd}}, str(ckpt))

    params, coder = loadCompressorParams(
        str(ckpt), {"channel": channel, "k": k, "size": size})
    assert "_quantizer" in params and "codebook" in params["_quantizer"]
    # converted codebook matches the reference tensor exactly
    refCb = refNeon._quantizer._quantizers[0]._codebook.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(params["_quantizer"]["codebook"]), refCb, atol=0)
    assert "freqEMA" in coder["_quantizer"]

    # missing geometry -> clear error
    with pytest.raises(ValueError, match="channel/k/size"):
        loadCompressorParams(str(ckpt), {})
