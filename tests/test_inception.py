"""InceptionV3 classifier + InceptionScore gate (reference
validate/handlers.py:193-258; torchvision inception_v3 layout)."""
import numpy as np
import pytest

from mcquic_tpu.validate import inception_v3 as iv3
from mcquic_tpu.validate.inception import InceptionScoreHandler


def _torchShapedSd(rng):
    """Synthesize a torchvision-key state dict from the flax tree structure
    (the flax module names mirror torchvision module paths)."""
    import jax
    import jax.numpy as jnp

    module = iv3.InceptionV3()
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 299, 299, 3)))
    sd = {}

    def walk(node, prefix):
        if "kernel" in node and "scale" in node:  # BasicConv2d
            w = np.asarray(node["kernel"])
            cOut = w.shape[-1]
            sd[f"{prefix}.conv.weight"] = np.transpose(w, (3, 2, 0, 1))
            sd[f"{prefix}.bn.weight"] = rng.uniform(0.5, 1.5, cOut).astype(np.float32)
            sd[f"{prefix}.bn.bias"] = rng.normal(0, 0.1, cOut).astype(np.float32)
            sd[f"{prefix}.bn.running_mean"] = rng.normal(0, 0.1, cOut).astype(np.float32)
            sd[f"{prefix}.bn.running_var"] = rng.uniform(0.5, 1.5, cOut).astype(np.float32)
            return
        for key, val in node.items():
            if isinstance(val, dict):
                walk(val, f"{prefix}.{key}" if prefix else key)

    walk(variables["params"], "")
    fc = np.asarray(variables["params"]["fc_kernel"])
    sd["fc.weight"] = np.transpose(fc, (1, 0))
    sd["fc.bias"] = np.asarray(variables["params"]["fc_bias"])
    # aux keys must be ignored by the converter
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    return sd


@pytest.mark.slow
def test_converter_folds_bn_and_matches_module():
    rng = np.random.default_rng(0)
    sd = _torchShapedSd(rng)
    params = iv3.convertTorchInception(sd)
    # structural: apply works and produces logits
    module = iv3.InceptionV3()
    x = rng.uniform(-1, 1, (1, 299, 299, 3)).astype(np.float32)
    logits = module.apply({"params": params}, x)
    assert logits.shape == (1, 1000)
    assert np.isfinite(np.asarray(logits)).all()
    # numerical: one BasicConv2d's fold equals explicit conv+BN
    import jax
    w = sd["Conv2d_1a_3x3.conv.weight"]
    gamma = sd["Conv2d_1a_3x3.bn.weight"]
    beta = sd["Conv2d_1a_3x3.bn.bias"]
    mean = sd["Conv2d_1a_3x3.bn.running_mean"]
    var = sd["Conv2d_1a_3x3.bn.running_var"]
    conv = jax.lax.conv_general_dilated(
        x, np.transpose(w, (2, 3, 1, 0)), (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    expected = np.maximum(
        (np.asarray(conv) - mean) / np.sqrt(var + iv3.BN_EPS) * gamma + beta, 0)
    sub = iv3.BasicConv2d(32, (3, 3), stride=2)
    got = sub.apply({"params": params["Conv2d_1a_3x3"]}, x)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4, rtol=1e-4)


def test_handler_gated_without_weights(monkeypatch, tmp_path):
    monkeypatch.delenv("MCQUIC_INCEPTION_WEIGHTS", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    handler = InceptionScoreHandler()
    with pytest.raises(RuntimeError, match="classifier"):
        handler(restored=np.zeros((1, 32, 32, 3), np.uint8))


@pytest.mark.slow
def test_inception_score_end_to_end(monkeypatch, tmp_path):
    """Weights via MCQUIC_INCEPTION_WEIGHTS -> working IS over images."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in _torchShapedSd(np.random.default_rng(1)).items()}
    path = tmp_path / "inception_v3.pth"
    torch.save(sd, str(path))
    monkeypatch.setenv("MCQUIC_INCEPTION_WEIGHTS", str(path))
    handler = InceptionScoreHandler(splits=2)
    rng = np.random.default_rng(2)
    handler(restored=rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8))
    score = handler.result()
    assert np.isfinite(score) and score >= 1.0  # IS lower bound is 1
