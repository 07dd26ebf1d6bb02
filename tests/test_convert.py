"""Reference-checkpoint converter: structural bijection with our flax tree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.models.compressor import Compressor
from mcquic_tpu.utils.convert import (buildCompressorMap, convertCompressor,
                                      expectedTorchKeys, stripTrainerPrefix)


def _flatPaths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatPaths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_name_map_covers_every_flax_param():
    channel, m, k = 8, 2, [16, 8]
    module = Compressor(channel=channel, m=m, k=tuple(k))
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x, train=False)
    flaxPaths = set(_flatPaths({"params": variables["params"],
                                "coder": variables["coder"]}).keys())
    mapPaths = set(buildCompressorMap(channel, m, k).entries.keys())
    onlyFlax = sorted(flaxPaths - mapPaths)
    onlyMap = sorted(mapPaths - flaxPaths)
    assert not onlyFlax, f"unmapped flax params: {onlyFlax[:6]}"
    assert not onlyMap, f"map entries with no flax param: {onlyMap[:6]}"
    # torch side unique
    torchKeys = expectedTorchKeys(channel, m, k)
    assert len(torchKeys) == len(set(torchKeys))


def test_convert_synthetic_state_dict_shapes():
    channel, m, k = 8, 2, [16, 8]
    module = Compressor(channel=channel, m=m, k=tuple(k))
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x, train=False)
    flat = _flatPaths({"params": variables["params"], "coder": variables["coder"]})

    # build a synthetic torch state dict with reference shapes by inverting
    # the per-leaf transforms
    mp = buildCompressorMap(channel, m, k)
    rng = np.random.default_rng(0)
    sd = {}
    for flaxPath, (torchKey, fn) in mp.entries.items():
        ours = flat[flaxPath]
        if flaxPath[-1] == "kernel":           # HWIO -> OIHW
            sd[torchKey] = np.transpose(ours, (3, 2, 0, 1))
        elif flaxPath[-1] == "gamma":          # [1, in, out] -> [out, in]
            sd[torchKey] = np.transpose(ours[0], (1, 0))
        elif "temperature" in flaxPath[-1]:    # [m] -> [m,1,1,1]
            sd[torchKey] = ours.reshape(-1, 1, 1, 1)
        else:
            sd[torchKey] = ours
    converted = convertCompressor(sd, channel, m, k)
    convFlat = _flatPaths(converted)
    for path, val in flat.items():
        np.testing.assert_allclose(convFlat[path], val, atol=1e-6,
                                   err_msg=str(path))


def test_strip_trainer_prefix():
    sd = {"module._compressor._encoder.0.weight": np.zeros(1),
          "module._compressor._lpips.something": np.zeros(1),
          "other.key": np.zeros(1)}
    out = stripTrainerPrefix(sd)
    assert list(out) == ["_encoder.0.weight"]


def test_convert_missing_keys_strict():
    with pytest.raises(KeyError):
        convertCompressor({}, 8, 2, [16, 8])


def test_neon_name_map_covers_every_flax_param():
    from mcquic_tpu.models.compressor import Neon
    from mcquic_tpu.utils.convert import buildNeonMap

    channel, k, size = 8, 16, [4, 2, 2, 1, 1]
    module = Neon(channel=channel, k=k, size=tuple(size), useRemat=False)
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x, train=False)
    flaxPaths = set(_flatPaths({"params": variables["params"]}).keys())
    mapPaths = set(buildNeonMap(channel, k, size).entries.keys())
    # temperature + freqEMA handled separately by convertNeon
    flaxPaths.discard(("params", "_quantizer", "temperature"))
    onlyFlax = sorted(flaxPaths - mapPaths)
    onlyMap = sorted(mapPaths - flaxPaths)
    assert not onlyFlax, f"unmapped flax params: {onlyFlax[:8]}"
    assert not onlyMap, f"map entries with no flax param: {onlyMap[:8]}"


def test_convert_neon_synthetic():
    from mcquic_tpu.models.compressor import Neon
    from mcquic_tpu.utils.convert import buildNeonMap, convertNeon

    channel, k, size = 8, 16, [2, 1, 1]
    module = Neon(channel=channel, k=k, size=tuple(size), useRemat=False)
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((1, 32, 32, 3))
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x, train=False)
    flat = _flatPaths({"params": variables["params"], "coder": variables["coder"]})

    mp = buildNeonMap(channel, k, size)
    sd = {}
    for flaxPath, (torchKey, fn) in mp.entries.items():
        ours = flat[flaxPath]
        if flaxPath[-1] == "kernel":
            sd[torchKey] = np.transpose(ours, (3, 2, 0, 1))
        elif flaxPath[-1] == "gamma":
            sd[torchKey] = np.transpose(ours[0], (1, 0))
        else:
            sd[torchKey] = ours
    L = len(size)
    temp = flat[("params", "_quantizer", "temperature")]
    freq = flat[("coder", "_quantizer", "freqEMA")]
    for i in range(L):
        sd[f"_quantizer._quantizers.{i}._temperature"] = temp[L - 1 - i].reshape(1, 1, 1, 1)
        sd[f"_quantizer._entropyCoder._freqEMA.{i}"] = freq[i]
    converted = convertNeon(sd, channel, k, size)
    convFlat = _flatPaths(converted)
    for path, val in flat.items():
        np.testing.assert_allclose(convFlat[path], val, atol=1e-6, err_msg=str(path))


def test_convert_cli_end_to_end(tmp_path, monkeypatch):
    """python -m mcquic_tpu.utils.convert: reference trainer-style torch ckpt
    -> exported model -> loadable engine (the migration path for
    reference-trained weights)."""
    import subprocess
    import sys
    from pathlib import Path

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from ref_scaffold import loadReference
    loadReference()
    from mcquic.modules.compressor import Compressor as RefCompressor

    channel, m, k = 8, 2, [16, 8]
    torch.manual_seed(0)
    ref = RefCompressor(channel, m, k, 0.0)
    sd = {f"module._compressor.{key}": val for key, val in ref.state_dict().items()}
    ckpt = tmp_path / "trainer.ckpt"
    torch.save({"trainer": {"_model": sd}}, str(ckpt))

    out = tmp_path / "converted.npz"
    res = subprocess.run(
        [sys.executable, "-m", "mcquic_tpu.utils.convert", str(ckpt), str(out),
         "--channel", str(channel), "--m", str(m), "--k", "16,8", "--qp", "2"],
        capture_output=True, text=True, timeout=300,
        cwd=str(Path(__file__).resolve().parent.parent),
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert res.returncode == 0, res.stderr[-2000:]
    exported = res.stdout.strip().splitlines()[-1]
    assert exported.endswith(".mcquic.npz")

    from mcquic_tpu.demo import loadModel
    engine = loadModel(local=exported)
    img = np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    file = engine.compressImage(img)
    assert file.FileHeader.QuantizationParameter == "2"
    restored = engine.decompressImage(file)
    assert restored.shape == img.shape


def test_convert_cli_neon_with_config_yaml(tmp_path):
    """--config yaml drives a Neon conversion (reference stage-1 geometry)."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    import yaml

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from ref_scaffold import loadReference
    loadReference()
    from mcquic.modules.compressor import Neon as RefNeon

    channel, k, size = 8, 16, [4, 2, 2]
    torch.manual_seed(2)
    ref = RefNeon(channel, k, size, False)
    sd = {f"module._compressor.{key}": val for key, val in ref.state_dict().items()}
    ckpt = tmp_path / "trainer.ckpt"
    torch.save({"trainer": {"_model": sd}}, str(ckpt))
    cfgPath = tmp_path / "cfg.yaml"
    cfgPath.write_text(yaml.dump({
        "model": {"key": "Compressor",
                  "params": {"channel": channel, "k": k, "size": size}},
    }))

    out = tmp_path / "neon.npz"
    res = subprocess.run(
        [sys.executable, "-m", "mcquic_tpu.utils.convert", str(ckpt), str(out),
         "--config", str(cfgPath), "--qp", "3"],
        capture_output=True, text=True, timeout=300,
        cwd=str(Path(__file__).resolve().parent.parent),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert res.returncode == 0, res.stderr[-2000:]
    exported = res.stdout.strip().splitlines()[-1]

    from mcquic_tpu.demo import loadModel
    engine = loadModel(local=exported)
    img = np.random.default_rng(1).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    file = engine.compressImage(img)
    restored = engine.decompressImage(file)
    assert restored.shape == img.shape
