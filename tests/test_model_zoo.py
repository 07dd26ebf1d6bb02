"""qp-indexed model zoo plumbing, end-to-end over a file:// mirror
(reference MODELS_URL/MODELS_HASH + torch.hub hash gate, demo.py:20-24,
137-163; hash table maintained by ci/update_model_hash.py)."""
import importlib.util
import shutil
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu import demo
from mcquic_tpu.config import Config
from mcquic_tpu.models.compressor import Compressor
from mcquic_tpu.train.saver import exportModel

REPO = Path(__file__).resolve().parent.parent

# tiny stand-ins for distinct qp slot geometries (channel/m/levels vary)
SLOTS = {2: dict(channel=8, m=2, k=[16, 8]),
         12: dict(channel=12, m=4, k=[16, 8, 8])}


def _exportSlot(outDir: Path, qp: int, geom: dict) -> Path:
    module = Compressor(channel=geom["channel"], m=geom["m"], k=tuple(geom["k"]))
    variables = module.init({"params": jax.random.PRNGKey(qp),
                             "gumbel": jax.random.PRNGKey(qp + 1)},
                            jnp.zeros((1, 64, 64, 3)), train=False)
    cfg = Config.deserialize({"model": {"key": "Compressor", "params": geom}})
    final = exportModel(outDir / f"qp_{qp}_msssim.mcquic.npz",
                        {"params": variables["params"], "coder": variables["coder"]},
                        cfg.serialize(), qp=str(qp))
    return final


def _runHashScript(assetDir: Path, outJson: Path):
    spec = importlib.util.spec_from_file_location(
        "update_model_hash", REPO / "ci" / "update_model_hash.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main(str(assetDir), str(outJson))


@pytest.fixture(scope="module")
def zoo(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("zoo")
    assets = tmp / "assets"
    assets.mkdir()
    for qp, geom in SLOTS.items():
        _exportSlot(assets, qp, geom)
    table = _runHashScript(assets, tmp / "models_hash.json")
    return tmp, assets, table


def test_hash_script_registers_all_slots(zoo):
    _, _, table = zoo
    assert sorted(table) == ["qp_12_msssim", "qp_2_msssim"]
    assert all(len(v) == 8 for v in table.values())


def test_zoo_download_verify_and_roundtrip(zoo, monkeypatch, tmp_path):
    tmp, assets, _ = zoo
    monkeypatch.setenv("MCQUIC_MODELS_URL", assets.as_uri() + "/")
    monkeypatch.setenv("MCQUIC_MODELS_HASH_FILE", str(tmp / "models_hash.json"))
    monkeypatch.setenv("MCQUIC_CACHE", str(tmp_path / "cache"))
    rng = np.random.default_rng(0)
    for qp, geom in SLOTS.items():
        engine = demo.loadModel(qp=qp)
        img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
        file = engine.compressImage(img)
        assert file.FileHeader.QuantizationParameter == str(qp)
        restored = engine.decompressImage(file)
        assert restored.shape == img.shape and restored.dtype == np.uint8
    # cached second load skips the download (URL removed)
    monkeypatch.setenv("MCQUIC_MODELS_URL", "")
    assert demo.loadModel(qp=2) is not None


def test_zoo_rejects_corrupted_asset(zoo, monkeypatch, tmp_path):
    tmp, assets, table = zoo
    bad = tmp_path / "bad"
    bad.mkdir()
    for src in assets.glob("*"):
        shutil.copy(src, bad / src.name)
    # corrupt the qp_2 payload without renaming
    name = next(bad.glob("qp_2_msssim_*.mcquic.npz"))
    data = bytearray(name.read_bytes())
    data[-1] ^= 0xFF
    name.write_bytes(bytes(data))
    monkeypatch.setenv("MCQUIC_MODELS_URL", bad.as_uri() + "/")
    monkeypatch.setenv("MCQUIC_MODELS_HASH_FILE", str(tmp / "models_hash.json"))
    monkeypatch.setenv("MCQUIC_CACHE", str(tmp_path / "cache2"))
    with pytest.raises(RuntimeError, match="Hash mismatch"):
        demo.loadModel(qp=2)
    # the corrupted download was removed from the cache
    assert not list((tmp_path / "cache2" / "zoo").glob("*.npz"))


def test_unregistered_slot_lists_known(zoo, monkeypatch, tmp_path):
    tmp, _, _ = zoo
    monkeypatch.setenv("MCQUIC_MODELS_HASH_FILE", str(tmp / "models_hash.json"))
    monkeypatch.setenv("MCQUIC_CACHE", str(tmp_path / "cache3"))
    with pytest.raises(RuntimeError, match="qp_2_msssim"):
        demo.loadModel(qp=7)


def test_missing_sidecar_fails_loud_and_cleans_cache(zoo, monkeypatch, tmp_path):
    """A payload without its metadata sidecar must not poison the cache
    (review finding: swallowed sidecar errors left a permanently broken
    entry)."""
    tmp, assets, table = zoo
    partial = tmp_path / "partial"
    partial.mkdir()
    for src in assets.glob("*.npz"):
        shutil.copy(src, partial / src.name)  # no .json sidecars
    monkeypatch.setenv("MCQUIC_MODELS_URL", partial.as_uri() + "/")
    monkeypatch.setenv("MCQUIC_MODELS_HASH_FILE", str(tmp / "models_hash.json"))
    monkeypatch.setenv("MCQUIC_CACHE", str(tmp_path / "cacheX"))
    with pytest.raises(RuntimeError, match="sidecar"):
        demo.loadModel(qp=2)
    assert not list((tmp_path / "cacheX" / "zoo").glob("*.npz"))


def test_bundled_zoo_dir_serves_without_url(zoo, monkeypatch, tmp_path):
    """assets/zoo fallback: a committed artifact resolves with NO models URL
    configured (zero-egress out-of-the-box -qp flow) and is hash-verified."""
    tmp, assets, table = zoo
    monkeypatch.delenv("MCQUIC_MODELS_URL", raising=False)
    monkeypatch.setenv("MCQUIC_MODELS_HASH_FILE", str(tmp / "models_hash.json"))
    monkeypatch.setenv("MCQUIC_BUNDLED_ZOO", str(assets))
    monkeypatch.setenv("MCQUIC_CACHE", str(tmp_path / "cacheB"))
    path = demo.fetchZooModel(2)
    assert path.parent == assets, "bundled asset must be served in place"
    # corrupt the bundled copy -> loud hash failure, not silent use
    digest = table["qp_12_msssim"]
    bad = assets / f"qp_12_msssim_{digest}.mcquic.npz"
    payload = bad.read_bytes()
    bad.write_bytes(payload[:-1] + bytes([payload[-1] ^ 1]))
    with pytest.raises(RuntimeError, match="does not match registered hash"):
        demo.fetchZooModel(12)
    bad.write_bytes(payload)


@pytest.mark.slow
def test_committed_zoo_serves_qp2_end_to_end(monkeypatch, tmp_path):
    """The REAL committed zoo (assets/zoo + mcquic_tpu/models_hash.json)
    must serve `-qp 2` with zero configuration on a fresh checkout
    (reference demo.py:20-24 + test-all.yml product smoke): loadModel by
    slot, compress a real photo, restore, sane quality."""
    from PIL import Image

    for var in ("MCQUIC_MODELS_HASH_FILE", "MCQUIC_BUNDLED_ZOO",
                "MCQUIC_MODELS_URL", "MCQUIC_CACHE"):
        monkeypatch.delenv(var, raising=False)
    table = demo.modelsHash()
    assert "qp_2_msssim" in table, "committed models_hash.json lost its slots"
    engine = demo.loadModel(qp=2)
    img = np.asarray(Image.open(REPO / "assets" / "photo_768x512.png"))
    x = img.astype(np.float32) / 127.5 - 1.0  # engine contract: [-1,1] NHWC
    _, binaries, headers = engine.compress(x[None])
    out = engine.decompress(binaries, headers)
    mse = np.mean((np.asarray(out[0], np.float64) - x.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(4.0 / mse)  # peak-to-peak 2.0 in [-1,1]
    assert psnr > 20.0, f"committed qp-2 artifact decodes at {psnr:.2f} dB"
