"""CLI acceptance test — the reference's product test is `mcquic -qp 2
sample.png ./` + restore (test-all.yml:36-45); here with a local tiny model."""
import numpy as np
import pytest
from click.testing import CliRunner


@pytest.fixture(scope="module")
def tinyExportedModel(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from mcquic_tpu.config import Config
    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.train.saver import exportModel

    tmp = tmp_path_factory.mktemp("model")
    module = Compressor(channel=8, m=2, k=(16, 8))
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x, train=False)
    cfg = Config.deserialize(
        {"model": {"key": "Compressor", "params": {"channel": 8, "m": 2, "k": [16, 8]}}})
    path = exportModel(tmp / "model.npz", variables, cfg.serialize(), qp="2")
    return path


def test_cli_compress_restore_roundtrip(tinyExportedModel, tmp_path):
    from PIL import Image

    from mcquic_tpu.cli import entryPoint

    img = np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    src = tmp_path / "sample.png"
    Image.fromarray(img).save(src)

    runner = CliRunner()
    mcq = tmp_path / "sample.mcq"
    res = runner.invoke(entryPoint, ["--local", str(tinyExportedModel),
                                     str(src), str(mcq)], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert mcq.exists() and mcq.stat().st_size > 0

    out = tmp_path / "restored.png"
    res = runner.invoke(entryPoint, ["--local", str(tinyExportedModel),
                                     str(mcq), str(out)], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    restored = np.asarray(Image.open(out))
    assert restored.shape == img.shape


def test_cli_help_of_every_subcommand():
    from mcquic_tpu.cli import entryPoint
    runner = CliRunner()
    for sub in ([], ["train"], ["validate"], ["dataset"]):
        res = runner.invoke(entryPoint, sub + ["--help"])
        assert res.exit_code == 0


@pytest.mark.slow
def test_cli_generate_subcommand(tmp_path):
    """End-to-end `mcquic generate` on a tiny generator checkpoint."""
    import jax
    import jax.numpy as jnp

    from mcquic_tpu.cli import entryPoint
    from mcquic_tpu.config import Config
    from mcquic_tpu.models.generator import GeneratorV3SelfAttention
    from mcquic_tpu.train.saver import saveTree

    module = GeneratorV3SelfAttention(channel=8, k=16, size=(2, 1, 1),
                                      hiddenSize=32, depth=1, nHeads=4, numClasses=10)
    img = jnp.zeros((1, 32, 32, 3))
    lbl = jnp.zeros((1,), jnp.int32)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, img, lbl, train=True)
    cfg = Config.deserialize({"model": {"key": "GeneratorV3SelfAttention", "params": {
        "channel": 8, "k": 16, "size": [2, 1, 1], "hiddenSize": 32,
        "depth": 1, "nHeads": 4, "numClasses": 10}}})
    ckpt = tmp_path / "gen.npz"
    saveTree(ckpt, {"params": variables["params"], "coder": variables["coder"]},
             {"config": cfg.serialize()})

    runner = CliRunner()
    outDir = tmp_path / "samples"
    res = runner.invoke(entryPoint, ["generate", "-c", "1,3", str(ckpt), str(outDir)],
                        catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert len(list(outDir.glob("*.png"))) == 2


def test_bundled_demo_model_smoke(tmp_path):
    """Reference-CI-style product test: compress+restore with the bundled
    trained artifact (test-all.yml:36-45 pattern)."""
    import glob
    from pathlib import Path

    models = glob.glob(str(Path(__file__).resolve().parent.parent
                           / "assets" / "tiny_demo_*.mcquic.npz"))
    if not models:
        pytest.skip("bundled demo model not present")
    from PIL import Image

    from mcquic_tpu.cli import entryPoint
    img = np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    src = tmp_path / "s.png"
    Image.fromarray(img).save(src)
    runner = CliRunner()
    mcq = tmp_path / "s.mcq"
    res = runner.invoke(entryPoint, ["--local", models[0], str(src), str(mcq)],
                        catch_exceptions=False)
    assert res.exit_code == 0, res.output
    out = tmp_path / "r.png"
    res = runner.invoke(entryPoint, ["--local", models[0], str(mcq), str(out)],
                        catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert np.asarray(Image.open(out)).shape == img.shape


def test_multihost_bootstrap_single_process():
    """MCQUIC_COORDINATOR env drives jax.distributed.initialize (multinode.sh
    contract); exercised as a real 1-process cluster in a subprocess."""
    import subprocess
    import sys
    from pathlib import Path

    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "os.environ['MCQUIC_COORDINATOR'] = 'localhost:18476'\n"
        "os.environ['MCQUIC_NUM_PROCESSES'] = '1'\n"
        "os.environ['MCQUIC_PROCESS_ID'] = '0'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from mcquic_tpu.train.cli import _maybeInitDistributed\n"
        "assert _maybeInitDistributed() is True\n"
        "assert jax.process_count() == 1 and jax.process_index() == 0\n"
        "print('BOOTSTRAP_OK')\n")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300,
                         cwd=str(Path(__file__).resolve().parent.parent))
    assert "BOOTSTRAP_OK" in out.stdout, out.stderr[-2000:]


def test_bf16_export_roundtrips_and_compresses(tmp_path):
    """bf16 deploy export: params stored as uint16 bf16 views (npy can't
    roundtrip ml_dtypes), preserved as bf16 by loadTree and upcast to
    float32 by loadModel; codec still round-trips through the engine and
    the artifact is ~half the size."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcquic_tpu.config import Config
    from mcquic_tpu.demo import loadModel
    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.train.saver import exportModel

    module = Compressor(channel=8, m=2, k=(16, 8))
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x, train=False)
    cfg = Config.deserialize(
        {"model": {"key": "Compressor", "params": {"channel": 8, "m": 2, "k": [16, 8]}}})
    full = exportModel(tmp_path / "fp32.npz", variables, cfg.serialize(), qp="2")
    half = exportModel(tmp_path / "bf16.npz", variables, cfg.serialize(), qp="2",
                       bf16=True)
    assert half.stat().st_size < 0.75 * full.stat().st_size

    engine = loadModel(local=str(half))
    leaves = jax.tree_util.tree_leaves(engine._variables["params"])
    assert all(l.dtype == np.float32 for l in leaves if np.issubdtype(l.dtype, np.floating))
    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    _, binaries, headers = engine.compress(img[None])
    out = engine.decompress(binaries, headers)
    assert out[0].shape == img.shape
