"""Tiled high-res coding round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.models.compressor import Compressor
from mcquic_tpu.models.engine import CompressorEngine
from mcquic_tpu.models.tiling import TiledFile, compressTiled, decompressTiled


def test_tiled_roundtrip():
    module = Compressor(channel=8, m=1, k=(16,))
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x, train=False)
    engine = CompressorEngine(module, variables, qp="0", base=64)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (150, 200, 3), dtype=np.uint8)   # 3x4 tiles of 64
    tf = compressTiled(engine, img, tile=64)
    assert (tf.rows, tf.cols) == (3, 4)
    blob = tf.serialize()
    tf2 = TiledFile.deserialize(blob)
    assert tf2.BPP == tf.BPP
    restored = decompressTiled(engine, tf2)
    assert restored.shape == img.shape and restored.dtype == np.uint8


def test_tiled_cli_roundtrip(tmp_path):
    """--tile compress -> auto-detected tiled restore through the demo CLI
    (qp recorded in the tiled container)."""
    import numpy as np
    from click.testing import CliRunner
    from PIL import Image

    from mcquic_tpu.cli import entryPoint

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
    src = tmp_path / "big.png"
    Image.fromarray(img).save(src)
    runner = CliRunner()
    model = "assets/tiny_demo_672919fb.mcquic.npz"
    res = runner.invoke(entryPoint, ["--local", model, "--tile", "128",
                                     str(src), str(tmp_path / "big.mcq")])
    assert res.exit_code == 0, res.output
    from mcquic_tpu.models.tiling import TiledFile
    data = (tmp_path / "big.mcq").read_bytes()
    assert TiledFile.isTiled(data)
    res = runner.invoke(entryPoint, ["--local", model,
                                     str(tmp_path / "big.mcq"),
                                     str(tmp_path / "restored.png")])
    assert res.exit_code == 0, res.output
    restored = np.asarray(Image.open(tmp_path / "restored.png"))
    assert restored.shape == img.shape
