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
