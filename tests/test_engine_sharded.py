"""Data-parallel sharded inference: CompressorEngine over a device mesh.

The reference's inference/speed path is one GPU (validator.py:60-97); the
TPU-native engine serves batches SPMD across a `jax.sharding.Mesh` (codes
and images shard along the batch axis, parameters replicate — SURVEY §2.3).
Runs on the conftest-forced 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.models.compressor import Compressor
from mcquic_tpu.models.engine import CompressorEngine
from mcquic_tpu.parallel import makeMesh


@pytest.fixture(scope="module")
def meshedPair():
    module = Compressor(channel=8, m=2, k=(16, 8))
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        x, train=False)
    mesh = makeMesh(dataParallel=len(jax.devices()), modelParallel=1)
    single = CompressorEngine(module, variables, qp="2", base=64)
    sharded = CompressorEngine(module, variables, qp="2", base=64, mesh=mesh)
    return single, sharded, mesh


def test_sharded_encode_matches_single_device(meshedPair):
    single, sharded, mesh = meshedPair
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    for a, b in zip(sharded.encode(img), single.encode(img)):
        np.testing.assert_array_equal(a, b)


def test_sharded_input_actually_shards(meshedPair):
    _, sharded, mesh = meshedPair
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    placed = sharded._putBatch(img)
    assert len(placed.sharding.device_set) == mesh.size
    # batch-sharded: each device holds one image's shard
    shard0 = placed.addressable_shards[0]
    assert shard0.data.shape[0] == 8 // mesh.size


def test_sharded_full_roundtrip_and_indivisible_batch(meshedPair):
    single, sharded, _ = meshedPair
    rng = np.random.default_rng(2)
    # n=3 does not divide 8 -> replicated placement, still correct
    img = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    _, binaries, headers = sharded.compress(img)
    refCodes, refBin, _ = single.compress(img)
    assert binaries == refBin
    restored = sharded.decompress(binaries, headers)
    np.testing.assert_allclose(restored, single.decompress(refBin, headers),
                               atol=1e-5)


def test_sharded_uint8_image_wrappers(meshedPair):
    single, sharded, _ = meshedPair
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    file = sharded.compressImage(img)
    assert file.serialize() == single.compressImage(img).serialize()
    restored = sharded.decompressImage(file)
    np.testing.assert_array_equal(restored, single.decompressImage(file))
