"""End-to-end codec tests on tiny geometries (round-trip property tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.container import File
from mcquic_tpu.models.compressor import Compressor, Neon
from mcquic_tpu.models.engine import CompressorEngine


@pytest.fixture(scope="module")
def tinyV1():
    module = Compressor(channel=8, m=2, k=(16, 8))
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init({"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
                            x, train=False)
    return CompressorEngine(module, variables, qp="2", base=64)


@pytest.fixture(scope="module")
def tinyNeon():
    # input 64 -> outer encoder /8 -> latent 8; size[0]=4 halves it, then
    # halve/equal/halve/equal down to 1 (reference size-spec rule: the list
    # must end with an equal-size level because the smallest level's backward
    # is Identity, quantizer.py:596-650).
    module = Neon(channel=8, k=16, size=(4, 2, 2, 1, 1), denseNorm=False, useRemat=False)
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init({"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
                            x, train=False)
    return CompressorEngine(module, variables, qp="neon", base=64)


def test_v1_roundtrip_codes_lossless(tinyV1):
    """North-star check: codes survive the full rANS round-trip bit-exactly."""
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    codes, binaries, headers = tinyV1.compress(img)
    assert len(binaries) == 2 and len(binaries[0]) == 2  # n=2, levels=2
    decoded = tinyV1.coder.decompress(binaries, [h.CodeSize for h in headers])
    for ref, dec in zip(codes, decoded):
        np.testing.assert_array_equal(ref, dec)


def test_v1_decompress_shape_and_range(tinyV1):
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    _, binaries, headers = tinyV1.compress(img)
    restored = tinyV1.decompress(binaries, headers)
    assert restored.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(restored))


def test_v1_nonaligned_input_pads_and_crops(tinyV1):
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, (1, 50, 70, 3)).astype(np.float32)
    _, binaries, headers = tinyV1.compress(img)
    assert headers[0].ImageSize.height == 50 and headers[0].ImageSize.width == 70
    restored = tinyV1.decompress(binaries, headers)
    assert restored.shape == (1, 50, 70, 3)


def test_v1_mcq_file_roundtrip(tinyV1):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 56, 3), dtype=np.uint8)
    file = tinyV1.compressImage(img)
    blob = file.serialize()
    file2 = File.deserialize(blob)
    assert file2.FileHeader.QuantizationParameter == "2"
    assert file2.BPP == file.BPP
    restored = tinyV1.decompressImage(file2)
    assert restored.shape == img.shape and restored.dtype == np.uint8


def test_neon_roundtrip_codes_lossless(tinyNeon):
    rng = np.random.default_rng(4)
    img = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    codes, binaries, headers = tinyNeon.compress(img)
    assert len(binaries[0]) == 5  # 5 scales
    # scales are small->large: heights must be non-decreasing
    hs = headers[0].CodeSize.heights
    assert hs == sorted(hs)
    decoded = tinyNeon.coder.decompress(binaries, [h.CodeSize for h in headers])
    for ref, dec in zip(codes, decoded):
        np.testing.assert_array_equal(ref, dec)
    restored = tinyNeon.decompress(binaries, headers)
    assert restored.shape == (1, 64, 64, 3)


def test_v1_training_forward():
    module = Compressor(channel=8, m=2, k=(16, 8))
    x = jnp.zeros((2, 32, 32, 3))
    variables = module.init({"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
                            x, train=True)
    (xHat, yHat, codes, logits), newState = module.apply(
        variables, jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3)),
        train=True, rngs={"gumbel": jax.random.PRNGKey(3)}, mutable=["coder"])
    assert xHat.shape == (2, 32, 32, 3)
    assert len(codes) == 2
    assert codes[0].shape == (2, 2, 2, 2)  # 32/16 = 2 spatial, m=2
    assert logits[0].shape == (2, 2, 2, 2, 16)
    # freqEMA moved away from uniform
    flat = jax.tree_util.tree_leaves(newState["coder"])
    assert any(float(jnp.std(f)) > 0 for f in flat)


@pytest.mark.slow
def test_neon_training_forward_and_grads():
    module = Neon(channel=8, k=16, size=(2, 1, 1), denseNorm=False, useRemat=False)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    variables = module.init({"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
                            x, train=True)

    def loss(params):
        (xHat, yHat, codes, logits), _ = module.apply(
            {"params": params, "coder": variables["coder"]}, x, train=True,
            rngs={"gumbel": jax.random.PRNGKey(3)}, mutable=["coder"])
        return jnp.mean((xHat - x) ** 2)

    g = jax.grad(loss)(variables["params"])
    gnorm = jnp.sqrt(sum(jnp.sum(l ** 2) for l in jax.tree_util.tree_leaves(g)))
    assert jnp.isfinite(gnorm) and gnorm > 0
    # The shared codebook must receive gradient through the straight-through path.
    cbGrad = g["_quantizer"]["codebook"]
    assert float(jnp.sum(jnp.abs(cbGrad))) > 0


def test_plain_coder_mode(tinyV1):
    """Raw int64 'plain' mode matches reference VariousMCoder byte layout
    (entropyCoder.py:401/421)."""
    from mcquic_tpu.coding import RansCoder
    rng = np.random.default_rng(7)
    img = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    codes = tinyV1.encode(img)
    plain = RansCoder([2, 2], [16, 8], mode="plain")
    binaries, codeSizes = plain.compress(codes)
    # byte-compatible: raw little-endian int64 of the [m,h,w] walk
    expect = np.ascontiguousarray(codes[0][0], dtype=np.int64).tobytes()
    assert binaries[0][0] == expect
    decoded = plain.decompress(binaries, codeSizes)
    for ref, dec in zip(codes, decoded):
        np.testing.assert_array_equal(ref, dec)
    # rANS mode is strictly smaller than plain for the same codes
    ransBin, _ = tinyV1.coder.compress(codes)
    assert sum(map(len, ransBin[0])) < sum(map(len, binaries[0]))


def test_compress_many_pipelined(tinyV1):
    """Pipelined multi-batch path matches per-batch compress results."""
    rng = np.random.default_rng(9)
    batches = [rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32) for _ in range(3)]
    results = tinyV1.compressMany(batches)
    assert len(results) == 3
    for x, (binaries, headers) in zip(batches, results):
        _, refBin, refHdr = tinyV1.compress(x)
        assert binaries == refBin
        assert headers[0].ImageSize.height == refHdr[0].ImageSize.height


def test_decompress_many_pipelined(tinyV1):
    rng = np.random.default_rng(11)
    batches = [rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32) for _ in range(3)]
    items = []
    for x in batches:
        _, binaries, headers = tinyV1.compress(x)
        items.append((binaries, headers))
    results = tinyV1.decompressMany(items)
    assert len(results) == 3
    for i, (binaries, headers) in enumerate(items):
        ref = tinyV1.decompress(binaries, headers)
        np.testing.assert_allclose(results[i], ref, atol=1e-5)


def test_uint8_image_path_matches_float_path(tinyV1):
    """The uint8 upload (normalize-on-device) and uint8 download
    (clip/round/cast-on-device) product paths must be bit-identical to the
    host-side float transforms they replace (engine.py encode/_decodeDispatch
    toImage; 4x fewer tunnel bytes each way)."""
    from mcquic_tpu.data.transforms import imageToModelInput, modelOutputToImage
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)

    codesU8 = tinyV1.encode(img)
    codesF32 = tinyV1.encode(imageToModelInput(img))
    for a, b in zip(codesU8, codesF32):
        np.testing.assert_array_equal(a, b)

    # decode side: device uint8 conversion == host modelOutputToImage
    devImg = np.asarray(tinyV1._decodeDispatch(codesU8, toImage=True))
    hostImg = modelOutputToImage(tinyV1.decode(codesU8))
    assert devImg.dtype == np.uint8
    np.testing.assert_array_equal(devImg, hostImg)

    # and the full wrapper round-trip stays shape/dtype-correct per image
    file = tinyV1.compressImage(img[0])
    restored = tinyV1.decompressImage(file)
    assert restored.shape == img[0].shape and restored.dtype == np.uint8
