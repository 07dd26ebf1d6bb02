"""Validator end-to-end on synthetic images + trainer validate wiring."""
import numpy as np
import pytest


def test_validator_on_synthetic_folder(tmp_path):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from mcquic_tpu.data import getValLoader
    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.models.engine import CompressorEngine
    from mcquic_tpu.validate.validator import Validator

    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / f"im{i}.png")

    module = Compressor(channel=8, m=1, k=(16,))
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x, train=False)
    engine = CompressorEngine(module, variables, qp="0", base=64)
    validator = Validator(engine)
    results = validator.validate(getValLoader(str(tmp_path), base=64))
    assert results["images"] == 2
    assert np.isfinite(results["psnr"])
    assert 0 <= results["msssim"] <= 1
    assert results["bpp"] > 0
    assert results["idealBpp"] > 0
    # ideal bound must not exceed the actual rANS bpp by much (rANS overhead
    # is small); actual >= ideal - tolerance
    assert results["bpp"] >= results["idealBpp"] * 0.7
