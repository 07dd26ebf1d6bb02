"""Numerical parity vs the reference PyTorch model (the RD-parity gate).

Constructs the reference torch `Compressor` (reference compressor.py:120-177,
quantizer.py:368-467) via tests/ref_scaffold.py, converts its random-init
state dict through `utils/convert.py`, and asserts the flax rebuild computes
the SAME function:

  * encode codes identical (bit-exact argmin agreement, fp64),
  * decoder outputs equal to fp64 tolerance on the same codes,
  * freq->CDF tables identical between the reference EntropyCoder machinery
    and our RansCoder for the same (randomized) freqEMA state.

With these, reference-trained weights converted by `utils/convert.py`
reproduce reference codes and reconstructions, which is exactly the Kodak RD
parity precondition (BASELINE.md north star).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")  # torch is optional for the package

import jax
import jax.numpy as jnp

from ref_scaffold import loadReference
from mcquic_tpu.coding import RansCoder
from mcquic_tpu.models.compressor import Compressor
from mcquic_tpu.utils.convert import convertCompressor


@pytest.fixture(scope="module")
def refPkg():
    return loadReference()


def _buildPair(channel, m, k, seed=0):
    """Random-init reference torch model + converted flax variables (fp64)."""
    from mcquic.modules.compressor import Compressor as RefCompressor

    torch.manual_seed(seed)
    ref = RefCompressor(channel, m, list(k), 0.0).double().eval()
    stateDict = {key: val.detach().cpu().double().numpy()
                 for key, val in ref.state_dict().items()}
    variables = convertCompressor(stateDict, channel, m, list(k))
    module = Compressor(channel=channel, m=m, k=tuple(k), dtype=jnp.float64)
    return ref, module, variables


def _parityCase(channel, m, k, hw=128, seed=0):
    with jax.enable_x64():
        ref, module, variables = _buildPair(channel, m, k, seed)
        rng = np.random.default_rng(seed)
        img = rng.uniform(-1.0, 1.0, size=(1, hw, hw, 3))

        xT = torch.from_numpy(np.transpose(img, (0, 3, 1, 2))).double()
        with torch.inference_mode():
            refCodes = [c.numpy() for c in ref.encode(xT)]  # lv * [n,m,h,w]

        ourCodes = jax.jit(
            lambda v, x: module.apply(v, x, method="encode"))(variables, img)
        assert len(ourCodes) == len(refCodes)
        for lv, (ours, theirs) in enumerate(zip(ourCodes, refCodes)):
            oursT = np.transpose(np.asarray(ours), (0, 3, 1, 2))  # nhwm -> nmhw
            mismatch = (oursT != theirs).mean()
            assert mismatch == 0.0, (
                f"level {lv}: {mismatch:.2%} code mismatch (fp64 should be exact)")

        # decode both sides from the REFERENCE codes so this check is
        # independent of encode agreement
        with torch.inference_mode():
            refOut = ref.decode([torch.from_numpy(c) for c in refCodes]).numpy()
        codesNHWM = [np.transpose(c, (0, 2, 3, 1)) for c in refCodes]
        ourOut = jax.jit(
            lambda v, c: module.apply(v, c, method="decode"))(variables, codesNHWM)
        ourOutT = np.transpose(np.asarray(ourOut), (0, 3, 1, 2))
        diff = np.abs(ourOutT - refOut)
        assert diff.max() < 1e-8, f"decode max abs diff {diff.max():.3e}"
        return ref


def test_v1_model_parity_small(refPkg):
    """Small geometry, full-function agreement (fast path of the gate)."""
    _parityCase(channel=16, m=2, k=[32, 16, 8])


@pytest.mark.slow
def test_v1_model_parity_qp2_geometry(refPkg):
    """The qp-2 geometry of the published model zoo (README.md:304)."""
    _parityCase(channel=128, m=2, k=[8192, 2048, 512])


def test_cdf_parity_with_reference_coder(refPkg):
    """Reference EntropyCoder freq->CDF pipeline vs our RansCoder, same
    randomized freqEMA state (entropyCoder.py:50-63 vs coding/__init__.py)."""
    from mcquic.modules.entropyCoder import EntropyCoder

    m, k = 2, [32, 16, 8]
    coder = EntropyCoder(m, k)
    gen = torch.Generator().manual_seed(7)
    for param in coder._freqEMA:
        param.data = torch.rand(param.shape, generator=gen).double() + 0.01
    refCdfs = coder.CDFs

    ours = RansCoder([m] * len(k), k)
    ours.updateFreq([p.detach().numpy() for p in coder._freqEMA])
    ourCdfs = ours.CDFs
    assert len(refCdfs) == len(ourCdfs)
    for lv, (refLv, ourLv) in enumerate(zip(refCdfs, ourCdfs)):
        for mi, (refRow, ourRow) in enumerate(zip(refLv, ourLv)):
            assert list(refRow) == list(ourRow), f"CDF mismatch at level {lv} m {mi}"


def test_converted_codes_roundtrip_through_our_coder(refPkg):
    """Reference-model codes survive our rANS bitstream exactly."""
    with jax.enable_x64():
        ref, module, variables = _buildPair(16, 2, [32, 16, 8], seed=3)
        rng = np.random.default_rng(3)
        img = rng.uniform(-1.0, 1.0, size=(1, 128, 128, 3))
        xT = torch.from_numpy(np.transpose(img, (0, 3, 1, 2))).double()
        with torch.inference_mode():
            refCodes = [c.numpy().astype(np.int32) for c in ref.encode(xT)]

    coder = RansCoder([2] * 3, [32, 16, 8])
    # bias frequencies toward the actually-used codes, as training would
    freq = []
    for lv, (code, ki) in enumerate(zip(refCodes, [32, 16, 8])):
        hist = np.stack([np.bincount(code[:, mi].ravel(), minlength=ki)
                         for mi in range(2)]).astype(np.float64) + 0.5
        freq.append(hist / hist.sum(-1, keepdims=True))
    coder.updateFreq(freq)
    binaries, codeSizes = coder.compress(refCodes)
    decoded = coder.decompress(binaries, codeSizes)
    for lv in range(3):
        np.testing.assert_array_equal(decoded[lv], refCodes[lv])


def _buildNeonPair(channel, k, size, seed=0):
    from mcquic.modules.compressor import Neon as RefNeon

    from mcquic_tpu.models.compressor import Neon
    from mcquic_tpu.utils.convert import convertNeon

    torch.manual_seed(seed)
    ref = RefNeon(channel, k, list(size), False).double().eval()
    stateDict = {key: val.detach().cpu().double().numpy()
                 for key, val in ref.state_dict().items()}
    variables = convertNeon(stateDict, channel, k, list(size))
    module = Neon(channel=channel, k=k, size=tuple(size), useRemat=False,
                  dtype=jnp.float64)
    return ref, module, variables


def test_v2_neon_model_parity(refPkg):
    """v2 Neon tokenizer parity: the ACTIVE reference path (compressor.py:
    181-241, ResidualBackwardQuantizer quantizer.py:577-765) — codes
    bit-exact, decode <1e-8, and raw-codes bitstream bytes identical between
    the reference's VariousMCoder and our RansCoder 'plain' mode."""
    channel, k, size = 8, 16, [8, 4, 2, 2]
    with jax.enable_x64():
        ref, module, variables = _buildNeonPair(channel, k, size)
        rng = np.random.default_rng(0)
        img = rng.uniform(-1.0, 1.0, size=(1, 128, 128, 3))
        xT = torch.from_numpy(np.transpose(img, (0, 3, 1, 2))).double()
        with torch.inference_mode():
            refCodes = [c.numpy() for c in ref.encode(xT)]  # small->large
        ourCodes = jax.jit(
            lambda v, x: module.apply(v, x, method="encode"))(variables, img)
        assert len(ourCodes) == len(refCodes)
        for lv, (ours, theirs) in enumerate(zip(ourCodes, refCodes)):
            oursT = np.transpose(np.asarray(ours), (0, 3, 1, 2))
            assert (oursT == theirs).all(), f"level {lv} code mismatch"

        with torch.inference_mode():
            refOut = ref.decode([torch.from_numpy(c) for c in refCodes]).numpy()
        codesNHWM = [np.transpose(c, (0, 2, 3, 1)) for c in refCodes]
        ourOut = jax.jit(
            lambda v, c: module.apply(v, c, method="decode"))(variables, codesNHWM)
        ourOutT = np.transpose(np.asarray(ourOut), (0, 3, 1, 2))
        diff = np.abs(ourOutT - refOut)
        assert diff.max() < 1e-8, f"decode max abs diff {diff.max():.3e}"

        # bitstream: reference VariousMCoder raw-codes bytes == our 'plain'
        # mode bytes (entropyCoder.py:401/421)
        with torch.inference_mode():
            refBins, refSizes = ref._quantizer._entropyCoder.compress(
                [torch.from_numpy(c) for c in refCodes])
    coder = RansCoder([1] * len(size), [k] * len(size), mode="plain")
    ourBins, ourSizes = coder.compress([c.astype(np.int64) for c in refCodes])
    for img_i in range(len(ourBins)):
        for lv in range(len(size)):
            assert ourBins[img_i][lv] == refBins[img_i][lv], \
                f"plain bitstream differs at image {img_i} level {lv}"
    decoded = coder.decompress(ourBins, ourSizes)
    for lv in range(len(size)):
        np.testing.assert_array_equal(decoded[lv], refCodes[lv])
