"""rANS bit-exactness and round-trip tests (SURVEY.md §4 rebuild plan (a)).

Cross-checks the native C++ coder against the pure-python golden model of the
same bitstream, and validates CDF quantization invariants.
"""
import numpy as np
import pytest

from mcquic_tpu.coding import pyrans, rans


def _randomPmf(rng, k):
    p = rng.dirichlet(np.ones(k) * 0.3)
    return p.astype(np.float32)


def test_native_builds():
    assert rans.nativeAvailable(), "native rANS library failed to build"


@pytest.mark.parametrize("k", [4, 64, 512, 4096])
def test_cdf_quantization_invariants(k):
    rng = np.random.default_rng(0)
    pmf = _randomPmf(rng, k)
    cdf = rans.pmfToQuantizedCDF(pmf.tolist(), 16)
    assert len(cdf) == k + 1
    assert cdf[0] == 0
    assert cdf[-1] == 1 << 16
    diffs = np.diff(cdf)
    assert np.all(diffs > 0), "every symbol must keep nonzero frequency"


@pytest.mark.parametrize("k", [16, 256, 2048])
def test_cdf_native_matches_python(k):
    rng = np.random.default_rng(1)
    for trial in range(5):
        pmf = _randomPmf(rng, k)
        native = rans.pmfToQuantizedCDF(pmf.tolist(), 16)
        golden = pyrans.pmfToQuantizedCDF(pmf, 16)
        assert native == golden, f"CDF mismatch at trial {trial}"


def test_cdf_with_zero_probs():
    pmf = np.array([0.5, 0.0, 0.5, 0.0], dtype=np.float32)
    cdf = rans.pmfToQuantizedCDF(pmf.tolist(), 16)
    assert np.all(np.diff(cdf) > 0)


def _roundtripCase(rng, nSyms, k, m):
    pmfs = [_randomPmf(rng, k) for _ in range(m)]
    cdfs = [rans.pmfToQuantizedCDF(p.tolist(), 16) for p in pmfs]
    cdfMat, _ = rans.packCdfs(cdfs)
    cdfSizes = np.array([k + 1] * m, dtype=np.int32)
    offsets = np.zeros(m, dtype=np.int32)
    indexes = rng.integers(0, m, nSyms).astype(np.int32)
    # Sample symbols roughly matching pmf so stream is realistic.
    symbols = np.array([rng.choice(k, p=pmfs[i] / pmfs[i].sum()) for i in indexes],
                       dtype=np.int32)
    return symbols, indexes, cdfMat, cdfSizes, offsets


def test_roundtrip_native():
    rng = np.random.default_rng(2)
    symbols, indexes, cdfMat, cdfSizes, offsets = _roundtripCase(rng, 2000, 256, 3)
    enc = rans.encodeNp(symbols, indexes, cdfMat, cdfSizes, offsets)
    dec = rans.decodeNp(enc, indexes, cdfMat, cdfSizes, offsets)
    np.testing.assert_array_equal(dec, symbols)


def test_roundtrip_with_lut():
    rng = np.random.default_rng(3)
    symbols, indexes, cdfMat, cdfSizes, offsets = _roundtripCase(rng, 1000, 128, 2)
    enc = rans.encodeNp(symbols, indexes, cdfMat, cdfSizes, offsets)
    luts = rans.buildDecodeLuts(cdfMat, cdfSizes)
    dec = rans.decodeNp(enc, indexes, cdfMat, cdfSizes, offsets, luts=luts)
    np.testing.assert_array_equal(dec, symbols)


def test_native_bitstream_matches_python_golden():
    rng = np.random.default_rng(4)
    symbols, indexes, cdfMat, cdfSizes, offsets = _roundtripCase(rng, 500, 64, 2)
    encNative = rans.encodeNp(symbols, indexes, cdfMat, cdfSizes, offsets)
    encGolden = pyrans.encodeWithIndexes(symbols, indexes, cdfMat, cdfSizes, offsets)
    assert encNative == encGolden, "native and python bitstreams diverge"
    # And python can decode the native stream.
    dec = pyrans.decodeWithIndexes(encNative, indexes, cdfMat, cdfSizes, offsets)
    np.testing.assert_array_equal(dec, symbols)


def test_bypass_escape_coding():
    """Out-of-range symbols (beyond cdfSize-2) ride the bypass escape path."""
    k = 8
    pmf = np.full(k, 1.0 / k, dtype=np.float32)
    cdf = rans.pmfToQuantizedCDF(pmf.tolist(), 16)
    cdfMat, _ = rans.packCdfs([cdf])
    cdfSizes = np.array([k + 1], dtype=np.int32)
    offsets = np.array([0], dtype=np.int32)
    # includes negatives and large values -> escapes
    symbols = np.array([0, 3, -5, 700, 6, 100000, -1, 7], dtype=np.int32)
    indexes = np.zeros(symbols.size, dtype=np.int32)
    enc = rans.encodeNp(symbols, indexes, cdfMat, cdfSizes, offsets)
    dec = rans.decodeNp(enc, indexes, cdfMat, cdfSizes, offsets)
    np.testing.assert_array_equal(dec, symbols)
    encG = pyrans.encodeWithIndexes(symbols, indexes, cdfMat, cdfSizes, offsets)
    assert enc == encG


def test_offsets_applied():
    k = 16
    pmf = np.full(k, 1.0 / k, dtype=np.float32)
    cdf = rans.pmfToQuantizedCDF(pmf.tolist(), 16)
    cdfMat, _ = rans.packCdfs([cdf])
    cdfSizes = np.array([k + 1], dtype=np.int32)
    offsets = np.array([-3], dtype=np.int32)
    symbols = np.arange(-3, 10, dtype=np.int32)
    indexes = np.zeros(symbols.size, dtype=np.int32)
    enc = rans.encodeNp(symbols, indexes, cdfMat, cdfSizes, offsets)
    dec = rans.decodeNp(enc, indexes, cdfMat, cdfSizes, offsets)
    np.testing.assert_array_equal(dec, symbols)


def test_batch_api_matches_single():
    rng = np.random.default_rng(5)
    k, m, n, batch = 128, 2, 300, 4
    pmfs = [_randomPmf(rng, k) for _ in range(m)]
    cdfs = [rans.pmfToQuantizedCDF(p.tolist(), 16) for p in pmfs]
    cdfMat, _ = rans.packCdfs(cdfs)
    cdfSizes = np.array([k + 1] * m, dtype=np.int32)
    offsets = np.zeros(m, dtype=np.int32)
    indexes = rng.integers(0, m, n).astype(np.int32)
    symbols = rng.integers(0, k, (batch, n)).astype(np.int32)

    binaries = rans.encodeBatchNp(symbols, indexes, cdfMat, cdfSizes, offsets)
    assert len(binaries) == batch
    for b in range(batch):
        single = rans.encodeNp(symbols[b], indexes, cdfMat, cdfSizes, offsets)
        assert binaries[b] == single
    luts = rans.buildDecodeLuts(cdfMat, cdfSizes)
    decoded = rans.decodeBatchNp(binaries, indexes, cdfMat, cdfSizes, offsets, luts=luts)
    np.testing.assert_array_equal(decoded, symbols)


def test_reference_list_api():
    """Drop-in `RansEncoder`/`RansDecoder` list API (reference rans.pyi)."""
    k = 32
    pmf = [1.0 / k] * k
    cdf = rans.pmfToQuantizedCDF(pmf, 16)
    enc = rans.RansEncoder()
    dec = rans.RansDecoder()
    symbols = [0, 5, 31, 2, 17]
    indexes = [0] * len(symbols)
    binary = enc.encodeWithIndexes(symbols, indexes, [cdf], [k + 1], [0])
    restored = dec.decodeWithIndexes(binary, indexes, [cdf], [k + 1], [0])
    assert restored == symbols


def test_compression_ratio_sane():
    """A skewed distribution should compress well below raw size."""
    rng = np.random.default_rng(6)
    k = 256
    pmf = np.zeros(k, dtype=np.float32)
    pmf[:4] = [0.7, 0.2, 0.05, 0.05]
    cdf = rans.pmfToQuantizedCDF(pmf.tolist(), 16)
    cdfMat, _ = rans.packCdfs([cdf])
    cdfSizes = np.array([k + 1], dtype=np.int32)
    offsets = np.zeros(1, dtype=np.int32)
    n = 10000
    symbols = rng.choice(4, n, p=[0.7, 0.2, 0.05, 0.05]).astype(np.int32)
    indexes = np.zeros(n, dtype=np.int32)
    enc = rans.encodeNp(symbols, indexes, cdfMat, cdfSizes, offsets)
    # Entropy ~1.16 bits/sym -> ~1450 bytes; raw int would be >= 1 byte/sym.
    assert len(enc) < 0.25 * n


def test_streaming_decoder_matches_batch():
    """set_stream/decode_stream parity (reference rans_decoder.cpp:175-248)."""
    rng = np.random.default_rng(7)
    k = 64
    pmf = _randomPmf(rng, k)
    cdf = rans.pmfToQuantizedCDF(pmf.tolist(), 16)
    n = 100
    symbols = rng.integers(0, k, n).astype(np.int32)
    indexes = np.zeros(n, dtype=np.int32)
    enc = rans.RansEncoder()
    binary = enc.encodeWithIndexes(symbols.tolist(), indexes.tolist(), [cdf], [k + 1], [0])

    dec = rans.RansDecoder()
    dec.set_stream(binary)
    first = dec.decode_stream(indexes[:40], [cdf], [k + 1], [0])
    second = dec.decode_stream(indexes[40:], [cdf], [k + 1], [0])
    np.testing.assert_array_equal(np.concatenate([first, second]), symbols)


def test_fuzz_roundtrip_random_configs():
    """Property fuzz: random (m, k, offsets) configs, native == golden."""
    rng = np.random.default_rng(42)
    for trial in range(15):
        m = int(rng.integers(1, 5))
        ks = [int(rng.integers(4, 300)) for _ in range(m)]
        cdfs = [rans.pmfToQuantizedCDF(_randomPmf(rng, k).tolist(), 16) for k in ks]
        cdfMat, _ = rans.packCdfs(cdfs)
        cdfSizes = np.array([k + 1 for k in ks], dtype=np.int32)
        offsets = rng.integers(-10, 10, m).astype(np.int32)
        n = int(rng.integers(1, 400))
        indexes = rng.integers(0, m, n).astype(np.int32)
        symbols = np.array([rng.integers(0, ks[i]) + offsets[i] for i in indexes],
                           dtype=np.int32)
        enc = rans.encodeNp(symbols, indexes, cdfMat, cdfSizes, offsets)
        encG = pyrans.encodeWithIndexes(symbols, indexes, cdfMat, cdfSizes, offsets)
        assert enc == encG, f"trial {trial}: bitstream mismatch"
        dec = rans.decodeNp(enc, indexes, cdfMat, cdfSizes, offsets)
        np.testing.assert_array_equal(dec, symbols, err_msg=f"trial {trial}")
