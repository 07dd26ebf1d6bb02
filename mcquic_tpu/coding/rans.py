"""rANS entropy coder bindings.

Exposes the same three symbols as the reference `mcquic.rans` pybind11 module
(`third_party/CompressAI/cpp_exts/rans.cpp:11-24` / `mcquic/rans.pyi:11-15`):
`pmfToQuantizedCDF`, `RansEncoder`, `RansDecoder` — list-based signatures for
drop-in compatibility — plus fast numpy-buffer entry points
(`encodeNp`/`decodeNp`/batch) that avoid per-symbol Python objects entirely.

The native backend is `csrc/mcquic_rans.cpp` (built on demand via g++). A
pure-python/numpy reference implementation of the identical bitstream lives in
`pyrans.py` and is used both as an automatic fallback and as the golden model
in tests.
"""
import ctypes
from typing import List, Optional, Sequence

import numpy as np

from mcquic_tpu.coding import pyrans

_lib = None
_libErr = None


def _loadLib():
    global _lib, _libErr
    if _lib is not None or _libErr is not None:
        return _lib
    try:
        from mcquic_tpu.coding.build import ensureBuilt
        path = ensureBuilt()
        lib = ctypes.CDLL(str(path))

        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i64 = ctypes.c_int64
        i32 = ctypes.c_int32

        lib.mcq_pmf_to_quantized_cdf.argtypes = [f32p, i32, i32, i32p]
        lib.mcq_pmf_to_quantized_cdf.restype = ctypes.c_int
        lib.mcq_build_decode_lut.argtypes = [i32p, i32, u16p]
        lib.mcq_build_decode_lut.restype = ctypes.c_int
        lib.mcq_encode_with_indexes.argtypes = [i32p, i32p, i64, i32p, i64, i32p, i32p, u8p, i64]
        lib.mcq_encode_with_indexes.restype = i64
        lib.mcq_decode_with_indexes.argtypes = [u8p, i64, i32p, i64, i32p, i64, i32p, i32p, u16p, i64, i32p]
        lib.mcq_decode_with_indexes.restype = i64
        lib.mcq_encode_batch.argtypes = [i32p, i32p, i64, i64, i32p, i64, i32p, i32p, u8p, i64, i64p]
        lib.mcq_encode_batch.restype = ctypes.c_int
        lib.mcq_decode_batch.argtypes = [u8p, i64p, i64p, i64, i32p, i64, i32p, i64, i32p, i32p, u16p, i64, i32p]
        lib.mcq_decode_batch.restype = ctypes.c_int
        lib.mcq_stream_new.argtypes = [u8p, i64]
        lib.mcq_stream_new.restype = ctypes.c_void_p
        lib.mcq_stream_decode.argtypes = [ctypes.c_void_p, i32p, i64, i32p, i64, i32p, i32p, i32p]
        lib.mcq_stream_decode.restype = i64
        lib.mcq_stream_free.argtypes = [ctypes.c_void_p]
        lib.mcq_stream_free.restype = None
        _lib = lib
    except Exception as e:  # pragma: no cover - env without g++
        _libErr = e
        _lib = None
    return _lib


def nativeAvailable() -> bool:
    return _loadLib() is not None


def _asI32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def packCdfs(cdfs: Sequence[Sequence[int]]):
    """Pack ragged CDFs into a [nCdfs, stride] int32 matrix + sizes."""
    sizes = np.array([len(c) for c in cdfs], dtype=np.int32)
    stride = int(sizes.max())
    mat = np.zeros((len(cdfs), stride), dtype=np.int32)
    for i, c in enumerate(cdfs):
        mat[i, :len(c)] = np.asarray(c, dtype=np.int32)
    return mat, sizes


def pmfToQuantizedCDF(pmf: Sequence[float], precision: int = 16) -> List[int]:
    """Quantized CDF with frequency stealing (reference ops.cpp:42-111)."""
    lib = _loadLib()
    pmfArr = np.ascontiguousarray(pmf, dtype=np.float32)
    if lib is None:
        return pyrans.pmfToQuantizedCDF(pmfArr, precision)
    out = np.empty(pmfArr.size + 1, dtype=np.int32)
    rc = lib.mcq_pmf_to_quantized_cdf(_ptr(pmfArr, ctypes.c_float), pmfArr.size,
                                      precision, _ptr(out, ctypes.c_int32))
    if rc != 0:
        raise ValueError(f"Invalid pmf (error {rc}): {pmfArr[:8]}...")
    return out.tolist()


def buildDecodeLuts(cdfMat: np.ndarray, cdfSizes: np.ndarray) -> Optional[np.ndarray]:
    """Per-CDF 2^16 cumFreq->symbol LUTs for O(1) decode inversion."""
    lib = _loadLib()
    if lib is None:
        return None
    n = cdfMat.shape[0]
    luts = np.empty((n, 65536), dtype=np.uint16)
    for i in range(n):
        rc = lib.mcq_build_decode_lut(_ptr(np.ascontiguousarray(cdfMat[i]), ctypes.c_int32),
                                      int(cdfSizes[i]), _ptr(luts[i], ctypes.c_uint16))
        if rc != 0:
            raise ValueError("bad cdf for LUT")
    return luts


def encodeNp(symbols: np.ndarray, indexes: np.ndarray, cdfMat: np.ndarray,
             cdfSizes: np.ndarray, offsets: np.ndarray) -> bytes:
    """Encode one stream from numpy buffers."""
    symbols = _asI32(symbols).ravel()
    indexes = _asI32(indexes).ravel()
    cdfMat = _asI32(cdfMat)
    cdfSizes = _asI32(cdfSizes)
    offsets = _asI32(offsets)
    lib = _loadLib()
    if lib is None:
        return pyrans.encodeWithIndexes(symbols, indexes, cdfMat, cdfSizes, offsets)
    cap = symbols.size * 8 + 64
    out = np.empty(cap, dtype=np.uint8)
    n = lib.mcq_encode_with_indexes(
        _ptr(symbols, ctypes.c_int32), _ptr(indexes, ctypes.c_int32), symbols.size,
        _ptr(cdfMat, ctypes.c_int32), cdfMat.shape[1], _ptr(cdfSizes, ctypes.c_int32),
        _ptr(offsets, ctypes.c_int32), _ptr(out, ctypes.c_uint8), cap)
    if n < 0:
        raise RuntimeError("rANS encode buffer overflow")
    return out[:n].tobytes()


def decodeNp(encoded: bytes, indexes: np.ndarray, cdfMat: np.ndarray,
             cdfSizes: np.ndarray, offsets: np.ndarray,
             luts: Optional[np.ndarray] = None) -> np.ndarray:
    """Decode one stream to int32 symbols."""
    indexes = _asI32(indexes).ravel()
    cdfMat = _asI32(cdfMat)
    cdfSizes = _asI32(cdfSizes)
    offsets = _asI32(offsets)
    lib = _loadLib()
    if lib is None:
        return pyrans.decodeWithIndexes(encoded, indexes, cdfMat, cdfSizes, offsets)
    buf = np.frombuffer(encoded, dtype=np.uint8)
    out = np.empty(indexes.size, dtype=np.int32)
    lutPtr = _ptr(luts, ctypes.c_uint16) if luts is not None else None
    nCdfs = cdfMat.shape[0]
    rc = lib.mcq_decode_with_indexes(
        _ptr(buf, ctypes.c_uint8), buf.size, _ptr(indexes, ctypes.c_int32), indexes.size,
        _ptr(cdfMat, ctypes.c_int32), cdfMat.shape[1], _ptr(cdfSizes, ctypes.c_int32),
        _ptr(offsets, ctypes.c_int32), lutPtr, nCdfs, _ptr(out, ctypes.c_int32))
    if rc < 0:
        raise RuntimeError("rANS decode error")
    return out


def encodeBatchNp(symbols: np.ndarray, indexes: np.ndarray, cdfMat: np.ndarray,
                  cdfSizes: np.ndarray, offsets: np.ndarray) -> List[bytes]:
    """Encode [batch, n] symbol rows sharing indexes/cdfs; one stream per row."""
    symbols = _asI32(symbols)
    batch, n = symbols.shape
    indexes = _asI32(indexes)
    if indexes.ndim == 1:
        indexes = np.broadcast_to(indexes, (batch, n))
    indexes = np.ascontiguousarray(indexes, dtype=np.int32)
    cdfMat, cdfSizes, offsets = _asI32(cdfMat), _asI32(cdfSizes), _asI32(offsets)
    lib = _loadLib()
    if lib is None:
        return [pyrans.encodeWithIndexes(symbols[b], indexes[b], cdfMat, cdfSizes, offsets)
                for b in range(batch)]
    perCap = n * 8 + 64
    out = np.empty((batch, perCap), dtype=np.uint8)
    sizes = np.empty(batch, dtype=np.int64)
    rc = lib.mcq_encode_batch(
        _ptr(symbols, ctypes.c_int32), _ptr(indexes, ctypes.c_int32), batch, n,
        _ptr(cdfMat, ctypes.c_int32), cdfMat.shape[1], _ptr(cdfSizes, ctypes.c_int32),
        _ptr(offsets, ctypes.c_int32), _ptr(out, ctypes.c_uint8), perCap,
        _ptr(sizes, ctypes.c_int64))
    if rc != 0:
        raise RuntimeError("rANS batch encode failure")
    return [out[b, :sizes[b]].tobytes() for b in range(batch)]


def decodeBatchNp(binaries: List[bytes], indexes: np.ndarray, cdfMat: np.ndarray,
                  cdfSizes: np.ndarray, offsets: np.ndarray,
                  luts: Optional[np.ndarray] = None) -> np.ndarray:
    """Decode a list of streams sharing indexes/cdfs -> [batch, n] int32."""
    indexes = _asI32(indexes).ravel()
    cdfMat, cdfSizes, offsets = _asI32(cdfMat), _asI32(cdfSizes), _asI32(offsets)
    lib = _loadLib()
    n = indexes.size
    batch = len(binaries)
    if lib is None:
        return np.stack([pyrans.decodeWithIndexes(b, indexes, cdfMat, cdfSizes, offsets)
                         for b in binaries])
    blob = np.frombuffer(b"".join(binaries), dtype=np.uint8)
    sizes = np.array([len(b) for b in binaries], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    out = np.empty((batch, n), dtype=np.int32)
    lutPtr = _ptr(luts, ctypes.c_uint16) if luts is not None else None
    rc = lib.mcq_decode_batch(
        _ptr(blob, ctypes.c_uint8), _ptr(offs, ctypes.c_int64), _ptr(sizes, ctypes.c_int64),
        batch, _ptr(indexes, ctypes.c_int32), n, _ptr(cdfMat, ctypes.c_int32), cdfMat.shape[1],
        _ptr(cdfSizes, ctypes.c_int32), _ptr(offsets, ctypes.c_int32), lutPtr,
        cdfMat.shape[0], _ptr(out, ctypes.c_int32))
    if rc != 0:
        raise RuntimeError("rANS batch decode failure")
    return out


class RansEncoder:
    """Reference-compatible list API (rans.pyi:11-15 shape)."""

    def encodeWithIndexes(self, symbols, indexes, cdfs, cdfSizes, offsets) -> bytes:
        cdfMat, sizes = packCdfs(cdfs)
        return encodeNp(np.asarray(symbols), np.asarray(indexes), cdfMat,
                        np.asarray(cdfSizes), np.asarray(offsets))


class RansDecoder:
    """Reference-compatible list API, including the streaming mode
    (rans_decoder.cpp:175-248: set_stream / decode_stream)."""

    def __init__(self):
        self._stream = None

    def decodeWithIndexes(self, encoded: bytes, indexes, cdfs, cdfSizes, offsets):
        cdfMat, sizes = packCdfs(cdfs)
        return decodeNp(encoded, np.asarray(indexes), cdfMat,
                        np.asarray(cdfSizes), np.asarray(offsets)).tolist()

    def set_stream(self, encoded: bytes):
        lib = _loadLib()
        if lib is None:
            raise RuntimeError("streaming decode requires the native library")
        if self._stream is not None:
            lib.mcq_stream_free(self._stream)
        buf = np.frombuffer(encoded, dtype=np.uint8)
        self._stream = lib.mcq_stream_new(_ptr(buf, ctypes.c_uint8), buf.size)
        if not self._stream:
            raise ValueError("invalid stream")

    def decode_stream(self, indexes, cdfs, cdfSizes, offsets):
        lib = _loadLib()
        if self._stream is None:
            raise RuntimeError("call set_stream first")
        cdfMat, _ = packCdfs(cdfs)
        indexes = _asI32(indexes).ravel()
        cdfMat = _asI32(cdfMat)
        cdfSizes = _asI32(cdfSizes)
        offsets = _asI32(offsets)
        out = np.empty(indexes.size, dtype=np.int32)
        rc = lib.mcq_stream_decode(self._stream, _ptr(indexes, ctypes.c_int32),
                                   indexes.size, _ptr(cdfMat, ctypes.c_int32),
                                   cdfMat.shape[1], _ptr(cdfSizes, ctypes.c_int32),
                                   _ptr(offsets, ctypes.c_int32), _ptr(out, ctypes.c_int32))
        if rc < 0:
            raise RuntimeError("stream decode error")
        return out.tolist()

    def __del__(self):
        lib = _lib
        if lib is not None and self._stream is not None:
            lib.mcq_stream_free(self._stream)
