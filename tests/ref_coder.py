"""Build + ctypes loader for the REFERENCE rANS coder (cross-coder tests).

Compiles /root/reference/third_party/CompressAI/cpp_exts/{ops,
buffered_rans_encoder,rans_encoder,rans_decoder}.cpp verbatim (with the fake
pybind11 headers in tests/refcoder/pybind11/, -DNDEBUG like the shipped
python -O install, reference install.sh:38-44) plus tests/refcoder/shim.cpp
into a cached shared library, and exposes encode/decode/pmfToQuantizedCDF
with numpy-array interfaces mirroring mcquic_tpu/coding/rans.py.
"""
import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF_EXT = "/root/reference/third_party/CompressAI/cpp_exts"
_REF_RYG = "/root/reference/third_party/CompressAI/ryg_rans"
_SHIM_DIR = os.path.join(_HERE, "refcoder")

_SOURCES = [
    os.path.join(_SHIM_DIR, "shim.cpp"),
    os.path.join(_REF_EXT, "ops.cpp"),
    os.path.join(_REF_EXT, "buffered_rans_encoder.cpp"),
    os.path.join(_REF_EXT, "rans_encoder.cpp"),
    os.path.join(_REF_EXT, "rans_decoder.cpp"),
]

_lib: Optional[ctypes.CDLL] = None


def referenceSourcesPresent() -> bool:
    return all(os.path.exists(src) for src in _SOURCES)


def _build() -> str:
    tag = hashlib.sha256()
    for src in _SOURCES + [os.path.join(_SHIM_DIR, "pybind11", "pybind11.h")]:
        with open(src, "rb") as fp:
            tag.update(fp.read())
    out = os.path.join(tempfile.gettempdir(),
                       f"refcoder_{tag.hexdigest()[:16]}.so")
    if os.path.exists(out):
        return out
    cmd = ["g++", "-std=c++17", "-O2", "-fPIC", "-shared", "-DNDEBUG",
           f"-I{_SHIM_DIR}", f"-I{_REF_EXT}", f"-I{_REF_RYG}",
           *_SOURCES, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return out


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.refPmfToQuantizedCdf.restype = ctypes.c_int
    lib.refPmfToQuantizedCdf.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32)]
    lib.refEncode.restype = ctypes.c_long
    lib.refEncode.argtypes = [i32p, ctypes.c_long, i32p, i32p, ctypes.c_int,
                              ctypes.c_int, i32p, i32p, i32p,
                              ctypes.POINTER(u8p)]
    lib.refDecode.restype = ctypes.c_long
    lib.refDecode.argtypes = [u8p, ctypes.c_long, i32p, ctypes.c_long, i32p,
                              ctypes.c_int, ctypes.c_int, i32p, i32p, i32p,
                              i32p]
    lib.refFree.restype = None
    lib.refFree.argtypes = [u8p]
    _lib = lib
    return lib


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pmfToQuantizedCDF(pmf: List[float], precision: int = 16) -> List[int]:
    lib = _load()
    p = np.ascontiguousarray(pmf, dtype=np.float32)
    out = np.zeros(len(pmf) + 1, dtype=np.uint32)
    n = lib.refPmfToQuantizedCdf(_ptr(p, ctypes.c_float), len(pmf), precision,
                                 _ptr(out, ctypes.c_uint32))
    if n < 0:
        raise ValueError("reference pmfToQuantizedCDF rejected the pmf")
    return out[:n].astype(np.int64).tolist()


def _cdfArgs(cdfs: List[List[int]], cdfSizes: List[int]):
    """Flatten ragged CDF rows; cdfLens = stored ints, cdfSizes = the claimed
    k+2 the reference python passes (entropyCoder.py:121)."""
    lens = _i32([len(c) for c in cdfs])
    stride = int(lens.max())
    flat = np.zeros((len(cdfs), stride), dtype=np.int32)
    for i, c in enumerate(cdfs):
        flat[i, :len(c)] = c
    return flat, lens, _i32(cdfSizes), stride


def encodeWithIndexes(symbols, indexes, cdfs, cdfSizes, offsets) -> bytes:
    lib = _load()
    sym, idx, off = _i32(symbols), _i32(indexes), _i32(offsets)
    flat, lens, sizes, stride = _cdfArgs(cdfs, cdfSizes)
    outp = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.refEncode(_ptr(sym, ctypes.c_int32), len(sym),
                      _ptr(idx, ctypes.c_int32), _ptr(flat, ctypes.c_int32),
                      len(cdfs), stride, _ptr(lens, ctypes.c_int32),
                      _ptr(sizes, ctypes.c_int32), _ptr(off, ctypes.c_int32),
                      ctypes.byref(outp))
    if n < 0:
        raise RuntimeError("reference encode failed")
    data = ctypes.string_at(outp, n)
    lib.refFree(outp)
    return data


def decodeWithIndexes(encoded: bytes, indexes, cdfs, cdfSizes,
                      offsets) -> np.ndarray:
    lib = _load()
    idx, off = _i32(indexes), _i32(offsets)
    flat, lens, sizes, stride = _cdfArgs(cdfs, cdfSizes)
    buf = np.frombuffer(encoded, dtype=np.uint8)
    out = np.zeros(len(idx), dtype=np.int32)
    n = lib.refDecode(_ptr(buf, ctypes.c_uint8), len(encoded),
                      _ptr(idx, ctypes.c_int32), len(idx),
                      _ptr(flat, ctypes.c_int32), len(cdfs), stride,
                      _ptr(lens, ctypes.c_int32), _ptr(sizes, ctypes.c_int32),
                      _ptr(off, ctypes.c_int32), _ptr(out, ctypes.c_int32))
    if n < 0:
        raise RuntimeError("reference decode failed")
    return out
