"""Build the native rANS runtime (`libmcquic_rans.so`) on demand.

Compiles csrc/mcquic_rans.cpp with g++ -O3 and caches the shared object next
to the source, keyed by a hash of the source so edits trigger rebuilds.
"""
import hashlib
import os
import subprocess
from pathlib import Path

_SRC = Path(__file__).parent / "csrc" / "mcquic_rans.cpp"
_BUILD_DIR = Path(__file__).parent / "_build"


def libraryPath() -> Path:
    srcHash = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    return _BUILD_DIR / f"libmcquic_rans_{srcHash}.so"


def ensureBuilt() -> Path:
    lib = libraryPath()
    if lib.exists():
        return lib
    _BUILD_DIR.mkdir(exist_ok=True)
    tmp = lib.with_suffix(".so.tmp")
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-DNDEBUG", str(_SRC), "-o", str(tmp),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, lib)
    # Clean stale builds.
    for old in _BUILD_DIR.glob("libmcquic_rans_*.so"):
        if old != lib:
            try:
                old.unlink()
            except OSError:
                pass
    return lib
