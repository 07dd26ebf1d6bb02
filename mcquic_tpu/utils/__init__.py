"""Misc utilities: version gate, file hashing, parameter counting.

Parity with reference `mcquic/utils/__init__.py` (versionCheck `:32-48`,
hashOfFile `:51-76`, totalParameters, nop).
"""
import hashlib

import jax
import numpy as np

from mcquic_tpu.utils.registry import (GeneratorRegistry, HookRegistry, LossRegistry,
                                       LrSchedulerRegistry, ModelRegistry, ModuleRegistry,
                                       OptimizerRegistry, ValueTunerRegistry)

__all__ = [
    "versionCheck", "hashOfFile", "hashOfStream", "totalParameters", "nop",
    "ModuleRegistry", "ModelRegistry", "OptimizerRegistry", "LrSchedulerRegistry",
    "LossRegistry", "HookRegistry", "ValueTunerRegistry", "GeneratorRegistry",
]


def _parseVersion(v: str):
    parts = v.split(".")
    try:
        return tuple(int(p) for p in parts[:3])
    except ValueError as e:
        raise ValueError(f"Cannot parse version string `{v}`.") from e


def versionCheck(versionStr: str) -> bool:
    """Gate loading of serialized artifacts on version compatibility.

    Same policy as reference `mcquic/utils/__init__.py:32-48`: major versions
    must match; a newer minor version of the artifact than the library raises.
    """
    from mcquic_tpu import __version__
    mine = _parseVersion(__version__)
    theirs = _parseVersion(versionStr)
    if theirs[0] != mine[0]:
        raise ValueError(f"Version mismatch: artifact created by {versionStr}, library is {__version__}.")
    if theirs[:2] > mine[:2]:
        raise ValueError(f"Artifact from a newer library ({versionStr} > {__version__}); please upgrade.")
    return True


def hashOfFile(path: str, progress=None) -> str:
    sha256 = hashlib.sha256()
    with open(path, "rb") as fp:
        while True:
            chunk = fp.read(1 << 20)
            if not chunk:
                break
            sha256.update(chunk)
    return sha256.hexdigest()


def hashOfStream(stream) -> str:
    sha256 = hashlib.sha256()
    while True:
        chunk = stream.read(1 << 20)
        if not chunk:
            break
        sha256.update(chunk)
    return sha256.hexdigest()


def totalParameters(params) -> str:
    """Human-readable parameter count of a pytree of arrays."""
    total = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params) if hasattr(x, "shape"))
    if total > 1e9:
        return f"{total / 1e9:.2f}B"
    if total > 1e6:
        return f"{total / 1e6:.2f}M"
    if total > 1e3:
        return f"{total / 1e3:.2f}K"
    return str(total)


def nop(*args, **kwargs):
    pass
