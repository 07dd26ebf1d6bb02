"""mcquic_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the McQuic neural image codec.

Capability parity target: xiaosu-zhu/McQuic (reference mounted at /root/reference).
The public surface mirrors the reference package root (`mcquic/__init__.py:1-3`):
a version string, constants, and the config type.
"""

__version__ = "0.1.40"

from mcquic_tpu.consts import Consts
from mcquic_tpu.config import Config

__all__ = ["Consts", "Config", "__version__"]
