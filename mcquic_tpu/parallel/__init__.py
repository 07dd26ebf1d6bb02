"""Device-mesh + sharding layer (SPMD over ICI).

TPU-native replacement for the reference's distributed stack (SURVEY.md §2.3):
  * torchrun/NCCL process-per-GPU DDP  →  one SPMD program under jit over a
    `jax.sharding.Mesh` ('data', 'model'); gradient reduction is a GSPMD
    all-reduce over ICI (reference fairscale ShardedDDP, trainer.py:105).
  * fairscale OSS ZeRO-2 optimizer-state sharding (trainer.py:94)  →
    optimizer state sharded along the 'data' axis via NamedSharding specs.
  * `dist.all_reduce` of code frequencies (entropyCoder.py:314)  →  implicit:
    summing a batch-sharded one-hot tensor under jit emits the collective.
  * codebook `dist.broadcast` sync (quantizer.py:138-142)  →  unnecessary:
    params are replicated and updates are deterministic functions of psum'd
    quantities.
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def makeMesh(dataParallel: Optional[int] = None, modelParallel: int = 1,
             devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dataParallel is None:
        dataParallel = n // modelParallel
    assert dataParallel * modelParallel == n, \
        f"mesh {dataParallel}x{modelParallel} != {n} devices"
    arr = np.asarray(devices).reshape(dataParallel, modelParallel)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batchSharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim along 'data'."""
    return NamedSharding(mesh, P("data"))


def _zeroSpecForLeaf(leaf, dataSize: int) -> P:
    """ZeRO-style spec: shard the largest divisible axis along 'data'."""
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    # Prefer the largest axis divisible by the data-parallel degree.
    candidates = [(dim, ax) for ax, dim in enumerate(shape) if dim % dataSize == 0 and dim >= dataSize]
    if not candidates:
        return P()
    _, ax = max(candidates)
    spec = [None] * len(shape)
    spec[ax] = "data"
    return P(*spec)


def zeroShardings(mesh: Mesh, tree):
    """Per-leaf NamedShardings for optimizer state: fully sharded along 'data'
    where shapes allow, replicated otherwise (ZeRO-2 equivalent of fairscale
    OSS, reference trainer.py:94)."""
    dataSize = mesh.shape["data"]

    def perLeaf(leaf):
        return NamedSharding(mesh, _zeroSpecForLeaf(leaf, dataSize))

    return jax.tree_util.tree_map(perLeaf, tree)


def replicatedShardings(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: rep, tree)


# Column-parallel (output dim sharded) / row-parallel (input dim sharded)
# projection names in the AnyRes/VAR transformers. GSPMD inserts the
# all-reduce after row-parallel matmuls automatically.
_COL_PARALLEL = {"wq", "wk", "wv", "wkY", "wvY", "w1", "w3", "qkv", "fc1"}
_ROW_PARALLEL = {"wo", "w2", "proj", "fc2"}


def generatorShardings(mesh: Mesh, params):
    """Megatron-style tensor-parallel specs for transformer params.

    Attention qkv + FFN up-projections are column-parallel; output
    projections are row-parallel; everything else replicated. Head count must
    divide mesh['model'].
    """
    tpSize = mesh.shape["model"]

    def spec(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if tpSize > 1 and names and names[-1] == "kernel" and len(names) >= 2:
            owner = names[-2]
            shape = getattr(leaf, "shape", ())
            if owner in _COL_PARALLEL and len(shape) == 2 and shape[1] % tpSize == 0:
                return NamedSharding(mesh, P(None, "model"))
            if owner in _ROW_PARALLEL and len(shape) == 2 and shape[0] % tpSize == 0:
                return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)
