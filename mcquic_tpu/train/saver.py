"""Checkpoint save/rotate/resume (orbax-backed).

Parity with reference `mcquic/train/utils.py` Saver (`:63-194`): a `latest/`
directory that always holds the newest checkpoint, timestamped history with
bounded retention (maxItems=25), auto-resume probing, and an export path that
strips training state down to `{model, config, version}`
(reference validate/cli.py:77-100).
"""
import json
import os
import shutil
import time
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

import mcquic_tpu


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def saveTree(path: Path, tree: Any, meta: Optional[dict] = None):
    """Save a pytree of arrays as an .npz + sidecar json metadata.

    bfloat16 leaves are stored as a uint16 view under `key@bf16` — the npy
    format can't roundtrip the ml_dtypes dtype (it loads back as void16);
    loadTree restores such keys to float32.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(jax.tree_util.tree_map(np.asarray, tree))
    import ml_dtypes
    flat = {(k + "@bf16" if a.dtype == ml_dtypes.bfloat16 else k):
            (a.view(np.uint16) if a.dtype == ml_dtypes.bfloat16 else a)
            for k, a in flat.items()}
    np.savez(str(path), **flat)
    if meta is not None:
        path.with_suffix(".json").write_text(json.dumps(meta))


def loadTree(path: Path):
    path = Path(path)
    with np.load(str(path), allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    bf16Keys = [k for k in flat if k.endswith("@bf16")]
    if bf16Keys:
        import ml_dtypes
        for k in bf16Keys:
            flat[k[:-len("@bf16")]] = (
                flat.pop(k).view(ml_dtypes.bfloat16).astype(np.float32))
    meta = None
    metaPath = path.with_suffix(".json")
    if metaPath.exists():
        meta = json.loads(metaPath.read_text())
    return _unflatten(flat), meta


class Saver:
    """Save-dir layout: saveDir/latest/saved.ckpt.npz (+ rotation of previous
    `latest` into timestamped dirs, capped at maxItems)."""

    CKPT_NAME = "saved.ckpt.npz"

    # Process-wide registry of held saveDir locks: resolved path -> [file, refs].
    # flock conflicts between two fds even within one process, but the failure
    # mode the lock exists for is two PROCESSES interleaving saves; sequential
    # in-process Savers (save->resume tests, notebook reruns) are one owner's
    # deliberate pattern, so they share the process's lock via refcount.
    _held: dict = {}

    def __init__(self, saveDir: str, maxItems: int = 25):
        self._root = Path(saveDir)
        self._maxItems = maxItems
        self._previous: Optional[Path] = None
        self._root.mkdir(parents=True, exist_ok=True)
        # One live trainer per saveDir. Two trainers sharing a saveDir rotate
        # each other's `latest/` away mid-run and interleave saves into the
        # same file — observed corrupting a 20k-step run when a supervisor
        # relaunch raced a still-alive trainer. The reference is implicitly
        # protected by torchrun owning the only rank-0 (train/utils.py:63-77);
        # here an exclusive flock held for the process lifetime is the
        # equivalent. Kernel releases it on any death, including SIGKILL.
        import fcntl
        self._lockKey = str(self._root.resolve())
        self._lockHeld = False
        entry = Saver._held.get(self._lockKey)
        if entry is not None:
            entry[1] += 1
        else:
            lockFile = open(self._root / ".lock", "w")
            try:
                fcntl.flock(lockFile, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                lockFile.close()
                raise RuntimeError(
                    f"saveDir {self._root} is locked by another live trainer "
                    "(concurrent trainers on one saveDir corrupt checkpoints; "
                    "stop the other process first)")
            lockFile.write(str(os.getpid()))
            lockFile.flush()
            Saver._held[self._lockKey] = [lockFile, 1]
        self._lockHeld = True
        latest = self._root / "latest"
        if latest.exists() and any(latest.iterdir()):
            stamp = time.strftime("%Y%m%d_%H%M%S")
            target = self._root / stamp
            while target.exists():
                stamp += "_"
                target = self._root / stamp
            shutil.move(str(latest), str(target))
            self._previous = target
        else:
            # `latest/` empty but history exists: the previous run died
            # between Saver init (rotation) and its first save. Resume from
            # the newest rotated checkpoint instead of silently restarting
            # from step 0 (reference auto-resume intent, train/cli.py:31-39).
            history = sorted((d for d in self._root.iterdir()
                              if d.is_dir() and d.name != "latest"
                              and (d / self.CKPT_NAME).exists()), reverse=True)
            if history:
                self._previous = history[0]
        latest.mkdir(parents=True, exist_ok=True)
        self._rotate()

    def close(self):
        """Release this Saver's share of the saveDir lock (idempotent).
        Process death releases the underlying flock too; the refcount exists
        so the last in-process holder closing actually frees it for other
        processes."""
        if not getattr(self, "_lockHeld", False):
            return
        self._lockHeld = False
        entry = Saver._held.get(self._lockKey)
        if entry is None:
            return
        entry[1] -= 1
        if entry[1] <= 0:
            entry[0].close()
            del Saver._held[self._lockKey]

    def __del__(self):
        self.close()

    @property
    def PreviousCkpt(self) -> Optional[Path]:
        """Where the pre-rotation `latest` checkpoint now lives (for resume)."""
        if self._previous is None:
            return None
        p = self._previous / self.CKPT_NAME
        return p if p.exists() else None

    @property
    def SaveDir(self) -> Path:
        return self._root / "latest"

    @property
    def CkptPath(self) -> Path:
        return self.SaveDir / self.CKPT_NAME

    def _rotate(self):
        history = sorted(d for d in self._root.iterdir()
                         if d.is_dir() and d.name != "latest")
        while len(history) > self._maxItems:
            shutil.rmtree(history.pop(0), ignore_errors=True)

    def save(self, tree: Any, meta: Optional[dict] = None):
        meta = dict(meta or {})
        meta.setdefault("version", mcquic_tpu.__version__)
        tmp = self.CkptPath.with_suffix(".npz.tmp.npz")
        saveTree(tmp, tree, None)
        os.replace(tmp, self.CkptPath)
        self.CkptPath.with_suffix(".json").write_text(json.dumps(meta))

    @staticmethod
    def probeResume(saveDir: str) -> Optional[Path]:
        """Auto-resume probe (reference train/cli.py:31-39)."""
        p = Path(saveDir) / "latest" / Saver.CKPT_NAME
        return p if p.exists() else None

    @staticmethod
    def load(path) -> tuple:
        return loadTree(Path(path))


def exportModel(path: Path, variables: Any, config: dict, qp: str = "-1",
                bf16: bool = False):
    """Strip training state; write {model, config, version} with sha256-suffixed
    name (reference validate/cli.py:77-100).

    `bf16=True` additionally casts float32 PARAMS to bfloat16 for a half-size
    deploy artifact (bf16 serving measured quality-free, docs/RD_RESULTS_r03.md;
    loadTree restores them as float32). Coder tables stay exact — rANS
    frequency tables must match bit-for-bit between encoder and decoder."""
    from mcquic_tpu.utils import hashOfFile
    params = variables["params"]
    if bf16:
        import ml_dtypes
        params = jax.tree_util.tree_map(
            lambda a: np.asarray(a).astype(ml_dtypes.bfloat16)
            if np.asarray(a).dtype == np.float32 else np.asarray(a), params)
    path = Path(path)
    saveTree(path, {"params": params, "coder": variables.get("coder", {})},
             {"config": config, "version": mcquic_tpu.__version__, "qp": qp})
    digest = hashOfFile(str(path))
    final = path.with_name(f"{path.stem.split('.')[0]}_{digest[:8]}.mcquic.npz")
    shutil.move(str(path), str(final))
    jsonSide = path.with_suffix(".json")
    if jsonSide.exists():
        shutil.move(str(jsonSide), str(final.with_suffix(".json")))
    return final
