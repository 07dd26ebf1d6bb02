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
import threading
import time
import weakref
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
    loadTree restores such keys as bfloat16.
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
    """Inverse of saveTree. bf16 leaves come back as ml_dtypes.bfloat16 —
    the dtype they were saved with — so a training checkpoint containing
    any bf16 leaf resumes with identical dtypes (fresh vs resumed runs stay
    numerically on the same trajectory). Inference consumers that want fp32
    params upcast explicitly via `upcastBf16`."""
    path = Path(path)
    with np.load(str(path), allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    bf16Keys = [k for k in flat if k.endswith("@bf16")]
    if bf16Keys:
        import ml_dtypes
        for k in bf16Keys:
            flat[k[:-len("@bf16")]] = flat.pop(k).view(ml_dtypes.bfloat16)
    meta = None
    metaPath = path.with_suffix(".json")
    if metaPath.exists():
        meta = json.loads(metaPath.read_text())
    return _unflatten(flat), meta


def upcastBf16(tree: Any) -> Any:
    """float32 view of every bfloat16 leaf (other leaves untouched) — the
    explicit upcast deploy/inference loaders apply to bf16 export artifacts
    (exportModel bf16=True); training resume keeps the saved dtypes."""
    import ml_dtypes

    def up(a):
        a = np.asarray(a)
        return a.astype(np.float32) if a.dtype == ml_dtypes.bfloat16 else a
    return jax.tree_util.tree_map(up, tree)


class Saver:
    """Save-dir layout: saveDir/latest/saved.ckpt.npz (+ rotation of previous
    `latest` into timestamped dirs, capped at maxItems)."""

    CKPT_NAME = "saved.ckpt.npz"

    # Process-wide registry of held saveDir locks:
    # resolved path -> [lockFile, WeakSet of holder Savers]. flock conflicts
    # between two fds even within one process, so the process keeps ONE fd
    # per saveDir; liveness is tracked per holder — a second Saver while the
    # first is still open is REFUSED (same interleaved-save corruption the
    # cross-process flock exists for), while sequential Savers
    # (save -> close -> resume, the test/notebook pattern) reuse the fd.
    _held: dict = {}
    _heldMutex = threading.Lock()

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
        with Saver._heldMutex:
            entry = Saver._held.get(self._lockKey)
            if entry is not None:
                if any(s._lockHeld for s in entry[1]):
                    raise RuntimeError(
                        f"saveDir {self._root} is already owned by a live "
                        "Saver in this process (close() it first — two "
                        "concurrent trainers on one saveDir interleave saves "
                        "and corrupt checkpoints)")
                # previous holder was dropped without close(); the process
                # still holds the flock fd — adopt it.
                entry[1].add(self)
            else:
                lockFile = open(self._root / ".lock", "w")
                try:
                    fcntl.flock(lockFile, fcntl.LOCK_EX | fcntl.LOCK_NB)
                except OSError:
                    lockFile.close()
                    raise RuntimeError(
                        f"saveDir {self._root} is locked by another live "
                        "trainer (concurrent trainers on one saveDir corrupt "
                        "checkpoints; stop the other process first)")
                lockFile.write(str(os.getpid()))
                lockFile.flush()
                Saver._held[self._lockKey] = [lockFile, weakref.WeakSet([self])]
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
        """Release the saveDir lock (idempotent). Process death releases the
        underlying flock too; closing the last live in-process holder frees
        it for other processes."""
        if not getattr(self, "_lockHeld", False):
            return
        with Saver._heldMutex:
            self._lockHeld = False
            entry = Saver._held.get(self._lockKey)
            if entry is None:
                return
            entry[1].discard(self)
            if not any(s._lockHeld for s in entry[1]):
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
    inference loaders upcast via upcastBf16). Coder tables stay exact — rANS
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
