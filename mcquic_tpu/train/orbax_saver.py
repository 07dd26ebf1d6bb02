"""Orbax-backed checkpointing (alternative to the npz Saver).

For large sharded models the npz Saver gathers everything to host rank 0;
orbax writes each shard from its owning host asynchronously and restores
directly into the target sharding — the right backend for multi-host pods
(the reference's analogue is fairscale OSS `consolidate_state_dict` before a
rank-0 torch.save, trainer.py:112-117, which this removes the need for).

Same directory contract as Saver: `saveDir/steps/<step>` managed by a
CheckpointManager with bounded retention + auto-resume from the latest step.
"""
import logging
from pathlib import Path
from typing import Any, Optional

import jax

logger = logging.getLogger("mcquic_tpu.orbax")


class OrbaxSaver:
    def __init__(self, saveDir: str, maxItems: int = 25):
        import orbax.checkpoint as ocp
        self._root = Path(saveDir).absolute() / "orbax"
        self._root.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            str(self._root),
            options=ocp.CheckpointManagerOptions(max_to_keep=maxItems,
                                                 create=True))

    def save(self, step: int, tree: Any, force: bool = False):
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(tree), force=force)

    def waitUntilFinished(self):
        self._mgr.wait_until_finished()

    def latestStep(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        """Restore onto `template`'s structure/shardings (abstract target)."""
        import orbax.checkpoint as ocp
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no orbax checkpoint to restore")
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape") else x, template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self):
        self._mgr.close()
