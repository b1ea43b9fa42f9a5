"""Orbax checkpointing with named parameter groups.

Covers the reference's four Saver idioms (SURVEY §5 'checkpoint/resume'):
(1) whole-model save/restore with ``--continue_train`` latest-checkpoint resume;
(2) scoped collections for the two-phase curriculum — the reference's
``model_pairdepth`` / ``model_singledepth`` variable scopes (``split_training.py:147,338``)
become named top-level groups in one checkpoint tree, restorable independently;
(3) max_to_keep rotation; (4) periodic saving by step.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 10):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, tree: Any, force: bool = False):
        """``tree``: arbitrary pytree, conventionally
        ``{"<group>": {"params": ..., "batch_stats": ..., "opt_state": ...}, ...}``."""
        self._mgr.save(step, args=ocp.args.StandardSave(tree), force=force)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, like: Any = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if like is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(like))
        return self._mgr.restore(step)

    def restore_group(self, group: str, step: Optional[int] = None, like: Any = None) -> Any:
        """Restore a single named group (cross-phase restore,
        ``split_training.py:174``: phase 2 loads only the pair net)."""
        tree = self.restore(step, like={group: like} if like is not None else None)
        return tree[group]

    def close(self):
        self._mgr.close()
