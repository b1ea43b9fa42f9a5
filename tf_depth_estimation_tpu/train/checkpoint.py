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
from typing import Any, Dict, Optional

import numpy as np
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

    def restore(self, step: Optional[int] = None, like: Any = None,
                only_group: Optional[str] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if like is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(like))
        # Templateless restore (tools that only have the directory, e.g.
        # export_turbo_params.py): rebuild the target tree from the checkpoint's
        # own array metadata — this orbax raises without a concrete, sharded
        # template, so synthesize one on a host device.  ``only_group`` narrows
        # the synthesized template (PyTreeRestore partial_restore) so reading one
        # group does not deserialize the 3x-size opt_state of the others.
        import jax

        path = os.path.join(self.directory, str(step), "default")
        meta = ocp.StandardCheckpointer().metadata(path).item_metadata.tree
        sharding = jax.sharding.SingleDeviceSharding(jax.local_devices(backend="cpu")[0])
        template = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding), meta)
        if only_group is not None:
            if only_group not in template:
                raise KeyError(
                    f"group {only_group!r} not in checkpoint {path} "
                    f"(has {sorted(template)})")
            narrowed = {only_group: template[only_group]}
            restore_args = jax.tree_util.tree_map(
                lambda s: ocp.ArrayRestoreArgs(sharding=sharding, dtype=s.dtype),
                narrowed)
            try:
                return ocp.PyTreeCheckpointer().restore(
                    path, args=ocp.args.PyTreeRestore(
                        narrowed, restore_args=restore_args,
                        partial_restore=True))
            except Exception:
                # Some checkpoints carry literal None leaves (optax EmptyState)
                # in their on-disk structure, which the partial PyTreeRestore
                # path asserts on; fall back to the full Standard restore and
                # subselect (costs the sibling groups' deserialization only).
                full = ocp.StandardCheckpointer().restore(path, template)
                return {only_group: full[only_group]}
        return ocp.StandardCheckpointer().restore(path, template)

    def restore_group(self, group: str, step: Optional[int] = None, like: Any = None) -> Any:
        """Restore a single named group (cross-phase restore,
        ``split_training.py:174``: phase 2 loads only the pair net).

        Always a partial restore: the checkpoint may hold other groups (e.g. a
        multi-group curriculum save), and only this group is deserialized.
        """
        if like is None:
            return self.restore(step, only_group=group)[group]
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        path = os.path.join(self.directory, str(step), "default")
        template = {group: like}
        restore_args = ocp.checkpoint_utils.construct_restore_args(template)
        try:
            return ocp.PyTreeCheckpointer().restore(
                path, args=ocp.args.PyTreeRestore(
                    template, restore_args=restore_args,
                    partial_restore=True))[group]
        except Exception:
            # None-leaf on-disk structures (see restore()); single-group
            # checkpoints also land here and restore strictly.
            return self._mgr.restore(step, args=ocp.args.StandardRestore(
                {group: like}))[group]

    def close(self):
        self._mgr.close()


# ---------------------------------------------------------------------------
# Flat .npz weight files — the portable, git-committable serving format.
#
# Orbax directories carry the optimizer state (3x the parameter bytes) and an
# on-disk layout that can't live in a repo; a serving checkpoint is just
# {params, batch_stats}.  Keys are '/'-joined tree paths, values float32.
# The reference's analog is the TF1 checkpoint restored by variable name
# (``batch_prediction.py:49-55``); here the names are the flax tree paths.
# ---------------------------------------------------------------------------

_SEP = "/"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}{_SEP}"))
    else:
        a = np.asarray(tree)
        if not (np.issubdtype(a.dtype, np.floating)
                or a.dtype.name in ("bfloat16", "float16")):
            raise TypeError(
                f"serving variable {prefix.rstrip(_SEP)!r} has non-float dtype "
                f"{a.dtype} — .npz weights store f32 floats only")
        out[prefix.rstrip(_SEP)] = a.astype(np.float32)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        *parents, leaf = key.split(_SEP)
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = value
    return tree


def save_variables_npz(path: str, variables: Dict[str, Any], **meta: str):
    """Write serving variables ({'params': ..., 'batch_stats': ...}) as one .npz.

    ``meta`` keys are stored under ``__meta_<name>`` (e.g. variant='nano',
    provenance notes) and returned by :func:`load_variables_npz`.
    """
    flat = _flatten({k: v for k, v in variables.items()})
    for name, value in meta.items():
        flat[f"__meta_{name}"] = np.asarray(str(value))
    # Record the top-level collection names: _flatten drops empty subtrees (a
    # BN-free model has batch_stats={}), so the loader needs this to give them
    # back as {} instead of a far-away KeyError in the consumer.
    flat["__collections"] = np.asarray(",".join(sorted(variables)))
    np.savez_compressed(path, **flat)


def load_variables_npz(path: str):
    """Inverse of :func:`save_variables_npz` -> (variables, meta).

    Top-level collections that were empty at save time (e.g. a BN-free model's
    ``batch_stats``) come back as ``{}``.
    """
    with np.load(path) as data:
        meta = {k[len("__meta_"):]: str(data[k]) for k in data.files
                if k.startswith("__meta_")}
        collections = ([c for c in str(data["__collections"]).split(",") if c]
                       if "__collections" in data.files else [])
        flat = {k: data[k] for k in data.files
                if not (k.startswith("__meta_") or k == "__collections")}
    tree = _unflatten(flat)
    for name in collections:
        tree.setdefault(name, {})
    return tree, meta
