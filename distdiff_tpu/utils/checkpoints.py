"""Orbax-backed checkpointing for trainer state and guide variables.

Replaces the reference's ``torch.save(checkpoint.pth.tar)`` +
``model_best.pth.tar`` copy scheme (``train.py:341-346``) with orbax; the
on-disk *layout* (a ``checkpoint`` dir per run with a ``best`` alias) keeps
the reference's directory conventions so ``parse_logs``-style tooling finds
runs in the same places.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_pytree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree)


def _restore_as_numpy(ckptr, path: str, template: Optional[Any]):
    """Cross-backend restore: materialize every array leaf as host numpy.

    A checkpoint saved under one backend (e.g. the axon TPU) records device
    shardings that do not exist under another (e.g. a CPU wrapper run);
    orbax's default restore then fails with "sharding ... Got None".
    Restoring to ``np.ndarray`` sidesteps device placement entirely — JAX
    consumers device-put on first use.
    """
    if template is not None:
        item = template
    else:
        meta = ckptr.metadata(path)
        # StepMetadata wraps the pytree of ArrayMetadata leaves
        item = getattr(getattr(meta, "item_metadata", meta), "tree", meta)

    def _ra(leaf):
        if hasattr(leaf, "shape"):
            return ocp.RestoreArgs(restore_type=np.ndarray)
        return ocp.RestoreArgs()

    restore_args = jax.tree.map(_ra, item)
    if template is None:
        return ckptr.restore(path, restore_args=restore_args)
    return ckptr.restore(path, item=template, restore_args=restore_args)


def restore_pytree(path: str, template: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            if template is None:
                return ckptr.restore(path)
            return ckptr.restore(path, item=template)
        except ValueError:
            # saved-sharding metadata unresolvable on this backend
            return _restore_as_numpy(ckptr, path, template)


def restore_variables(path: str, template: Any) -> Any:
    """Restore model variables ({'params': ..., 'batch_stats': ...}).

    Accepts either a bare variables checkpoint or a trainer checkpoint as
    written by :func:`save_train_checkpoint` (``{"state": TrainState,
    "epoch", "best_acc"}`` — e.g. a trainer's ``model_best`` dir passed as
    ``--encoder_weight_path``). Only the template's collections (params,
    batch_stats) are deserialized — the optimizer state (2× the params
    bytes for Adam) never leaves disk. Leaves come back as host numpy
    (cross-backend safe, see :func:`_restore_as_numpy`); a checkpoint
    lacking a template collection raises a ValueError naming it.
    """
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path)
        tree_meta = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
        is_trainer = (hasattr(tree_meta, "keys") and "state" in tree_meta
                      and "epoch" in tree_meta)
        avail = tree_meta["state"] if is_trainer else tree_meta
        missing = [k for k in template
                   if not (hasattr(avail, "keys") and k in avail)]
        if missing:
            have = sorted(avail.keys()) if hasattr(avail, "keys") else avail
            raise ValueError(
                f"checkpoint at {path} lacks variable collections "
                f"{missing} required by the model (available: {have})")
        item: Any = {k: template[k] for k in template}
        if is_trainer:
            item = {"state": item}

        def _ra(leaf):
            if hasattr(leaf, "shape"):
                return ocp.RestoreArgs(restore_type=np.ndarray)
            return ocp.RestoreArgs()

        # transforms={} + item restores ONLY the item's keys (partial
        # restore); restore_args is mandatory alongside transforms
        restored = ckptr.restore(path, item=item, transforms={},
                                 restore_args=jax.tree.map(_ra, item))
    picked = restored["state"] if is_trainer else restored
    return jax.tree.map(lambda t, r: r, template, picked)


def save_train_checkpoint(
    out_dir: str,
    state: Any,
    epoch: int,
    best_acc: float,
    is_best: bool,
) -> None:
    """Epoch checkpoint + best alias (reference semantics, ``train.py:341-346``)."""
    os.makedirs(out_dir, exist_ok=True)
    payload = {"state": state, "epoch": epoch, "best_acc": best_acc}
    save_pytree(os.path.join(out_dir, "checkpoint"), payload)
    if is_best:
        best = os.path.join(out_dir, "model_best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(os.path.join(out_dir, "checkpoint"), best)


def load_train_checkpoint(out_dir: str, state_template: Any) -> Optional[dict]:
    path = os.path.join(out_dir, "checkpoint")
    if not os.path.exists(path):
        return None
    return restore_pytree(
        path, {"state": state_template, "epoch": 0, "best_acc": 0.0}
    )
