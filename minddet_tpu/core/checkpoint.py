"""Checkpointing via orbax: async save, keep-max rotation, auto-resume.

Replaces the reference's ``ModelCheckpoint`` + ``CheckpointConfig`` +
``load_checkpoint``/``load_param_into_net`` machinery (SURVEY.md §5.4;
``centernet/train.py:176-191``) with orbax's async, multi-host-safe
checkpointer. Also hosts the torch->JAX parameter conversion entry point that
BASELINE.json requires per model.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for pytree train states."""

    def __init__(
        self,
        directory: str,
        keep_max: int = 5,
        save_interval_steps: int = 1000,
        async_save: bool = True,
    ):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep_max,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        return self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_pytree(path: str, tree: Any) -> None:
    """One-shot save of any pytree (e.g. converted reference weights)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def load_pytree(path: str, template: Optional[Any] = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))


def tree_size_bytes(tree: Any) -> int:
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "size")
    )
