"""Orbax checkpointing with the reference's SKY/SUN separation and
restore-latest semantics.

Reference behavior (train.py:208-230, tf_utils.py:298-320): composite
checkpoint objects {epoch, models, optimizers}, CheckpointManager with
max_to_keep=5, save every 10 epochs, auto-restore the latest on startup.
Here the GanState / SunState pytrees (params, opt states, step, epoch)
checkpoint atomically via orbax.checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional, TypeVar

import jax
import orbax.checkpoint as ocp

T = TypeVar("T")


class CheckpointManager:
    """Thin wrapper: save(state, epoch), restore_latest(template)."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._directory = directory
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, template: T) -> Optional[T]:
        """Restore the newest checkpoint into the structure of `template`
        (an abstract or concrete state pytree). None if no checkpoint."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def restore_latest_host(self, template: T) -> Optional[T]:
        """Restore the newest checkpoint to HOST memory (numpy leaves).

        Restoring a big state through a concrete device template double-
        (or with a second model's template, triple-) books HBM: at 64x256
        the sunpose FCs make SunState 9.7 GB and GanState 6.5 GB, so the
        cross-stage weight handoff held ~16 GB on a 16 GB chip and died
        with an async RESOURCE_EXHAUSTED. Callers pass an ABSTRACT template
        (jax.eval_shape of the state factory — zero device bytes), get
        numpy leaves back (host RAM is 125 GB here), and device_put only
        the sub-trees they actually serve."""
        import numpy as np

        step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          template)
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), abstract)
        # A standalone PyTreeCheckpointer over the step's "default" item:
        # the manager binds one handler type per item name, so a manager
        # that has Standard-saved cannot also PyTree-restore (and vice
        # versa). StandardCheckpointHandler's on-disk format IS the PyTree
        # format, so reading it directly is exact.
        path = os.path.join(self._directory, str(step), "default")
        ckptr = ocp.PyTreeCheckpointer()
        try:
            return ckptr.restore(path, args=ocp.args.PyTreeRestore(
                item=abstract, restore_args=restore_args))
        finally:
            ckptr.close()

    def close(self):
        self._mgr.close()
