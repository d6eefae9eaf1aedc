"""Orbax checkpointing of model + optimizer + step.

Replaces the reference's Keras per-epoch weight snapshots and
JSON-architecture-plus-h5 resume flow (`modules/lidar/train/train.py:
183-195,229-230,286`; `model.py:195-209`) with an orbax CheckpointManager
over the nnx state pytree. Resume restores exactly — optimizer moments
included, which Keras lost on recompile.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp
from flax import nnx


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True
            ),
        )

    def save(self, step: int, model: nnx.Module, optimizer=None) -> None:
        payload = {"model": nnx.state(model)}
        if optimizer is not None:
            payload["opt"] = nnx.state(optimizer)
        self._mgr.save(step, args=ocp.args.PyTreeSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, model: nnx.Module, optimizer=None, step: int | None = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = {"model": nnx.state(model)}
        if optimizer is not None:
            template["opt"] = nnx.state(optimizer)
        # inference-time restores pass only the model while training saved
        # model+optimizer; partial restore skips the absent subtrees
        restored = self._mgr.restore(
            step,
            args=ocp.args.PyTreeRestore(
                template, partial_restore=optimizer is None
            ),
        )
        nnx.update(model, restored["model"])
        if optimizer is not None:
            nnx.update(optimizer, restored["opt"])
        return step

    def close(self):
        self._mgr.close()
