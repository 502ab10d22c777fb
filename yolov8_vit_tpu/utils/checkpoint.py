"""Orbax checkpointing of params + optimizer state.

The reference saves bare `state_dict` at best-val and cannot resume
optimizer state or mid-run (SURVEY.md §5 "Checkpoint/resume").  Here full
train state (params, opt state, epoch, best metric) checkpoints atomically
via orbax, with the same best-val gating semantics layered on top.
"""
from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class TrainCheckpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, params: Any, opt_state: Any,
             extra: dict | None = None) -> None:
        state = {"params": params, "opt_state": opt_state,
                 "extra": extra or {}}
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, step: int | None = None,
                template: Any | None = None) -> dict | None:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def close(self):
        self._mgr.close()
