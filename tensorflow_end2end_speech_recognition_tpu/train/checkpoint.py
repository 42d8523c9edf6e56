"""Orbax-backed checkpointing with best-on-dev retention.

Reference parity: ``tf.train.Saver`` saved ``model.ckpt-<epoch>`` only when
the dev metric improved, and eval restored a chosen epoch (SURVEY.md §5.4).
Orbax CheckpointManager reproduces that plus automatic latest-step restore
for crash recovery — which the reference lacked (§5.3).
"""

from __future__ import annotations

from pathlib import Path

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mngr = ocp.CheckpointManager(
            Path(directory).absolute(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m["dev_error_rate"],
                best_mode="min",
            ),
        )

    def save(self, epoch: int, state, dev_error_rate: float):
        self._mngr.save(
            epoch,
            args=ocp.args.StandardSave(state),
            metrics={"dev_error_rate": float(dev_error_rate)},
        )
        self._mngr.wait_until_finished()

    def restore(self, state_like, epoch: int | None = None):
        """Restore best (or given) epoch into the structure of ``state_like``."""
        step = epoch if epoch is not None else (self._mngr.best_step() or self._mngr.latest_step())
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return step, self._mngr.restore(step, args=ocp.args.StandardRestore(state_like))

    @property
    def latest_epoch(self):
        return self._mngr.latest_step()

    @property
    def best_epoch(self):
        return self._mngr.best_step()
