"""Orbax-backed checkpointing with best-on-dev retention.

Reference parity: ``tf.train.Saver`` saved ``model.ckpt-<epoch>`` — ALL
variables, optimizer slots included — only when the dev metric improved, and
eval restored a chosen epoch (SURVEY.md §5.4). Orbax CheckpointManager
reproduces that plus automatic latest-step restore for crash recovery —
which the reference lacked (§5.3).

State is stored as composite items so consumers restore only what they need:
``params`` (eval/decode) separately from ``extra`` (optimizer state, RNG,
LR-controller state, counters — everything required for bit-exact resume).
NOTE: this composite layout replaced round 1's single StandardSave item;
checkpoints written before that change are not readable by this manager.
"""

from __future__ import annotations

from pathlib import Path

import orbax.checkpoint as ocp

ITEMS = ("params", "extra")


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        from orbax.checkpoint import checkpoint_managers as ocp_cm

        # Keep the best N on dev error AND always the latest: plain
        # max_to_keep+best_fn deletes the newest checkpoint whenever it is
        # not among the best (verified against orbax 0.11), so after a
        # crash during a dev plateau the latest-epoch resume would restore
        # a stale epoch and silently re-train the plateaued tail.
        policy = ocp_cm.AnyPreservationPolicy([
            ocp_cm.LatestN(1),
            ocp_cm.BestN(
                get_metric_fn=lambda m: m["dev_error_rate"],
                reverse=True,  # ascending sort keeps the LARGEST; reverse
                # keeps the n smallest error rates ("min" semantics)
                n=max_to_keep,
            ),
        ])
        self._mngr = ocp.CheckpointManager(
            Path(directory).absolute(),
            item_names=ITEMS,
            options=ocp.CheckpointManagerOptions(
                preservation_policy=policy,
                best_fn=lambda m: m["dev_error_rate"],
                best_mode="min",
            ),
        )

    def save(self, epoch: int, state: dict, dev_error_rate: float):
        """``state`` maps item names (any subset of ITEMS) to pytrees."""
        self._mngr.save(
            epoch,
            args=ocp.args.Composite(
                **{k: ocp.args.StandardSave(v) for k, v in state.items()}
            ),
            metrics={"dev_error_rate": float(dev_error_rate)},
        )
        self._mngr.wait_until_finished()

    def restore(self, state_like: dict, epoch: int | None = None):
        """Restore best (or given) epoch; only the items present in
        ``state_like`` are read (eval passes just ``{"params": ...}``)."""
        if epoch is not None:
            step = epoch
        else:
            # explicit None checks: epoch 0 is a valid (falsy) best step
            best = self._mngr.best_step()
            step = best if best is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                **{k: ocp.args.StandardRestore(v) for k, v in state_like.items()}
            ),
        )
        return step, {k: restored[k] for k in state_like}

    @property
    def latest_epoch(self):
        return self._mngr.latest_step()

    @property
    def best_epoch(self):
        return self._mngr.best_step()
