"""Orbax checkpointing with true resume.

The reference saves a dict {epoch, model/optimizer/scheduler state, val
metrics} at each new best val-PSNR (webp_training.py:794-804) but never
consumes the optimizer state — training always restarts from scratch. Here
checkpointing is a real subsystem: async Orbax saves of the full TrainState +
metadata, best-metric tracking AND latest-step retention, and
`restore_latest()` that resumes step/optimizer state exactly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # Retention must serve BOTH consumers: restore_best (top val-PSNR)
        # and restore_latest (resume). A plain best_fn+max_to_keep retention
        # deletes the newest checkpoint whenever early epochs scored best,
        # silently breaking resume (observed: a 60-epoch run retained only
        # epochs 1-3; the follow-up run restarted from scratch). Keep the
        # best `max_to_keep` by metric AND the most recent two.
        from orbax.checkpoint import checkpoint_managers as _cm

        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                best_fn=lambda m: m.get("val_psnr", -float("inf")),
                best_mode="max",
                preservation_policy=_cm.AnyPreservationPolicy([
                    _cm.BestN(
                        get_metric_fn=lambda m: m.get("val_psnr", -float("inf")),
                        n=max_to_keep,
                    ),
                    _cm.LatestN(n=2),
                ]),
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state, metrics: Optional[Dict[str, float]] = None):
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                metadata=ocp.args.JsonSave(dict(metrics or {}, step=step)),
            ),
            metrics=dict(metrics or {}),
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, step: int, target) -> Tuple[Any, Dict]:
        """Restore TrainState (using `target` as the structure template)."""
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(target),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        return out["state"], out["metadata"]

    def restore_latest(self, target) -> Optional[Tuple[Any, Dict]]:
        step = self.latest_step()
        if step is None:
            return None
        return self.restore(step, target)

    def restore_best(self, target) -> Optional[Tuple[Any, Dict]]:
        step = self.best_step()
        if step is None:
            return None
        return self.restore(step, target)

    def close(self):
        self._mgr.close()
