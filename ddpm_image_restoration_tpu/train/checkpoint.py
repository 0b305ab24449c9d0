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

import jax
import numpy as np
import orbax.checkpoint as ocp

_OLD_GATE_KEYS = {"low_attn_in", "low_attn_out", "high_attn_in", "high_attn_out"}
_NEW_GATE_KEYS = {
    "gates_in_kernel", "gates_in_bias", "gates_out_kernel", "gates_out_bias",
}


def _fuse_gate_dict(d: dict) -> dict:
    """Fuse one old-layout freq-gate subtree (four {kernel,bias} convs) into
    the stacked pair layout of models/freq_blocks.py DCTFreqAwareBlock."""

    def arr(x):
        return np.asarray(x)

    def k2d(leaf):  # (1,1,cin,cout) conv kernel -> (cin,cout) matmul kernel
        k = arr(leaf)
        return k[0, 0] if k.ndim == 4 else k

    new = {k: v for k, v in d.items() if k not in _OLD_GATE_KEYS}
    li, hi = d["low_attn_in"], d["high_attn_in"]
    lo, ho = d["low_attn_out"], d["high_attn_out"]
    new["gates_in_kernel"] = np.stack([k2d(li["kernel"]), k2d(hi["kernel"])])
    new["gates_in_bias"] = np.stack([arr(li["bias"]), arr(hi["bias"])])
    new["gates_out_kernel"] = np.stack([k2d(lo["kernel"]), k2d(ho["kernel"])])
    new["gates_out_bias"] = np.stack([arr(lo["bias"]), arr(ho["bias"])])
    return new


def _unfuse_gate_dict(d: dict) -> dict:
    """Inverse of `_fuse_gate_dict` — used to build a restore *template* in
    the layout the old checkpoint was saved with."""
    new = {k: v for k, v in d.items() if k not in _NEW_GATE_KEYS}
    ki, bi = np.asarray(d["gates_in_kernel"]), np.asarray(d["gates_in_bias"])
    ko, bo = np.asarray(d["gates_out_kernel"]), np.asarray(d["gates_out_bias"])
    for idx, name in ((0, "low"), (1, "high")):
        new[f"{name}_attn_in"] = {"kernel": ki[idx][None, None], "bias": bi[idx]}
        new[f"{name}_attn_out"] = {"kernel": ko[idx][None, None], "bias": bo[idx]}
    return new


def _map_gate_subtrees(tree: Any, keys, fn) -> Any:
    """Apply `fn` to every dict subtree containing all of `keys`, anywhere in
    an arbitrary pytree (params and the optimizer's mu/nu mirror the same
    structure). Other subtrees/leaves pass through; custom pytree node types
    (TrainState, optax states) are preserved by tree_map."""

    def is_gate(x):
        return isinstance(x, dict) and keys.issubset(x.keys())

    return jax.tree_util.tree_map(
        lambda x: fn(x) if is_gate(x) else x, tree, is_leaf=is_gate
    )


def migrate_state_dict(tree: Any) -> Any:
    """Upgrade a pytree holding the pre-fusion gate layout to the fused one.

    Works on any nesting; subtrees already in the fused layout pass through
    unchanged.
    """
    return _map_gate_subtrees(tree, _OLD_GATE_KEYS, _fuse_gate_dict)


def downgrade_state_dict(tree: Any) -> Any:
    """Rewrite a fused-layout pytree into the pre-fusion layout (the restore
    template for old checkpoints)."""
    return _map_gate_subtrees(tree, _NEW_GATE_KEYS, _unfuse_gate_dict)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get("val_psnr", -float("inf")),
                best_mode="max",
                keep_checkpoints_without_metrics=True,
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
        """Restore TrainState (using `target` as the structure template).

        Checkpoints written before the freq-gate fusion restore through
        `migrate_state_dict` transparently.
        """
        try:
            out = self._mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(target),
                    metadata=ocp.args.JsonRestore(),
                ),
            )
            return out["state"], out["metadata"]
        except Exception:
            # old gate layout: restore against an old-layout template built
            # from the live target (structure then matches the checkpoint
            # exactly), and fuse the result.
            old_template = downgrade_state_dict(target)
            out = self._mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(old_template),
                    metadata=ocp.args.JsonRestore(),
                ),
            )
            return migrate_state_dict(out["state"]), out["metadata"]

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
