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

    def _ema_on_disk(self, step: int) -> str:
        """What the checkpoint's optional ema_params field looks like on disk:
        'absent' (pre-EMA save), 'none' (saved with EMA off), or 'tree'."""
        import json

        path = os.path.join(self.directory, str(step), "state", "_METADATA")
        try:
            with open(path) as f:
                tree = json.load(f)["tree_metadata"]
        except (OSError, KeyError, ValueError):
            return "unknown"
        keys = [k for k in tree if "'ema_params'" in k]
        if not keys:
            return "absent"
        if keys == ["('ema_params',)"]:
            return "none"
        return "tree"

    def restore(self, step: int, target) -> Tuple[Any, Dict]:
        """Restore TrainState (using `target` as the structure template).

        Tolerates the optional `ema_params` field in EITHER direction: a
        pre-EMA checkpoint loads into an EMA-enabled state (EMA left None —
        callers that require it raise their own error) and an EMA-carrying
        checkpoint loads into a plain state (EMA restored and kept). The
        on-disk variant is read from the step's _METADATA and the restore
        template (a dict mirroring the saved fields, leaf shardings taken
        from `target`) is built to match, so the optional field never
        hard-fails the structure check."""
        import jax

        def _do_raw(t):
            out = self._mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(t),
                    metadata=ocp.args.JsonRestore(),
                ),
            )
            return out["state"], out["metadata"]

        if not (hasattr(target, "params") and hasattr(target, "opt_state")):
            return _do_raw(target)  # generic pytree target: restore as-is

        def _template(kind: str) -> dict:
            tmpl = {
                "step": target.step,
                "params": target.params,
                "opt_state": target.opt_state,
            }
            if kind == "none":
                tmpl["ema_params"] = None
            elif kind == "tree":
                # EMA mirrors the param shapes/shardings
                tmpl["ema_params"] = jax.tree_util.tree_map(
                    lambda x: x, target.params
                )
            return tmpl

        _do = _do_raw

        kind = self._ema_on_disk(step)
        if kind != "unknown":
            st, meta = _do(_template(kind))
        else:  # metadata unreadable: try the three variants in turn
            last = None
            for k in ("tree", "none", "absent"):
                try:
                    st, meta = _do(_template(k))
                    break
                except ValueError as e:
                    if "ema_params" not in str(e):
                        raise
                    last = e
            else:
                raise last
        # ema_params is ONLY ever checkpoint data — never the template's
        # (random-init) copy, which would silently serve untrained weights.
        state = target.replace(
            step=st["step"],
            params=st["params"],
            opt_state=st["opt_state"],
            ema_params=st.get("ema_params"),
        )
        return state, meta

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


def export_release_params(params, out: str, codec: str = "webp",
                          meta: Optional[Dict[str, Any]] = None) -> str:
    """Write an inference-only release artifact: the params pytree as one
    fp16 npz (~230 MB at reference width vs several GB of full train state).
    fp16 stores the bf16 compute values losslessly (trained-weight exponents
    fit fp16's range; 10 mantissa bits > bf16's 8), so bf16-compute
    restoration output is unchanged. Reference counterpart:
    torch.save(model_state_dict) (webp_training.py:796-804)."""
    import numpy as np
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params, sep="/")
    arrays = {k: np.asarray(v, np.float16) for k, v in flat.items()}
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez_compressed(out, __codec__=np.str_(codec),
                        __meta__=np.str_(str(meta or {})), **arrays)
    return out


def load_release_params(npz_path: str):
    """Inverse of `export_release_params`: npz -> flax params pytree (f32),
    for the --params-npz deployment path (no Orbax / optimizer state)."""
    import numpy as np
    from flax.traverse_util import unflatten_dict

    data = np.load(npz_path)
    flat = {
        tuple(k.split("/")): np.asarray(data[k], np.float32)
        for k in data.files if not k.startswith("__")
    }
    return unflatten_dict(flat)
