#!/usr/bin/env python
"""Export a trained Orbax checkpoint as a small single-file release artifact.

Training checkpoints carry the full optimizer state (several GB, gitignored,
and wiped with the machine). A release artifact is the INFERENCE weights
only — the EMA params evaluation/serving actually load — as one fp16 npz
(train/checkpoint.py export_release_params). The evaluate/restore/serve
CLIs load these via --params-npz, bypassing Orbax entirely — the deployment
story for a host with no training stack. Reference counterpart:
torch.save/load of model_state_dict (webp_training.py:796-804,
webp_inference.py:620-630).

Usage:
    python scripts/export_release_ckpt.py artifacts/r3_webp --codec webp \
        --out artifacts_release/webp_teacher_r3.npz [--raw-params]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint_dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--codec", default="webp")
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--attn-max-res", type=int, default=32,
                    help="must match the TRAINING setting: attention "
                         "submodules (and their params) only exist at "
                         "levels <= this (models/unet.py ResAttnBlock), so "
                         "a mismatched template fails Orbax restore. All "
                         "round-3 teachers train at 32.")
    ap.add_argument("--raw-params", action="store_true",
                    help="export the raw (non-EMA) params")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ddpm_image_restoration_tpu.config import ModelConfig, TrainConfig
    from ddpm_image_restoration_tpu.models import build_model
    from ddpm_image_restoration_tpu.train.checkpoint import (
        CheckpointManager,
        export_release_params,
    )
    from ddpm_image_restoration_tpu.train.steps import create_train_state

    use_ema = not args.raw_params
    mcfg = ModelConfig(image_size=args.image_size,
                       attn_max_resolution=args.attn_max_res)
    model = build_model(args.codec, mcfg)
    tc = TrainConfig(codec=args.codec, model=mcfg,
                     checkpoint_dir=args.checkpoint_dir,
                     ema_decay=1.0 if use_ema else 0.0)
    state = create_train_state(model, tc, jax.random.PRNGKey(0))
    mgr = CheckpointManager(args.checkpoint_dir)
    restored = mgr.restore_best(state) or mgr.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
    state, meta = restored
    params = state.ema_params if (use_ema and state.ema_params is not None) \
        else state.params
    out = export_release_params(params, args.out, codec=args.codec, meta=meta)
    import numpy as np  # size/count report

    data = np.load(out)
    n = sum(data[k].size for k in data.files if not k.startswith("__"))
    print(f"exported {n/1e6:.1f}M params -> {out} "
          f"({os.path.getsize(out)/1e6:.0f} MB), meta={meta}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
