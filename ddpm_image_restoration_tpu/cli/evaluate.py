"""Evaluation entry point: `ddpm-ir-evaluate` (reference: python
webp_inference.py / avif_inference.py, webp_inference.py:954-987)."""

from __future__ import annotations

import argparse

import numpy as np

from ddpm_image_restoration_tpu.cli.common import configure_jax_cache, add_model_flags, eval_config_from


def _parse_protect_adaptive(v):
    """--protect-adaptive BETA: a float trust multiplier, or 'auto' = the
    calibrated quality-tapered real-photo schedule (policy.REAL_PHOTO_TRUST)."""
    if v is None:
        return None
    if isinstance(v, str) and v.lower() == "auto":
        from ddpm_image_restoration_tpu.diffusion.policy import (
            REAL_PHOTO_TRUST,
        )

        return REAL_PHOTO_TRUST
    return float(v)


def main(argv=None):
    import jax

    ap = argparse.ArgumentParser(description="Evaluate restoration quality across quality levels")
    add_model_flags(ap)
    ap.add_argument("--data-dir", default="./ILSVRC2012_img_val")
    ap.add_argument("--checkpoint-dir", default="./checkpoints")
    ap.add_argument("--params-npz", default=None,
                    help="load inference weights from a release npz "
                         "(scripts/export_release_ckpt.py) instead of an "
                         "Orbax checkpoint — no training stack needed; "
                         "--use-ema is implied by what was exported")
    ap.add_argument("--output-dir", default="./eval_results")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--max-images", type=int, default=0, help="0 = all (AVIF ref caps at 500)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--consistency", default="surrogate", choices=["surrogate", "callback", "host_loop"])
    ap.add_argument("--no-fid", action="store_true")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N")
    ap.add_argument("--synthetic-seed", type=int, default=99,
                    help="synthetic eval images use a held-out seed by default")
    ap.add_argument("--synthetic-kind", default="waves",
                    choices=["waves", "dead_leaves", "natural", "mixed"],
                    help="synthetic generator (dead_leaves = natural-image-"
                         "statistics proxy: occluding power-law disks)")
    ap.add_argument("--real", type=int, default=0, metavar="N",
                    help="evaluate on N real photographic patches harvested "
                         "from library-bundled images (-1 = all; the 'eval' "
                         "split, disjoint from --real training patches at "
                         "the same seed). Combines with --synthetic.")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--use-ema", action="store_true",
                    help="evaluate the EMA params from a checkpoint trained "
                         "with --ema-decay > 0")
    ap.add_argument("--prediction", default="direct", choices=["direct", "residual"])
    ap.add_argument("--stride", type=int, default=1,
                    help=">1 = reduced-step accelerated solver")
    ap.add_argument("--max-evals", type=int, default=0,
                    help="cap model evaluations per restore (stride derived "
                         "from each quality's init_t; for ddpm-ir-distill "
                         "checkpoints). Overrides --stride.")
    ap.add_argument("--encoder-reuse", type=int, default=1,
                    help="run the UNet encoder only every k-th model "
                         "evaluation, decoding from cached features between "
                         "(encoder-propagation acceleration)")
    ap.add_argument("--decoder-reuse-depth", type=int, default=0,
                    help="with --encoder-reuse > 1: also cache the deep "
                         "decoder stages across each reuse group, "
                         "recomputing only the last N high-resolution "
                         "stages + head (DeepCache-style)")
    ap.add_argument("--solver", default="manual", choices=["manual", "auto"],
                    help="'auto' = the per-quality production policy "
                         "(diffusion/policy.py): budgeted evals with "
                         "encoder reuse below q70 — overrides --stride/"
                         "--max-evals/--encoder-reuse per quality")
    ap.add_argument("--traced", action="store_true",
                    help="quality-traced fixed-budget solver: ONE compiled "
                         "program for the whole quality grid (needs "
                         "--max-evals or --solver auto); outputs match the "
                         "untraced budgeted path")
    ap.add_argument("--ensemble", type=int, default=1, choices=[1, 2, 4, 8],
                    help="dihedral test-time self-ensemble: average the "
                         "restorations of N flip/rotation variants")
    ap.add_argument("--qualities", type=int, nargs="*", default=None,
                    help="override the preset's eval quality list")
    ap.add_argument("--no-final-exact", action="store_true",
                    help="surrogate mode: skip the bit-exact host-codec "
                         "recomputation of the FINAL consistency projection "
                         "(on by default; off = pure-device output, inherits "
                         "the surrogate-vs-real mismatch at high qualities)")
    ap.add_argument("--protect-adaptive", default=None,
                    metavar="BETA",
                    help="content-aware trust-region protection: cap the "
                         "restoration residual's local RMS at BETA x the "
                         "calibrated codec damage D(quality) "
                         "(diffusion/ddrm.py residual_trust_blend); "
                         "composes with --protect and the auto policy")
    ap.add_argument("--protect", type=float, nargs=2, default=None, metavar=("LO", "HI"),
                    help="quality-gated blend: full restoration at q<=LO, "
                    "untouched input at q>=HI (non-reference guard for "
                    "near-lossless inputs)")
    # --- controlled-experiment overrides (preset defaults when omitted) ---
    ap.add_argument("--eta", type=float, default=None,
                    help="override the sampler's noise weight eta "
                         "(webp_training.py:463; 0 = no injected noise)")
    ap.add_argument("--eta-b", type=float, default=None,
                    help="override the consistency blend eta_b")
    ap.add_argument("--init-t", type=int, default=0,
                    help="pin the solver start step for every quality "
                         "(0 = per-quality clamp((100-q)/100*steps, lo, hi))")
    ap.add_argument("--phase-threshold", type=int, default=None,
                    help="override the phase-consistency quality gate "
                         "(avif.py:518; 0 disables phase consistency)")
    args = ap.parse_args(argv)
    from ddpm_image_restoration_tpu.cli.common import resolve_codecs

    codec, model_codec = resolve_codecs(args, allow_auto=False)
    args.codec = codec
    configure_jax_cache(getattr(args, "platform", None))

    from ddpm_image_restoration_tpu.config import TrainConfig
    from ddpm_image_restoration_tpu.data import (
        ConcatDataset,
        ImageFolderDataset,
        SyntheticImageDataset,
        split_indices,
    )
    from ddpm_image_restoration_tpu.evaluation.harness import evaluate_restoration
    from ddpm_image_restoration_tpu.models import build_model
    from ddpm_image_restoration_tpu.train.checkpoint import CheckpointManager
    from ddpm_image_restoration_tpu.train.steps import create_train_state

    cfg = eval_config_from(args)
    if args.qualities:
        import dataclasses

        cfg = dataclasses.replace(cfg, qualities_override=tuple(args.qualities))

    model = build_model(model_codec, cfg.model)
    if args.params_npz:
        from ddpm_image_restoration_tpu.train.checkpoint import (
            load_release_params,
        )

        eval_params = load_release_params(args.params_npz)
        print(f"loaded release params: {args.params_npz}")
    else:
        tc = TrainConfig(codec=model_codec, model=cfg.model,
                         checkpoint_dir=args.checkpoint_dir,
                         ema_decay=1.0 if args.use_ema else 0.0)
        state = create_train_state(model, tc, jax.random.PRNGKey(0))
        if not args.random_init:
            mgr = CheckpointManager(args.checkpoint_dir)
            restored = mgr.restore_best(state) or mgr.restore_latest(state)
            if restored is None:
                raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
            state, meta = restored
            print(f"loaded checkpoint: {meta}")
        eval_params = state.ema_params if args.use_ema else state.params
        if eval_params is None:
            raise SystemExit("--use-ema: checkpoint has no EMA params "
                             "(train with --ema-decay > 0)")

    parts = []
    if args.synthetic:
        parts.append(SyntheticImageDataset(args.synthetic,
                                           cfg.model.image_size,
                                           seed=args.synthetic_seed,
                                           kind=args.synthetic_kind))
    if args.real:
        from ddpm_image_restoration_tpu.data import RealPatchDataset

        # The real-patch split permutation is a FIXED constant (the
        # RealPatchDataset default), NOT --synthetic-seed: train.py always
        # splits at the default, so keying this off --synthetic-seed would
        # silently reshuffle the split and leak training patches into the
        # 'eval' side whenever a non-default synthetic seed is used.
        parts.append(RealPatchDataset(
            0 if args.real < 0 else args.real, cfg.model.image_size,
            split="eval"))
    if parts:
        ds = parts[0] if len(parts) == 1 else ConcatDataset(*parts)
        test_idx = np.arange(len(ds))
    else:
        ds = ImageFolderDataset(args.data_dir, cfg.model.image_size)
        _, _, test_idx = split_indices(len(ds))  # seeded test split
    images = np.stack([ds[int(i)] for i in test_idx])

    evaluate_restoration(cfg, model, eval_params, images,
                         batch_size=args.batch_size, prediction=args.prediction,
                         stride=args.stride,
                         encoder_reuse=args.encoder_reuse,
                         decoder_reuse_depth=args.decoder_reuse_depth,
                         ensemble=args.ensemble,
                         max_evals=args.max_evals,
                         final_exact=False if args.no_final_exact else None,
                         protect=tuple(args.protect) if args.protect else None,
                         protect_adaptive=_parse_protect_adaptive(
                             args.protect_adaptive),
                         eta=args.eta, eta_b=args.eta_b,
                         init_t_override=args.init_t,
                         phase_threshold=args.phase_threshold,
                         solver=args.solver, traced=args.traced)


if __name__ == "__main__":
    main()
