"""Distillation entry point: `ddpm-ir-distill`.

Compresses a trained teacher's multi-step DDRM restoration into a few-eval
student (train/distill.py). Not in the reference — this is the framework's
serving-acceleration stage on top of reference parity. The output is an
ordinary checkpoint directory; restore/serve/evaluate it with
``--max-evals N`` to run the student at its distilled budget.

Example:
    ddpm-ir-train   --codec webp --synthetic 256 --epochs 60 \
                    --checkpoint-dir ckpt_teacher
    ddpm-ir-distill --codec webp --synthetic 256 --epochs 30 \
                    --teacher-dir ckpt_teacher --checkpoint-dir ckpt_student \
                    --n-eval 2
    ddpm-ir-restore in.jpg --codec webp --checkpoint-dir ckpt_student \
                    --max-evals 2
"""

from __future__ import annotations

import argparse

from ddpm_image_restoration_tpu.cli.common import (
    add_model_flags,
    configure_jax_cache,
    train_config_from,
)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Distill a trained DDRM restorer into a few-eval student"
    )
    add_model_flags(ap)
    ap.add_argument("--teacher-dir", default="",
                    help="checkpoint dir of the trained teacher (best/EMA "
                         "weights are used)")
    ap.add_argument("--teacher-npz", default="",
                    help="release-npz teacher weights (scripts/"
                         "export_release_ckpt.py output) — the durable "
                         "alternative when the teacher's Orbax tree is gone; "
                         "overrides --teacher-dir")
    ap.add_argument("--n-eval", type=int, default=1,
                    help="student model evaluations per restore")
    ap.add_argument("--teacher-stride", type=int, default=1,
                    help="teacher solver stride (1 = full solver)")
    ap.add_argument("--qualities", type=int, nargs="+", default=[],
                    help="quality buckets to distill (default: the codec "
                         "preset's full EVAL quality grid — each quality is "
                         "its own init_t budget and the student only learns "
                         "the budgets it trains)")
    ap.add_argument("--gt-weight", type=float, default=0.3,
                    help="weight of the clean-image anchor term in the "
                         "distillation loss")
    ap.add_argument("--progressive", action="store_true",
                    help="halve the eval budget stage by stage down to "
                         "--n-eval (each stage's student teaches the next) "
                         "instead of one direct jump")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--steps", type=int, default=100, help="diffusion timesteps")
    ap.add_argument("--batch-size", type=int, default=0, help="0 = codec preset default")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-dir", default="./ILSVRC2012_img_val")
    ap.add_argument("--data-workers", type=int, default=4)
    ap.add_argument("--no-cache-decoded", action="store_true")
    ap.add_argument("--checkpoint-dir", default="./checkpoints_distilled")
    ap.add_argument("--consistency", default="surrogate",
                    choices=["surrogate", "callback", "host_loop"],
                    help="consistency mode for VALIDATION restores "
                         "(distillation itself always trains through the "
                         "differentiable surrogate)")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="distill on N synthetic images instead of --data-dir")
    ap.add_argument("--synthetic-kind", default="waves",
                    choices=["waves", "dead_leaves", "natural", "mixed"])
    ap.add_argument("--ema-decay", type=float, default=0.0)
    ap.add_argument("--lr", type=float, default=0.0,
                    help="learning rate (0 = the codec preset's training "
                         "value; distillation fine-tunes, so ~10x lower is "
                         "a good start)")
    ap.add_argument("--ckpt-interval", type=int, default=1,
                    help="minimum epochs between checkpoint saves (the last "
                         "epoch always saves)")
    ap.add_argument("--augment", action="store_true",
                    help="dihedral-8 augmentation of the clean image before "
                         "codec degradation")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)
    if args.codec in ("auto", "all"):
        raise SystemExit("distillation is per-codec: --codec jpeg|webp|avif")
    configure_jax_cache(getattr(args, "platform", None))

    cfg = train_config_from(args)
    from ddpm_image_restoration_tpu.train.distill import DistillConfig, distill_model

    if not args.teacher_dir and not args.teacher_npz:
        ap.error("one of --teacher-dir / --teacher-npz is required")
    dcfg = DistillConfig(
        teacher_dir=args.teacher_dir,
        teacher_npz=args.teacher_npz,
        n_eval=args.n_eval,
        teacher_stride=args.teacher_stride,
        qualities=tuple(args.qualities),
        gt_weight=args.gt_weight,
        progressive=args.progressive,
    )

    dataset = None
    if args.synthetic:
        from ddpm_image_restoration_tpu.data import SyntheticImageDataset

        dataset = SyntheticImageDataset(
            args.synthetic, cfg.model.image_size, kind=args.synthetic_kind
        )

    distill_model(cfg, dcfg, dataset=dataset, resume=not args.no_resume)


if __name__ == "__main__":
    main()
