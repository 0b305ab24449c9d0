"""Training entry point: `ddpm-ir-train` (reference: python webp_training.py
/ avif.py / the svd notebooks' train cells, with zero flags — webp_training.py:828)."""

from __future__ import annotations

import argparse

from ddpm_image_restoration_tpu.cli.common import configure_jax_cache, add_model_flags, train_config_from


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train a codec-restoration diffusion model")
    add_model_flags(ap)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--steps", type=int, default=100, help="diffusion timesteps")
    ap.add_argument("--batch-size", type=int, default=0, help="0 = codec preset default")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-dir", default="./ILSVRC2012_img_val")
    ap.add_argument("--data-workers", type=int, default=4,
                    help="batch-producer threads for decode+degrade (the "
                         "batch stream is identical for any count)")
    ap.add_argument("--no-cache-decoded", action="store_true",
                    help="disable the decoded-image RAM cache (uint8 at "
                         "image_size; 64^2 x 50k images ~ 0.6 GB)")
    ap.add_argument("--checkpoint-dir", default="./checkpoints")
    ap.add_argument("--consistency", default="surrogate", choices=["surrogate", "callback", "host_loop"])
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="train on N synthetic images instead of --data-dir")
    ap.add_argument("--synthetic-kind", default="waves",
                    choices=["waves", "dead_leaves", "natural", "mixed"],
                    help="synthetic generator (dead_leaves = natural-image-"
                         "statistics proxy: occluding power-law disks)")
    ap.add_argument("--real", type=int, default=0, metavar="N",
                    help="append N real photographic patches from library-"
                         "bundled images to the training set (-1 = all; the "
                         "'train' split — disjoint from evaluate --real)")
    ap.add_argument("--fsdp", action="store_true",
                    help="shard params/optimizer/EMA over the data axis "
                         "(FSDP/ZeRO-3 style; XLA all-gathers + "
                         "reduce-scatters)")
    ap.add_argument("--lr", type=float, default=0.0,
                    help="learning rate (0 = the codec preset's reference "
                         "value)")
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="EMA of params for validation/serving (e.g. 0.999); "
                         "0 = off (reference behaviour)")
    ap.add_argument("--ckpt-interval", type=int, default=1,
                    help="minimum epochs between checkpoint saves (full-state "
                         "saves can dominate wall time on slow disks/tunneled "
                         "devices; the last epoch always saves)")
    ap.add_argument("--augment", action="store_true",
                    help="dihedral-8 augmentation (flips/rotations) of the "
                         "clean image before codec degradation — helps small "
                         "datasets; the reference trains unaugmented")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--auto-restart", type=int, default=0, metavar="N",
                    help="on crash, resume from the last checkpoint up to N times "
                    "(elastic-training guard; the reference always restarts from scratch)")
    args = ap.parse_args(argv)
    if args.codec == "auto":
        raise SystemExit("--codec auto is a restore/serve mode; train a real "
                         "preset (jpeg|webp|avif) or the unified 'all'")
    configure_jax_cache(getattr(args, "platform", None))

    cfg = train_config_from(args)
    dataset = None
    if args.synthetic:
        from ddpm_image_restoration_tpu.data import SyntheticImageDataset

        dataset = SyntheticImageDataset(
            args.synthetic, cfg.model.image_size, kind=args.synthetic_kind
        )
    if args.real:
        from ddpm_image_restoration_tpu.data import (
            ConcatDataset,
            RealPatchDataset,
        )

        real = RealPatchDataset(0 if args.real < 0 else args.real,
                                cfg.model.image_size, split="train",
                                augment=True)
        dataset = real if dataset is None else ConcatDataset(dataset, real)

    from ddpm_image_restoration_tpu.train.loop import train_model

    attempts = 0
    while True:
        try:
            train_model(cfg, dataset=dataset, resume=not args.no_resume or attempts > 0)
            break
        except KeyboardInterrupt:
            raise
        except Exception as e:
            attempts += 1
            if attempts > args.auto_restart:
                raise
            print(f"training crashed ({type(e).__name__}: {e}); "
                  f"resuming from last checkpoint (attempt {attempts}/{args.auto_restart})")


if __name__ == "__main__":
    main()
