"""Shared CLI plumbing: config construction from flags.

The reference's CLIs are zero-flag `if __name__ == "__main__"` blocks with
hard-coded paths (webp_training.py:828-835, webp_inference.py:954-987,
avif.py:880-887, avif_inference.py:812-869). Here every hard-coded constant
is a documented flag with the reference value as default.
"""

from __future__ import annotations

import argparse
import os

from ddpm_image_restoration_tpu.config import ModelConfig, TrainConfig, EvalConfig


def configure_jax_cache(platform: str | None = None):
    """Per-process JAX setup for every CLI entry point, BEFORE backend init.

    - Persistent XLA compilation cache: compiles on tunneled TPU platforms
      take minutes and are re-paid on every process start without this;
      cached reruns warm up in seconds. Off by setting DDPM_IR_JAX_CACHE=0.
    - Platform pin (`--platform` flag or DDPM_IR_PLATFORM env): some PJRT
      plugins re-select themselves regardless of JAX_PLATFORMS, so forcing
      e.g. CPU (accelerator down, or a host-side quick check) must go
      through jax.config before any backend initialises."""
    import jax

    platform = platform or os.environ.get("DDPM_IR_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    cache = os.environ.get("DDPM_IR_JAX_CACHE", "/tmp/ddpm_ir_jax_cache")
    if cache and cache != "0":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def add_model_flags(ap: argparse.ArgumentParser):
    ap.add_argument("--platform", default=None,
                    help="pin the JAX platform (e.g. cpu, tpu) before "
                         "backend init; also via DDPM_IR_PLATFORM env")
    ap.add_argument("--codec", default="webp", choices=["webp", "jpeg", "avif"])
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--width-scale", type=int, default=1,
                    help="divide all channel widths by this (quick experiments)")
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--attn", default="xla", choices=["xla", "flash"])
    ap.add_argument("--attn-max-res", type=int, default=1024,
                    help="apply self-attention only at spatial sizes <= this")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize each UNet block on backward "
                         "(jax.checkpoint): ~1 extra forward of FLOPs for "
                         "O(depth) less activation HBM — for 256^2+ or "
                         "large-batch training that otherwise OOMs")


def model_config_from(args) -> ModelConfig:
    cfg = ModelConfig(
        image_size=args.image_size,
        compute_dtype=args.compute_dtype,
        attention_impl=args.attn,
        attn_max_resolution=args.attn_max_res,
        remat=getattr(args, "remat", False),
    )
    if args.width_scale > 1:
        cfg = cfg.scaled(args.width_scale)
    return cfg


def train_config_from(args) -> TrainConfig:
    return TrainConfig(
        codec=args.codec,
        model=model_config_from(args),
        epochs=args.epochs,
        steps=args.steps,
        batch_size=args.batch_size,
        seed=args.seed,
        data_dir=args.data_dir,
        checkpoint_dir=args.checkpoint_dir,
        consistency_mode=args.consistency,
        ema_decay=getattr(args, "ema_decay", 0.0),
        fsdp=getattr(args, "fsdp", False),
        data_workers=getattr(args, "data_workers", 4),
        cache_decoded=not getattr(args, "no_cache_decoded", False),
        lr_override=getattr(args, "lr", 0.0),
        ckpt_min_interval=getattr(args, "ckpt_interval", 1),
        augment=getattr(args, "augment", False),
    )


def eval_config_from(args) -> EvalConfig:
    return EvalConfig(
        codec=args.codec,
        model=model_config_from(args),
        steps=args.steps,
        output_dir=args.output_dir,
        max_images=args.max_images,
        consistency_mode=args.consistency,
        compute_fid=not args.no_fid,
    )
