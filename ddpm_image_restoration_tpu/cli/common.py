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
    ap.add_argument("--codec", default="webp",
                    choices=["webp", "jpeg", "avif", "all", "auto"],
                    help="'all' (train): unified multi-codec model on mixed "
                         "degradations; 'auto' (restore/serve): detect each "
                         "input's codec from its bitstream and dispatch — "
                         "needs --model-codec all (or a matching single-codec "
                         "checkpoint)")
    ap.add_argument("--model-codec", default="",
                    help="codec the CHECKPOINT was trained for when it "
                         "differs from --codec: 'all' pairs a unified "
                         "checkpoint with any target codec (default: same "
                         "as --codec)")
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


def resolve_codecs(args, allow_auto: bool = False) -> tuple:
    """(target_codec, model_codec) for the eval/restore/serve CLIs.

    The target codec is what the inputs were compressed with (sampler preset
    + consistency codec); the model codec is what the checkpoint was trained
    as ('all' = unified multi-codec). 'auto' as target means per-file
    bitstream detection (restore/serve only)."""
    codec = args.codec.lower()
    if codec == "all":
        raise SystemExit(
            "--codec all is a TRAINING preset; restoration/evaluation "
            "target one codec at a time — use --model-codec all with "
            "--codec jpeg|webp|avif" + ("|auto" if allow_auto else "")
        )
    if codec == "auto" and not allow_auto:
        raise SystemExit("--codec auto applies to restore/serve only")
    model_codec = (getattr(args, "model_codec", "") or codec).lower()
    if model_codec == "auto":
        raise SystemExit("--codec auto needs --model-codec: the preset the "
                         "checkpoint was trained as (jpeg|webp|avif|all)")
    return codec, model_codec


def sampler_codec_id(model, codec: str):
    """Conditioning id for a (possibly unified) model restoring `codec`."""
    if getattr(model.cfg, "codec_conditioning", False):
        from ddpm_image_restoration_tpu.config import codec_index

        return codec_index(codec)
    return None


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
