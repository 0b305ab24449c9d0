"""The training driver: epochs, validation-by-restoration, checkpoints, viz.

Mirrors train_model_ddrm_* (webp_training.py:773-822 / avif.py:794-843):
  * per-epoch quality-curriculum training (in the data pipeline),
  * per-epoch validation that runs the FULL DDRM sampler at the preset's
    val qualities with init_t = clamp((100-q)/100*steps, ...) and reports
    PSNR/SSIM (webp_training.py:540-599),
  * best-val-PSNR checkpointing (plus true resume, which the reference lacks),
  * training curves every epoch, restoration grids every `viz_every` epochs.

TPU-native: the train step is jitted once over the device mesh (data-parallel
by default — see parallel/mesh.py), batches stream from the host degradation
pipeline with background prefetch, and validation restoration runs the same
jitted lax.scan sampler used in production.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_image_restoration_tpu.config import TrainConfig
from ddpm_image_restoration_tpu.codecs.pil_codecs import compress_batch
from ddpm_image_restoration_tpu.codecs.quality import init_timestep_for_quality
from ddpm_image_restoration_tpu.data.dataset import (
    ImageFolderDataset,
    SyntheticImageDataset,
    split_indices,
)
from ddpm_image_restoration_tpu.data.pipeline import DegradationLoader
from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler
from ddpm_image_restoration_tpu.evaluation.metrics import psnr, ssim_metric
from ddpm_image_restoration_tpu.models import build_model
from ddpm_image_restoration_tpu.parallel.mesh import (
    make_mesh,
    put_batch,
    put_state,
    shard_train_step,
)
from ddpm_image_restoration_tpu.train.checkpoint import CheckpointManager
from ddpm_image_restoration_tpu.train.steps import create_train_state, make_train_step
from ddpm_image_restoration_tpu.utils.logging import MetricLogger
from ddpm_image_restoration_tpu.utils.viz import save_restoration_grid, save_training_curves


def unified_samplers(model, consistency_mode: str) -> Dict[str, DDRMSampler]:
    """One DDRMSampler per real codec for a unified ('all') model: each pairs
    that codec's preset (sampler constants + consistency codec) with its
    conditioning id. Build ONCE and reuse — each sampler caches its compiled
    solver."""
    from ddpm_image_restoration_tpu.config import CODECS, codec_index, get_preset

    return {
        c: DDRMSampler(
            model, get_preset(c), consistency_mode, codec_id=codec_index(c)
        )
        for c in CODECS
    }


def validate_by_restoration(
    model,
    params,
    cfg: TrainConfig,
    val_images: np.ndarray,
    sampler: Optional[DDRMSampler] = None,
    key: Optional[jax.Array] = None,
    n_eval: Optional[int] = None,
) -> Dict[str, float]:
    """Full-sampler validation at the preset's val qualities
    (validate_ddrm_* webp_training.py:540-599). `n_eval` caps the model
    evaluations per restore (distilled-student validation: the stride is
    derived per quality, train/distill.py `student_stride`).

    Unified ('all') training validates across codecs instead of across
    qualities: one restore per real codec at that codec's middle val quality
    (same sampler-run count as single-codec validation), averaged. Pass
    `sampler` as the dict from `unified_samplers` to reuse compiles."""
    preset = cfg.preset
    key = key if key is not None else jax.random.PRNGKey(0)
    totals = {"psnr": 0.0, "ssim": 0.0}
    x0 = jnp.asarray(val_images)
    wrapped = {"params": params} if "params" not in params else params

    if preset.name == "all":
        samplers = (
            sampler if isinstance(sampler, dict)
            else unified_samplers(model, cfg.consistency_mode)
        )
        cases = []
        for c, s in samplers.items():
            cp = s.preset
            cases.append((s, cp, c, cp.val_qualities[len(cp.val_qualities) // 2]))
    else:
        one = sampler or DDRMSampler(model, preset, cfg.consistency_mode)
        cases = [(one, preset, preset.name, q) for q in preset.val_qualities]

    for smp, cp, codec_name, quality in cases:
        y = jnp.asarray(compress_batch(val_images, codec_name, quality))
        init_t = init_timestep_for_quality(quality, cfg.steps, cp)
        stride = 1
        if n_eval is not None:
            from ddpm_image_restoration_tpu.train.distill import student_stride

            stride = student_stride(init_t, n_eval)
        key, sub = jax.random.split(key)
        restored = smp.sample(wrapped, y, quality, init_t, key=sub, stride=stride)
        totals["psnr"] += float(psnr(restored, x0))
        totals["ssim"] += float(ssim_metric(restored, x0))
    n = len(cases)
    return {"val_psnr": totals["psnr"] / n, "val_ssim": totals["ssim"] / n}


def train_model(
    cfg: TrainConfig,
    dataset=None,
    epochs: Optional[int] = None,
    val_batch: int = 4,
    resume: bool = True,
    verbose: bool = True,
):
    """End-to-end training. Returns (state, logger.history)."""
    epochs = epochs or cfg.epochs
    preset = cfg.preset

    if dataset is None:
        if os.path.isdir(cfg.data_dir):
            dataset = ImageFolderDataset(
                cfg.data_dir, cfg.model.image_size, cache_decoded=cfg.cache_decoded
            )
        else:
            dataset = SyntheticImageDataset(256, cfg.model.image_size)

    train_idx, val_idx, test_idx = split_indices(
        len(dataset), cfg.split_fracs, cfg.split_seed
    )
    batch_size = cfg.effective_batch_size
    if batch_size > len(train_idx):
        # otherwise drop_remainder yields ZERO batches per epoch: the run
        # reports loss=nan and silently never trains (observed with
        # --synthetic 16 against the WebP preset's batch 18)
        print(f"warning: batch size {batch_size} > {len(train_idx)} training "
              f"images; clamping to {len(train_idx)}", flush=True)
        batch_size = len(train_idx)
    loader = DegradationLoader(
        dataset, train_idx, preset, batch_size, cfg.steps,
        seed=cfg.seed, num_workers=cfg.data_workers, augment=cfg.augment,
    )
    if len(val_idx) == 0:  # tiny datasets: fall back to training images
        val_idx = train_idx
    val_images = np.stack([dataset[int(i)] for i in val_idx[:val_batch]])

    model = build_model(cfg.codec, cfg.model)
    spe = max(1, loader.steps_per_epoch())
    state = create_train_state(model, cfg, jax.random.PRNGKey(cfg.seed), spe)

    # default (-1,) data mesh: use as many devices as divide the batch
    if tuple(cfg.mesh_shape) == (-1,) and tuple(cfg.mesh_axes) == ("data",):
        import math

        dp = math.gcd(cfg.effective_batch_size, jax.device_count())
        mesh = make_mesh((dp,), ("data",))
    else:
        mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    train_step = shard_train_step(make_train_step(model, cfg), mesh, state,
                                  fsdp=cfg.fsdp)
    state = put_state(state, mesh, fsdp=cfg.fsdp)

    ckpt = CheckpointManager(cfg.checkpoint_dir)
    start_epoch = 0
    if resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state, meta = restored
            if cfg.ema_decay > 0 and state.ema_params is None:
                # resuming a pre-EMA checkpoint with EMA newly enabled:
                # seed the average from the restored params (also keeps the
                # compiled step's pytree structure consistent)
                state = state.replace(
                    ema_params=jax.tree_util.tree_map(jnp.copy, state.params)
                )
            elif cfg.ema_decay == 0 and state.ema_params is not None:
                state = state.replace(ema_params=None)
            start_epoch = int(meta.get("epoch", 0)) + 1
            if verbose:
                print(f"resumed from epoch {start_epoch - 1}")

    logger = MetricLogger(cfg.checkpoint_dir)
    if cfg.codec == "all":
        sampler = unified_samplers(model, cfg.consistency_mode)
        viz_sampler = sampler["webp"]  # fixed codec for the epoch viz grids
    else:
        sampler = DDRMSampler(model, preset, cfg.consistency_mode)
        viz_sampler = sampler
    rng = jax.random.PRNGKey(cfg.seed + 1)
    # best_psnr tracks the best SAVED checkpoint (not the global best), so a
    # save skipped by ckpt_min_interval is retried as soon as the interval
    # elapses and val-PSNR still beats what is on disk.
    best_psnr = -float("inf")
    last_save_epoch = -(10 ** 9)

    for epoch in range(start_epoch, epochs):
        t_start = time.time()
        losses = []
        for batch in loader.epoch(epoch):
            rng, sub = jax.random.split(rng)
            if epoch == start_epoch and not losses and verbose:
                # First dispatch pays the train-step compile — minutes at
                # full width on a tunneled TPU. Stamp it so a queue watchdog
                # can tell "compiling" from "wedged" (round-2 postmortem:
                # the unified teacher produced zero output for 45+ min).
                print(f"[{time.strftime('%H:%M:%S')}] compiling train step "
                      f"(first dispatch)...", flush=True)
            state, metrics = train_step(state, put_batch(batch, mesh), sub)
            losses.append(metrics["loss"])
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

        # Validate (and thus pick the best checkpoint) with the EMA params
        # when enabled — the weights that eval/serving will load.
        eval_params = state.params if state.ema_params is None else state.ema_params
        if epoch == start_epoch and verbose:
            print(f"[{time.strftime('%H:%M:%S')}] train step ready; compiling "
                  f"validation sampler(s)...", flush=True)
        val = validate_by_restoration(model, eval_params, cfg, val_images, sampler)
        epoch_time = time.time() - t_start
        logger.log(epoch, loss=train_loss, epoch_time=epoch_time, **val)
        if verbose:
            print(logger.summary(epoch, prefix=f"{preset.name} "))

        # save on a new best val-PSNR (reference best-checkpointing,
        # webp_training.py:794-804), plus periodically for resume — but at
        # most every cfg.ckpt_min_interval epochs: early training improves
        # every epoch and full-state saves can dominate wall time (see
        # TrainConfig.ckpt_min_interval)
        due = epoch - last_save_epoch >= cfg.ckpt_min_interval
        if (due and (val["val_psnr"] > best_psnr or epoch % 10 == 0)) or (
            epoch == epochs - 1
        ):
            best_psnr = max(best_psnr, val["val_psnr"])
            last_save_epoch = epoch
            ckpt.save(epoch, state, {"epoch": epoch, **val})

        save_training_curves(
            os.path.join(cfg.checkpoint_dir, "curves", "training.png"), logger.history
        )
        if epoch % cfg.viz_every == 0:
            vp = viz_sampler.preset
            q = vp.val_qualities[0]
            y = compress_batch(val_images, vp.name, q)
            restored = viz_sampler.sample(
                {"params": eval_params},
                jnp.asarray(y),
                q,
                init_timestep_for_quality(q, cfg.steps, vp),
            )
            save_restoration_grid(
                os.path.join(cfg.checkpoint_dir, "viz", f"epoch_{epoch:04d}.png"),
                val_images, np.asarray(y), np.asarray(restored), quality=q,
            )

    ckpt.wait()
    return state, logger.history
