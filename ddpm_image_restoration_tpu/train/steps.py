"""Jitted training / validation steps.

Reference training semantics (train_epoch_ddrm_* webp_training.py:476-537):
  * target residual = x0 - xt; the loss is computed on the *reconstruction*
    `xt + pred` against `x0` (webp_training.py:518) — reproduced exactly.
  * model conditioning: both t and compression_level are t/steps
    (webp_training.py:514-515 — the level is NOT the actual quality; this
    reference quirk is reproduced; see SURVEY.md §7 "faithful quirk decisions").
  * AdamW(lr, betas=(0.9,0.99), wd=1e-5) + grad-clip 1.0 + cosine warm
    restarts (webp_training.py:775-776).

TPU-native: one jitted step with donated state, bf16 model compute / fp32
optimizer statistics, batch sharded over the mesh's 'data' axis and params
replicated (or model-sharded — see parallel/mesh.py); gradients reduce over
ICI via the mesh's implicit psum inserted by XLA.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ddpm_image_restoration_tpu.config import TrainConfig
from ddpm_image_restoration_tpu.diffusion.losses import loss_for_preset
from ddpm_image_restoration_tpu.train.schedules import cosine_warm_restarts


class TrainState(train_state.TrainState):
    # Exponential moving average of params (None = disabled). A standard
    # diffusion-training stabiliser the reference lacks; off by default so
    # default behaviour (and old checkpoints) match the reference exactly.
    ema_params: Any = None


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    schedule = cosine_warm_restarts(
        base_lr=cfg.lr_override or cfg.preset.lr,
        t0=cfg.cosine_t0 * steps_per_epoch,
        t_mult=cfg.cosine_t_mult,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            weight_decay=cfg.weight_decay,
        ),
    )


def create_train_state(
    model, cfg: TrainConfig, rng: jax.Array, steps_per_epoch: int = 1
) -> TrainState:
    sz = cfg.model.image_size
    dummy = jnp.zeros((1, sz, sz, cfg.model.in_channels), jnp.float32)
    cond = {"codec_id": 0} if model.cfg.codec_conditioning else {}
    params = model.init(rng, dummy, jnp.zeros(1), **cond)["params"]
    tx = make_optimizer(cfg, steps_per_epoch)
    ema = jax.tree_util.tree_map(jnp.copy, params) if cfg.ema_decay > 0 else None
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, ema_params=ema
    )


def make_train_step(model, cfg: TrainConfig) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics)."""
    loss_fn = loss_for_preset(cfg.preset.loss_kind)
    steps = cfg.steps

    def train_step(state: TrainState, batch, rng: jax.Array):
        t_norm = batch["t"].astype(jnp.float32) / steps
        # unified multi-codec batches carry per-sample conditioning ids
        cond = {"codec_id": batch["codec_id"]} if "codec_id" in batch else {}

        def compute_loss(params):
            pred = model.apply(
                {"params": params},
                batch["xt"],
                t_norm,
                t_norm,
                deterministic=False,
                rngs={"dropout": rng},
                **cond,
            )
            return loss_fn(batch["xt"] + pred, batch["x0"])

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        state = state.apply_gradients(grads=grads)
        if cfg.ema_decay > 0:
            # Warmed-up decay min(d, (1+t)/(10+t)): the accumulator starts at
            # the RANDOM init, and a flat d=0.999 keeps 0.999^t of it — still
            # 32% random weights after 1150 steps, which is what made EMA
            # validation/serving DEGRADE images in results/onchip_queue_0818b
            # (val-PSNR pinned at 19.87 while the raw params learned fine).
            # The ramp makes early EMA a running average (no init bias) and
            # converges to d once t >> 10/(1-d).
            t = state.step.astype(jnp.float32)
            d = jnp.minimum(cfg.ema_decay, (1.0 + t) / (10.0 + t))
            state = state.replace(
                ema_params=jax.tree_util.tree_map(
                    lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                    state.ema_params,
                    state.params,
                )
            )
        gnorm = optax.global_norm(grads)
        return state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def make_eval_loss_step(model, cfg: TrainConfig) -> Callable:
    """Deterministic loss on a degraded batch (no sampler) — cheap val metric."""
    loss_fn = loss_for_preset(cfg.preset.loss_kind)
    steps = cfg.steps

    @jax.jit
    def eval_step(params, batch):
        t_norm = batch["t"].astype(jnp.float32) / steps
        cond = {"codec_id": batch["codec_id"]} if "codec_id" in batch else {}
        pred = model.apply({"params": params}, batch["xt"], t_norm, t_norm, **cond)
        return loss_fn(batch["xt"] + pred, batch["x0"])

    return eval_step
