"""Solver distillation: compress the multi-step DDRM restore into few evals.

Not in the reference — its fastest path is the full step-for-step solver
(webp_training.py:437-471, one model call per reverse step). This module is
the framework's production-serving acceleration beyond the stride/reuse
levers: a student initialised from a trained teacher checkpoint learns, per
quality bucket, to reproduce the teacher's full-solver restoration in
``n_eval`` model evaluations (n_eval=1 is a single UNet pass followed by one
codec-consistency projection).

The student keeps the exact DDRMSampler execution shape — it is trained
*through* the sampler with stride = ceil(init_t / n_eval) — so every
downstream surface works unchanged: a distilled checkpoint is an ordinary
checkpoint whose weights are good at very high stride, loaded by the
restore/serve/evaluate CLIs with ``--max-evals n`` (which just picks that
stride).

TPU-native design:
  * teacher trajectory + student k-step solve + loss + optimizer update are
    ONE jitted program per quality bucket (init_t is the static scan
    length); no host round-trips inside the step.
  * the teacher runs under stop_gradient; gradients flow through at most
    ``n_eval`` UNet evaluations and the differentiable codec surrogate
    (straight-through rounding), with each student step rematerialized
    (jax.checkpoint in DDRMSampler._build) so the backward keeps O(1)
    activations instead of O(n_eval) — without it full-width distillation
    OOMs HBM (round 2: 23.9G vs 15.75G).
  * distillation qualities round-robin per step on the host; each bucket's
    program is compiled once and cached.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ddpm_image_restoration_tpu.codecs.pil_codecs import compress_batch
from ddpm_image_restoration_tpu.codecs.quality import init_timestep_for_quality
from ddpm_image_restoration_tpu.data.pipeline import prefetched_map
from ddpm_image_restoration_tpu.config import TrainConfig
from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler
from ddpm_image_restoration_tpu.diffusion.losses import loss_for_preset
from ddpm_image_restoration_tpu.train.steps import TrainState, make_optimizer


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Distillation hyper-parameters on top of a TrainConfig."""

    teacher_dir: str = "./checkpoints"         # trained teacher checkpoints
    # release-npz teacher (train/checkpoint.py:load_release_params format);
    # overrides teacher_dir when set — the durable alternative on machines
    # whose artifacts/ (Orbax trees) is wiped between boots
    teacher_npz: str = ""
    n_eval: int = 1                            # student model evaluations
    teacher_stride: int = 1                    # 1 = full-solver teacher
    # quality buckets to distill. () = the preset's full EVAL grid, not just
    # val_qualities: each quality maps to its own init_t (static scan length)
    # and the student only learns the budgets it trains — round-1 students
    # distilled on (10,30,50) lost up to 2.3 dB at q70/q90, whose init_t
    # (30/20) they had never seen.
    qualities: Tuple[int, ...] = ()
    # weight of the ground-truth term: loss = loss(student, teacher)
    # + gt_weight * loss(student, x0). Anchors the student to the clean
    # image so it cannot inherit teacher artifacts wholesale.
    gt_weight: float = 0.3
    # progressive distillation (Salimans & Ho, arXiv:2202.00512 adapted to
    # the DDRM solver): instead of one big jump, halve the eval budget per
    # stage (E -> E/2 -> ... -> n_eval), each stage distilling from the
    # previous stage's student. Stage checkpoints land in
    # <checkpoint_dir>/stage<k>, the final stage in <checkpoint_dir>.
    progressive: bool = False
    # internal (set by the progressive driver): teacher's own eval budget —
    # overrides teacher_stride with the per-quality derived stride
    teacher_n_eval: int = 0


def student_stride(init_t: int, n_eval: int) -> int:
    """The solver stride that makes `sample(steps=init_t)` run n_eval model
    evaluations (see diffusion/ddrm.py _solver_indices: descending from
    init_t-1 by `stride`, always ending at 0)."""
    if n_eval < 1:
        raise ValueError(f"n_eval must be >= 1, got {n_eval}")
    if n_eval >= init_t:
        return 1
    # len(range(init_t-1, -1, -s)) == ceil(init_t / s); find the smallest
    # s whose count (plus the appended 0 when missed) is <= n_eval
    for s in range(math.ceil(init_t / n_eval), init_t + 1):
        idxs = np.arange(init_t - 1, -1, -s)
        n = len(idxs) + (idxs[-1] != 0)
        if n <= n_eval:
            return int(s)
    return int(init_t)


def make_distill_step(model, cfg: TrainConfig, dcfg: DistillConfig, quality: int):
    """One jitted distillation step for a fixed quality bucket.

    Returns step(state, teacher_params, batch, rng) -> (state, metrics) where
    batch = {"x0": clean, "xt": codec(x0, quality)}.
    """
    preset = cfg.preset
    init_t = init_timestep_for_quality(quality, cfg.steps, preset)
    s_stride = student_stride(init_t, dcfg.n_eval)
    t_stride = dcfg.teacher_stride
    if dcfg.teacher_n_eval:  # progressive stages: teacher at its own budget
        t_stride = student_stride(init_t, dcfg.teacher_n_eval)
    sampler = DDRMSampler(model, preset, consistency_mode="surrogate")
    teacher_run = sampler.build_run(init_t, t_stride)
    # The student is differentiated THROUGH its unrolled solver; remat each
    # step or the backward holds every step's UNet activations (round-2
    # full-width OOM: 23.9G vs 15.75G HBM). The teacher runs under
    # stop_gradient, so XLA keeps no backward buffers for it.
    student_run = sampler.build_run(init_t, s_stride, remat=True)
    loss_fn = loss_for_preset(preset.loss_kind)
    # Solver noise follows the PRODUCTION policy, not the reference preset:
    # the student is the production fast path, and the round-3 experiment
    # (results/r3/ex_me14_eta0, diffusion/policy.py finding 1) showed the
    # deterministic solver dominates the reference's eta=0.85 on every
    # metric — so the teacher's targets are both better and zero-variance.
    from ddpm_image_restoration_tpu.diffusion.policy import (
        production_solver_config,
    )

    policy_eta = production_solver_config(quality).get("eta")
    eta = jnp.float32(preset.eta if policy_eta is None else policy_eta)
    eta_b = jnp.float32(preset.eta_b)
    gt_w = float(dcfg.gt_weight)

    @jax.jit
    def step(state: TrainState, teacher_params, batch, rng: jax.Array):
        y = batch["xt"].astype(jnp.float32)
        x0 = batch["x0"].astype(jnp.float32)
        k_teacher, k_student = jax.random.split(rng)
        target = jax.lax.stop_gradient(
            teacher_run({"params": teacher_params}, y, quality, k_teacher, eta, eta_b)
        )

        def compute_loss(params):
            out = student_run({"params": params}, y, quality, k_student, eta, eta_b)
            loss = loss_fn(out, target)
            if gt_w:
                loss = loss + gt_w * loss_fn(out, x0)
            return loss

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        state = state.apply_gradients(grads=grads)
        if cfg.ema_decay > 0:
            # warmed-up decay — same rationale as train/steps.py (here the
            # accumulator starts at the TEACHER params, a good init, but the
            # ramp costs nothing: current params also start there)
            t = state.step.astype(jnp.float32)
            d = jnp.minimum(cfg.ema_decay, (1.0 + t) / (10.0 + t))
            state = state.replace(
                ema_params=jax.tree_util.tree_map(
                    lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                    state.ema_params,
                    state.params,
                )
            )
        return state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step, init_t, s_stride, t_stride


def distill_model(
    cfg: TrainConfig,
    dcfg: DistillConfig,
    dataset=None,
    epochs: Optional[int] = None,
    val_batch: int = 4,
    resume: bool = True,
    verbose: bool = True,
):
    """End-to-end distillation. Returns (state, history).

    Mirrors train_model's loop shape (train/loop.py) but: the student is
    initialised FROM the teacher (params and, when enabled, EMA), batches
    carry one quality bucket each (static init_t per compiled step), and
    validation restores with the student's n_eval budget. With
    dcfg.progressive the eval budget is halved stage by stage (each stage's
    student teaching the next) down to n_eval.
    """
    if dcfg.progressive:
        return _distill_progressive(
            cfg, dcfg, dataset=dataset, epochs=epochs, val_batch=val_batch,
            resume=resume, verbose=verbose,
        )
    from ddpm_image_restoration_tpu.data import (
        ImageFolderDataset,
        SyntheticImageDataset,
        split_indices,
    )
    from ddpm_image_restoration_tpu.models import build_model
    from ddpm_image_restoration_tpu.train.checkpoint import CheckpointManager
    from ddpm_image_restoration_tpu.train.loop import validate_by_restoration
    from ddpm_image_restoration_tpu.utils.logging import MetricLogger

    epochs = epochs or cfg.epochs
    preset = cfg.preset
    if preset.name == "all":
        raise ValueError(
            "solver distillation is per-codec (the student is trained through "
            "ONE codec's consistency projection); distill a unified teacher "
            "once per target codec with --codec jpeg|webp|avif"
        )
    qualities = tuple(dcfg.qualities) or tuple(preset.eval_qualities)

    if dataset is None:
        if os.path.isdir(cfg.data_dir):
            dataset = ImageFolderDataset(
                cfg.data_dir, cfg.model.image_size, cache_decoded=cfg.cache_decoded
            )
        else:
            dataset = SyntheticImageDataset(256, cfg.model.image_size)
    train_idx, val_idx, _ = split_indices(len(dataset), cfg.split_fracs, cfg.split_seed)
    if len(val_idx) == 0:
        val_idx = train_idx
    val_images = np.stack([dataset[int(i)] for i in val_idx[:val_batch]])

    model = build_model(cfg.codec, cfg.model)

    # ---- teacher: best checkpoint (EMA weights when present), or a
    # release .npz — the artifact that survives machine resets (Orbax
    # checkpoint trees live in the wiped-on-boot artifacts/ directory) -----
    from ddpm_image_restoration_tpu.train.steps import create_train_state

    if dcfg.teacher_npz:
        from ddpm_image_restoration_tpu.train.checkpoint import (
            load_release_params,
        )

        teacher_params = load_release_params(dcfg.teacher_npz)
        if verbose:
            print(f"teacher: release params {dcfg.teacher_npz}")
    else:
        teacher_mgr = CheckpointManager(dcfg.teacher_dir)
        # template must mirror the training-time state structure (optimizer
        # moments included) for Orbax's structure check
        t_state = create_train_state(model, cfg, jax.random.PRNGKey(0))
        restored = (teacher_mgr.restore_best(t_state)
                    or teacher_mgr.restore_latest(t_state))
        if restored is None:
            raise FileNotFoundError(
                f"no teacher checkpoint under {dcfg.teacher_dir!r}")
        t_state, t_meta = restored
        teacher_params = t_state.ema_params or t_state.params
        if verbose:
            which = "ema" if t_state.ema_params is not None else "raw"
            print(f"teacher: {dcfg.teacher_dir} ({which} params) {t_meta}")

    # ---- student: init from teacher --------------------------------------
    batch_size = cfg.effective_batch_size
    n_batches = max(1, len(train_idx) // batch_size)
    tx = make_optimizer(cfg, steps_per_epoch=n_batches)
    state = TrainState.create(
        apply_fn=model.apply,
        params=jax.tree_util.tree_map(jnp.copy, teacher_params),
        tx=tx,
        ema_params=(
            jax.tree_util.tree_map(jnp.copy, teacher_params)
            if cfg.ema_decay > 0 else None
        ),
    )

    steps = {}
    for q in qualities:
        steps[q], init_t, s_stride, t_stride = make_distill_step(model, cfg, dcfg, q)
        if verbose:
            print(f"quality {q}: teacher {init_t} steps/stride "
                  f"{t_stride} -> student stride {s_stride} "
                  f"({dcfg.n_eval} evals)")

    ckpt = CheckpointManager(cfg.checkpoint_dir)
    start_epoch = 0
    if resume:
        r = ckpt.restore_latest(state)
        if r is not None:
            state, meta = r
            start_epoch = int(meta.get("epoch", 0)) + 1
            if verbose:
                print(f"resumed distillation from epoch {start_epoch - 1}")

    logger = MetricLogger(cfg.checkpoint_dir)
    sampler = DDRMSampler(model, preset, cfg.consistency_mode)
    rng = jax.random.PRNGKey(cfg.seed + 2)
    best_psnr = -float("inf")  # best SAVED (see train/loop.py rate-limiting)
    last_save_epoch = -(10 ** 9)

    for epoch in range(start_epoch, epochs):
        t_start = time.time()
        order = np.random.default_rng((cfg.seed, epoch, 17)).permutation(len(train_idx))
        losses = []
        def make_batch(b: int):
            idxs = train_idx[order[b * batch_size : (b + 1) * batch_size]]
            # continuous round-robin across epochs: with few batches per
            # epoch, `b % len` alone would train only the first buckets
            q = qualities[(epoch * n_batches + b) % len(qualities)]
            x0 = np.stack([dataset[int(i)] for i in idxs])
            if cfg.augment:  # dihedral-8 before degradation (data/pipeline.py)
                arng = np.random.default_rng((cfg.seed, epoch, b, 23))
                ks = arng.integers(0, 4, size=len(idxs))
                fl = arng.integers(0, 2, size=len(idxs))
                x0 = np.stack([
                    np.ascontiguousarray(
                        np.rot90(img[:, ::-1] if f else img, int(k), axes=(0, 1))
                    )
                    for img, k, f in zip(x0, ks, fl)
                ])
            return q, x0, compress_batch(x0, preset.name, q)

        for q, x0, y in prefetched_map(make_batch, n_batches, cfg.data_workers):
            rng, sub = jax.random.split(rng)
            batch = {"x0": jnp.asarray(x0), "xt": jnp.asarray(y)}
            state, metrics = steps[q](state, teacher_params, batch, sub)
            losses.append(metrics["loss"])
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

        eval_params = state.params if state.ema_params is None else state.ema_params
        val = validate_by_restoration(
            model, eval_params, cfg, val_images, sampler, n_eval=dcfg.n_eval
        )
        epoch_time = time.time() - t_start
        logger.log(epoch, loss=train_loss, epoch_time=epoch_time, **val)
        if verbose:
            print(logger.summary(epoch, prefix=f"{preset.name}-distill "))

        due = epoch - last_save_epoch >= cfg.ckpt_min_interval
        if (due and (val["val_psnr"] > best_psnr or epoch % 10 == 0)) or (
            epoch == epochs - 1
        ):
            best_psnr = max(best_psnr, val["val_psnr"])
            last_save_epoch = epoch
            ckpt.save(epoch, state, {"epoch": epoch, **val})

    ckpt.wait()
    return state, logger.history


def _distill_progressive(
    cfg: TrainConfig,
    dcfg: DistillConfig,
    dataset=None,
    epochs: Optional[int] = None,
    val_batch: int = 4,
    resume: bool = True,
    verbose: bool = True,
):
    """Stage driver: halve the eval budget from the teacher's down to
    dcfg.n_eval, each stage distilling from the previous stage's checkpoint.
    Stage k saves under <checkpoint_dir>/stage<k>; the final stage saves to
    <checkpoint_dir> itself so downstream tooling sees one directory."""
    from ddpm_image_restoration_tpu.diffusion.ddrm import _solver_indices

    preset = cfg.preset
    qualities = tuple(dcfg.qualities) or tuple(preset.eval_qualities)
    e0 = max(
        len(_solver_indices(
            init_timestep_for_quality(q, cfg.steps, preset),
            max(1, dcfg.teacher_stride),
        ))
        for q in qualities
    )
    budgets = []
    b = e0 // 2
    while b > dcfg.n_eval:
        budgets.append(b)
        b //= 2
    budgets.append(dcfg.n_eval)

    teacher_dir, teacher_n_eval = dcfg.teacher_dir, 0
    state = history = None
    for k, budget in enumerate(budgets):
        last = k == len(budgets) - 1
        stage_dir = (
            cfg.checkpoint_dir if last
            else os.path.join(cfg.checkpoint_dir, f"stage{k}")
        )
        if verbose:
            print(f"[progressive {k + 1}/{len(budgets)}] eval budget {budget} "
                  f"(teacher: {teacher_dir})")
        cfg_k = dataclasses.replace(cfg, checkpoint_dir=stage_dir)
        dcfg_k = dataclasses.replace(
            dcfg, teacher_dir=teacher_dir, n_eval=budget,
            # a release-npz teacher only seeds stage 0; later stages teach
            # from the previous stage's own checkpoints
            teacher_npz=dcfg.teacher_npz if k == 0 else "",
            teacher_n_eval=teacher_n_eval, progressive=False,
        )
        state, history = distill_model(
            cfg_k, dcfg_k, dataset=dataset, epochs=epochs,
            val_batch=val_batch, resume=resume, verbose=verbose,
        )
        teacher_dir, teacher_n_eval = stage_dir, budget
    return state, history
