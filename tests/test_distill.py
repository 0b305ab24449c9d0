"""Solver-distillation tests: stride math, the jitted distill step, and the
end-to-end distill loop (teacher checkpoint -> few-eval student checkpoint)."""

import dataclasses

import jax
import numpy as np
import pytest

from ddpm_image_restoration_tpu.config import TrainConfig
from ddpm_image_restoration_tpu.data import SyntheticImageDataset
from ddpm_image_restoration_tpu.diffusion.ddrm import _solver_indices
from ddpm_image_restoration_tpu.train.distill import (
    DistillConfig,
    distill_model,
    make_distill_step,
    student_stride,
)

from tests._tiny import MINI as TINY_MODEL  # noqa: E402


def tiny_cfg(tmpdir=".", **kw):
    return TrainConfig(
        codec="webp", model=TINY_MODEL, batch_size=4,
        checkpoint_dir=str(tmpdir), **kw,
    )


def test_student_stride_counts():
    # the derived stride must make the solver run <= n_eval model evals,
    # and must not overshoot (more steps than asked)
    for init_t in (3, 20, 35, 70, 80):
        for n_eval in (1, 2, 3, 4, 8):
            s = student_stride(init_t, n_eval)
            n = len(_solver_indices(init_t, s))
            assert 1 <= n <= n_eval, (init_t, n_eval, s, n)
    assert student_stride(70, 1) == 70      # one eval at the degradation's t
    assert len(_solver_indices(70, 70)) == 1
    assert student_stride(70, 70) == 1      # full budget: full solver
    assert student_stride(70, 100) == 1


@pytest.mark.slow
def test_distill_step_runs_and_moves_params(tmp_path):
    cfg = tiny_cfg(tmp_path)
    from ddpm_image_restoration_tpu.models import build_model
    from ddpm_image_restoration_tpu.train.steps import create_train_state

    model = build_model(cfg.codec, cfg.model)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    teacher_params = jax.tree_util.tree_map(np.copy, state.params)

    dcfg = DistillConfig(n_eval=1, teacher_stride=10)  # fast teacher for test
    step, init_t, s_stride, _ = make_distill_step(model, cfg, dcfg, quality=30)
    assert init_t == 70 and s_stride == 70  # webp clamp (20, 80)

    rng = np.random.default_rng(0)
    x0 = np.clip(rng.normal(0, 0.4, (2, 16, 16, 3)), -1, 1).astype(np.float32)
    batch = {"x0": x0, "xt": np.clip(x0 + 0.05, -1, 1)}
    state2, metrics = step(state, teacher_params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params moved
    diff = jax.tree_util.tree_reduce(
        lambda a, l: a + float(np.abs(np.asarray(l)).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state2.params, state.params),
        0.0,
    )
    assert diff > 0


@pytest.mark.slow
def test_distill_end_to_end(tmp_path):
    """Teacher 1-epoch train -> distill 2 epochs -> student checkpoint loads
    and restores with 1 eval."""
    from ddpm_image_restoration_tpu.train.loop import train_model
    from ddpm_image_restoration_tpu.train.checkpoint import CheckpointManager
    from ddpm_image_restoration_tpu.train.steps import create_train_state
    from ddpm_image_restoration_tpu.models import build_model

    ds = SyntheticImageDataset(12, 16)
    teacher_dir = tmp_path / "teacher"
    cfg_t = tiny_cfg(teacher_dir, epochs=1)
    train_model(cfg_t, dataset=ds, epochs=1, val_batch=2, verbose=False)

    student_dir = tmp_path / "student"
    cfg_s = tiny_cfg(student_dir, epochs=2)
    dcfg = DistillConfig(
        teacher_dir=str(teacher_dir), n_eval=1, teacher_stride=20,
        qualities=(30,),
    )
    state, history = distill_model(
        cfg_s, dcfg, dataset=ds, epochs=2, val_batch=2, verbose=False
    )
    assert len(history["loss"]) == 2
    assert np.isfinite(history["loss"][-1])
    assert np.isfinite(history["val_psnr"][-1])

    # the student checkpoint round-trips through the standard manager; the
    # LATEST checkpoint must equal the in-memory end-of-run state (best may
    # legitimately be an earlier epoch when val dips late)
    model = build_model(cfg_s.codec, cfg_s.model)
    target = create_train_state(model, cfg_s, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(student_dir))
    restored = mgr.restore_latest(target)
    assert restored is not None
    st, meta = restored
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(st.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )
    assert mgr.restore_best(target) is not None

    # distill resumes from its own checkpoint
    state2, history2 = distill_model(
        cfg_s, dcfg, dataset=ds, epochs=2, val_batch=2, verbose=False
    )
    assert len(history2.get("loss", [])) == 0  # resumed past the last epoch


def test_progressive_budget_chain(tmp_path):
    """The progressive driver halves budgets down to n_eval and chains
    stage checkpoints (verified by the stage directories it leaves)."""
    import os
    from unittest import mock

    from ddpm_image_restoration_tpu.train import distill as D

    cfg = tiny_cfg(tmp_path / "out")
    dcfg = DistillConfig(teacher_dir="T", n_eval=1, teacher_stride=10,
                         qualities=(30,), progressive=True)
    calls = []

    def fake_distill(cfg_k, dcfg_k, **kw):
        calls.append((dcfg_k.n_eval, dcfg_k.teacher_dir,
                      dcfg_k.teacher_n_eval, cfg_k.checkpoint_dir))
        return "state", {"loss": [0.0]}

    with mock.patch.object(D, "distill_model", side_effect=fake_distill):
        D._distill_progressive(cfg, dcfg, dataset=None, epochs=1)

    # teacher at stride 10 over init_t=70 -> 8 evals (incl. final i=0);
    # halving chain 4 -> 2 -> 1
    budgets = [c[0] for c in calls]
    assert budgets == [4, 2, 1]
    assert calls[0][1] == "T" and calls[0][2] == 0      # stage 0: real teacher
    assert calls[1][1].endswith("stage0") and calls[1][2] == 4
    assert calls[2][1].endswith("stage1") and calls[2][2] == 2
    assert calls[-1][3] == str(tmp_path / "out")        # final stage in root


def test_distill_missing_teacher_raises(tmp_path):
    cfg = tiny_cfg(tmp_path / "student")
    dcfg = DistillConfig(teacher_dir=str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        distill_model(cfg, dcfg, dataset=SyntheticImageDataset(8, 16),
                      epochs=1, verbose=False)


def test_validate_with_n_eval(tmp_path):
    from ddpm_image_restoration_tpu.models import build_model
    from ddpm_image_restoration_tpu.train.loop import validate_by_restoration
    from ddpm_image_restoration_tpu.train.steps import create_train_state

    cfg = tiny_cfg(tmp_path)
    model = build_model(cfg.codec, cfg.model)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    imgs = np.clip(
        np.random.default_rng(0).normal(0, 0.3, (2, 16, 16, 3)), -1, 1
    ).astype(np.float32)
    out = validate_by_restoration(model, state.params, cfg, imgs, n_eval=1)
    assert np.isfinite(out["val_psnr"]) and np.isfinite(out["val_ssim"])
