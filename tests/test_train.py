"""Training layer tests: schedule shape, train step decreases loss,
checkpoint save/restore round-trip, end-to-end mini training run."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_image_restoration_tpu.config import ModelConfig, TrainConfig
from ddpm_image_restoration_tpu.data import SyntheticImageDataset
from ddpm_image_restoration_tpu.models import build_model
from ddpm_image_restoration_tpu.train.checkpoint import CheckpointManager
from ddpm_image_restoration_tpu.train.schedules import cosine_warm_restarts
from ddpm_image_restoration_tpu.train.steps import (
    create_train_state,
    make_train_step,
)

from tests._tiny import MINI as TINY_MODEL  # noqa: E402


def tiny_cfg(tmpdir=".", **kw):
    return TrainConfig(
        codec="webp",
        model=TINY_MODEL,
        batch_size=4,
        checkpoint_dir=str(tmpdir),
        **kw,
    )


def test_cosine_warm_restarts_schedule():
    sched = cosine_warm_restarts(1.0, t0=100, t_mult=2)
    assert float(sched(0)) == pytest.approx(1.0, abs=1e-6)
    assert float(sched(50)) == pytest.approx(0.5, abs=1e-2)
    assert float(sched(99)) < 0.01
    # restart at 100, next period is 200 long
    assert float(sched(100)) == pytest.approx(1.0, abs=1e-6)
    assert float(sched(200)) == pytest.approx(0.5, abs=1e-2)
    assert float(sched(300)) == pytest.approx(1.0, abs=1e-6)  # second restart


def _fake_batch(rng, b=4, s=16):
    x0 = np.clip(rng.normal(0, 0.4, (b, s, s, 3)), -1, 1).astype(np.float32)
    xt = np.clip(x0 + rng.normal(0, 0.1, x0.shape), -1, 1).astype(np.float32)
    return {
        "x0": jnp.asarray(x0),
        "xt": jnp.asarray(xt),
        "t": jnp.asarray(rng.integers(1, 100, b), jnp.int32),
        "quality": jnp.full((b,), 30, jnp.int32),
    }


@pytest.mark.slow
def test_train_step_reduces_loss(rng):
    cfg = tiny_cfg()
    model = build_model(cfg.codec, cfg.model)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, cfg))
    batch = _fake_batch(rng)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
        assert float(m["grad_norm"]) > 0
    assert losses[-1] < losses[0]  # same-batch overfit must reduce loss
    assert int(state.step) == 8


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = tiny_cfg(tmp_path / "ckpt")
    model = build_model(cfg.codec, cfg.model)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, cfg))
    state, _ = step(state, _fake_batch(rng), jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, {"val_psnr": 11.0, "epoch": 0})
    state2, _ = step(state, _fake_batch(rng), jax.random.PRNGKey(2))
    mgr.save(1, state2, {"val_psnr": 22.0, "epoch": 1})
    mgr.wait()

    template = create_train_state(model, cfg, jax.random.PRNGKey(0))
    restored, meta = mgr.restore_latest(template)
    assert meta["epoch"] == 1
    assert int(restored.step) == int(state2.step)
    a = jax.tree_util.tree_leaves(restored.params)[0]
    b = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert mgr.best_step() == 1
    mgr.close()


@pytest.mark.slow
def test_ema_update_math_and_checkpoint(tmp_path, rng):
    """EMA tracks params with the configured decay (exact one-step algebra),
    defaults to off, and round-trips through Orbax."""
    cfg_off = tiny_cfg(tmp_path / "off")
    model = build_model(cfg_off.codec, cfg_off.model)
    assert create_train_state(model, cfg_off, jax.random.PRNGKey(0)).ema_params is None

    cfg = tiny_cfg(tmp_path / "ckpt", ema_decay=0.9)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    # at init the EMA equals the params
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    e0 = jax.tree_util.tree_leaves(state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(e0))

    step = jax.jit(make_train_step(model, cfg))
    prev_params = state.params
    state, _ = step(state, _fake_batch(rng), jax.random.PRNGKey(1))
    # warmed-up decay: at t=1 the effective decay is min(0.9, 2/11) — early
    # EMA must shed the random init fast (a flat 0.999 kept 32% of the init
    # after 1150 steps and made EMA validation degrade images)
    d1 = min(0.9, 2.0 / 11.0)
    want = jax.tree_util.tree_map(
        lambda e, p: e * d1 + p * (1 - d1), prev_params, state.params
    )
    for w, g in zip(
        jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(state.ema_params)
    ):
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-6)

    # past the ramp (t >= 10/(1-d)) the configured decay applies exactly
    state = state.replace(step=jnp.asarray(999, state.step.dtype))
    prev_ema = state.ema_params
    state, _ = step(state, _fake_batch(rng), jax.random.PRNGKey(2))
    want = jax.tree_util.tree_map(
        lambda e, p: e * 0.9 + p * 0.1, prev_ema, state.params
    )
    for w, g in zip(
        jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(state.ema_params)
    ):
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-6)
    # EMA lags the raw params after an update
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, {"val_psnr": 10.0, "epoch": 0})
    mgr.wait()
    template = create_train_state(model, cfg, jax.random.PRNGKey(2))
    restored, _ = mgr.restore_latest(template)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]),
    )
    mgr.close()


@pytest.mark.slow
def test_checkpoint_ema_compat_both_ways(tmp_path, rng):
    """Checkpoints must load across the optional ema_params field:
    pre-EMA ckpt -> EMA-enabled state (EMA None, callers decide), and
    EMA ckpt -> plain state (EMA restored and kept, never template data)."""
    model = build_model("webp", TINY_MODEL)

    # pre-EMA-format checkpoint: saved WITHOUT the ema_params key
    cfg_off = tiny_cfg(tmp_path / "old")
    s_old = create_train_state(model, cfg_off, jax.random.PRNGKey(0))
    mgr_old = CheckpointManager(str(tmp_path / "old"))
    mgr_old.save(
        0,
        {"step": s_old.step, "params": s_old.params, "opt_state": s_old.opt_state},
        {"val_psnr": 10.0, "epoch": 0},
    )
    mgr_old.wait()
    cfg_ema = tiny_cfg(tmp_path / "old", ema_decay=0.9)
    tgt = create_train_state(model, cfg_ema, jax.random.PRNGKey(1))
    restored, _ = mgr_old.restore_latest(tgt)
    assert restored.ema_params is None  # never the template's random copy
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(s_old.params)[0]),
    )
    mgr_old.close()

    # EMA-format checkpoint into a plain (no-EMA) target
    cfg_on = tiny_cfg(tmp_path / "new", ema_decay=0.9)
    s_new = create_train_state(model, cfg_on, jax.random.PRNGKey(2))
    step = jax.jit(make_train_step(model, cfg_on))
    s_new, _ = step(s_new, _fake_batch(rng), jax.random.PRNGKey(3))
    mgr_new = CheckpointManager(str(tmp_path / "new"))
    mgr_new.save(0, s_new, {"val_psnr": 10.0, "epoch": 0})
    mgr_new.wait()
    plain_tgt = create_train_state(model, tiny_cfg(tmp_path / "new"), jax.random.PRNGKey(4))
    assert plain_tgt.ema_params is None
    restored2, _ = mgr_new.restore_latest(plain_tgt)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored2.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(s_new.ema_params)[0]),
    )
    mgr_new.close()


@pytest.mark.slow
def test_end_to_end_mini_training(tmp_path):
    """The minimum end-to-end slice (SURVEY.md §7): synthetic data ->
    degradation pipeline -> train steps -> sampler validation -> ckpt -> viz."""
    from ddpm_image_restoration_tpu.train.loop import train_model

    cfg = tiny_cfg(
        tmp_path / "run",
        epochs=1,
        steps=20,
    )
    ds = SyntheticImageDataset(10, 16)
    state, history = train_model(cfg, dataset=ds, epochs=1, val_batch=2, verbose=False)
    assert np.isfinite(history["loss"][-1])
    assert "val_psnr" in history and np.isfinite(history["val_psnr"][-1])
    assert (tmp_path / "run" / "curves" / "training.png").exists()
    assert (tmp_path / "run" / "viz" / "epoch_0000.png").exists()
    assert (tmp_path / "run" / "metrics.jsonl").exists()


@pytest.mark.slow
def test_resume_continues(tmp_path):
    from ddpm_image_restoration_tpu.train.loop import train_model

    cfg = tiny_cfg(tmp_path / "run", epochs=2, steps=20)
    ds = SyntheticImageDataset(20, 16)  # split 16/2/2 -> 4 steps/epoch at bs 4
    train_model(cfg, dataset=ds, epochs=1, val_batch=2, verbose=False)
    # second call resumes from epoch 1 and trains only the remaining epoch
    state, history = train_model(cfg, dataset=ds, epochs=2, val_batch=2, verbose=False)
    assert int(state.step) == 2 * 4


def test_checkpoint_retention_keeps_latest_and_best(tmp_path):
    """Retention must serve both restore_best and restore_latest: with a
    plain best-k policy, a run whose early epochs scored best deletes the
    newest checkpoint and the next run silently restarts from scratch
    (observed on a real 60-epoch training run)."""
    import numpy as np

    from ddpm_image_restoration_tpu.train.checkpoint import CheckpointManager

    d = str(tmp_path / "ckpt")
    m = CheckpointManager(d)
    history = [(0, 19.0), (1, 19.95), (2, 19.93), (3, 19.94), (10, 19.5), (59, 19.91)]
    for step, psnr in history:
        m.save(step, {"w": np.arange(4.0) + step}, {"epoch": step, "val_psnr": psnr})
    m.wait()
    m.close()

    m2 = CheckpointManager(d)  # fresh instance = new process
    assert m2.latest_step() == 59
    assert m2.best_step() == 1
    state, meta = m2.restore_latest({"w": np.zeros(4)})
    assert meta["epoch"] == 59 and state["w"][0] == 59.0
    _, meta = m2.restore_best({"w": np.zeros(4)})
    assert meta["epoch"] == 1
    m2.close()


@pytest.mark.slow
def test_ckpt_min_interval_rate_limits_saves(tmp_path):
    """With ckpt_min_interval=3 a 5-epoch run (val-PSNR typically improving
    every epoch at this scale) must not save 5 full states: epoch 0, at most
    one mid-run save once the interval elapses, and the final epoch."""
    from ddpm_image_restoration_tpu.train.loop import train_model

    cfg = tiny_cfg(tmp_path / "run", epochs=5, steps=20, ckpt_min_interval=3)
    ds = SyntheticImageDataset(10, 16)
    train_model(cfg, dataset=ds, epochs=5, val_batch=2, verbose=False)
    saved = sorted(
        int(p.name) for p in (tmp_path / "run").iterdir() if p.name.isdigit()
    )
    assert 4 in saved  # last epoch always saves
    assert len(saved) <= 3
    for a, b in zip(saved, saved[1:]):
        assert b - a >= 3 or b == 4


@pytest.mark.slow
def test_unified_train_step_and_validation(tmp_path, rng):
    """--codec all end-to-end at the step level: conditioned batches train,
    loss is finite and decreases, and unified validation (one restore per
    codec) returns averaged metrics."""
    from ddpm_image_restoration_tpu.train.loop import (
        unified_samplers,
        validate_by_restoration,
    )

    cfg = TrainConfig(
        codec="all", model=TINY_MODEL, batch_size=4, checkpoint_dir=str(tmp_path)
    )
    model = build_model("all", cfg.model)
    assert model.cfg.codec_conditioning
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, cfg))
    batch = _fake_batch(rng)
    batch["codec_id"] = jnp.asarray(np.array([0, 1, 2, 0]), jnp.int32)
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    val_images = np.asarray(batch["x0"][:2])
    samplers = unified_samplers(model, "surrogate")
    out = validate_by_restoration(
        model, state.params, cfg, val_images, sampler=samplers
    )
    assert np.isfinite(out["val_psnr"]) and np.isfinite(out["val_ssim"])


def test_release_params_roundtrip(tmp_path):
    """export_release_params -> load_release_params must reproduce the
    params pytree (same structure, values within fp16 rounding) so
    --params-npz serving/eval is equivalent to the Orbax checkpoint."""
    import jax
    import numpy as np

    from ddpm_image_restoration_tpu.models import build_model
    from ddpm_image_restoration_tpu.train.checkpoint import (
        export_release_params,
        load_release_params,
    )
    from tests._tiny import MINI

    model = build_model("webp", MINI)
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)), jnp.zeros(1))["params"]
    out = export_release_params(params, str(tmp_path / "rel.npz"),
                                codec="webp", meta={"epoch": 3})
    loaded = load_release_params(out)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda kv: str(kv[0])),
                                  sorted(flat_b, key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        assert vb.dtype == np.float32
        np.testing.assert_allclose(np.asarray(va, np.float32), vb,
                                   rtol=1e-3, atol=1e-4)
