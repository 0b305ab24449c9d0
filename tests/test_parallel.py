"""Parallelism tests on the faked 8-device CPU mesh: sharding layouts,
data-parallel == single-device equivalence, 2-D mesh training, multichip
dryrun entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ddpm_image_restoration_tpu.config import ModelConfig, TrainConfig
from ddpm_image_restoration_tpu.models import build_model
from ddpm_image_restoration_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    put_batch,
    put_state,
    shard_train_step,
)
from ddpm_image_restoration_tpu.train.steps import create_train_state, make_train_step

from tests._tiny import MINI as TINY_MODEL  # noqa: E402


def _cfg(**kw):
    return TrainConfig(codec="webp", model=TINY_MODEL, batch_size=8, **kw)


def _batch(rng, b=8, s=16):
    x0 = np.clip(rng.normal(0, 0.4, (b, s, s, 3)), -1, 1).astype(np.float32)
    xt = np.clip(x0 + rng.normal(0, 0.1, x0.shape), -1, 1).astype(np.float32)
    return {
        "x0": x0,
        "xt": xt,
        "t": rng.integers(1, 100, b).astype(np.int32),
        "quality": np.full((b,), 30, np.int32),
    }


def test_eight_devices_available():
    assert jax.device_count() == 8  # conftest forces the faked CPU mesh


def test_make_mesh_shapes():
    m1 = make_mesh((-1,), ("data",))
    assert m1.shape == {"data": 8}
    m2 = make_mesh((4, 2), ("data", "model"))
    assert m2.shape == {"data": 4, "model": 2}
    m3 = make_mesh((-1, 2), ("data", "model"))
    assert m3.shape == {"data": 4, "model": 2}


def test_param_shardings_model_axis():
    mesh = make_mesh((4, 2), ("data", "model"))
    cfg = _cfg()
    model = build_model(cfg.codec, cfg.model)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    sh = param_shardings(state.params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(sh)
    specs = {jax.tree_util.keystr(p): s.spec for p, s in flat}
    # at least some large kernels shard their output channels over 'model'
    sharded = [k for k, s in specs.items() if any(ax == "model" for ax in s)]
    assert len(sharded) > 0
    # and 3-channel outputs (e.g. final conv) stay replicated
    out_conv = [k for k in specs if "out_conv" in k and "kernel" in k]
    assert all(specs[k] == P() for k in out_conv)


@pytest.mark.slow
def test_dp_matches_single_device(rng):
    """Data-parallel over 8 devices must match single-device numerics."""
    cfg = _cfg()
    model = build_model(cfg.codec, cfg.model)
    state0 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, cfg)
    batch = _batch(rng)
    key = jax.random.PRNGKey(3)

    # single device
    s_single, m_single = jax.jit(step_fn)(state0, batch, key)

    # 8-way data parallel
    mesh = make_mesh((-1,), ("data",))
    state1 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    pstep = shard_train_step(step_fn, mesh, state1)
    s_dp, m_dp = pstep(put_state(state1, mesh), put_batch(batch, mesh), key)

    assert float(m_single["loss"]) == pytest.approx(float(m_dp["loss"]), rel=1e-5)
    a = jax.tree_util.tree_leaves(s_single.params)[0]
    b = jax.tree_util.tree_leaves(s_dp.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_fsdp_matches_single_device(rng):
    """FSDP param sharding over the data axis: numerics match the
    single-device step, and large params are actually sharded on 'data'
    (alone and combined with the model axis, and with EMA)."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(), ema_decay=0.9)
    model = build_model(cfg.codec, cfg.model)
    step_fn = make_train_step(model, cfg)
    batch = _batch(rng)
    key = jax.random.PRNGKey(3)
    state0 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    s_single, m_single = jax.jit(step_fn)(state0, batch, key)

    for shape, axes in [((-1,), ("data",)), ((4, 2), ("data", "model"))]:
        mesh = make_mesh(shape, axes)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0))
        pstep = shard_train_step(step_fn, mesh, state, fsdp=True)
        s, m = pstep(put_state(state, mesh, fsdp=True), put_batch(batch, mesh), key)
        assert float(m["loss"]) == pytest.approx(float(m_single["loss"]), rel=1e-4)
        a = jax.tree_util.tree_leaves(s_single.params)[0]
        b = jax.tree_util.tree_leaves(s.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        # some large kernels (params AND adam moments AND ema) shard on 'data'
        for tree in (s.params, s.opt_state, s.ema_params):
            sharded = [
                l for l in jax.tree_util.tree_leaves(tree)
                if hasattr(l, "sharding") and "data" in (l.sharding.spec or ())
            ]
            assert len(sharded) > 0


@pytest.mark.slow
def test_sharded_step_with_ema(rng):
    """ema_params must flow through shard_train_step (sharded like params)
    on both 1-D and 2-D meshes."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(), ema_decay=0.9)
    model = build_model(cfg.codec, cfg.model)
    step_fn = make_train_step(model, cfg)
    batch = _batch(rng)
    key = jax.random.PRNGKey(3)
    for shape, axes in [((-1,), ("data",)), ((4, 2), ("data", "model"))]:
        mesh = make_mesh(shape, axes)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0))
        pstep = shard_train_step(step_fn, mesh, state)
        s, m = pstep(put_state(state, mesh), put_batch(batch, mesh), key)
        assert np.isfinite(float(m["loss"]))
        e = jax.tree_util.tree_leaves(s.ema_params)[0]
        p = jax.tree_util.tree_leaves(s.params)[0]
        assert np.isfinite(np.asarray(e)).all()
        assert not np.allclose(np.asarray(e), np.asarray(p))


@pytest.mark.slow
def test_2d_mesh_train_step(rng):
    """(data=4, model=2) mesh: XLA inserts channel all-gathers; loss finite
    and matches the single-device step."""
    cfg = _cfg()
    model = build_model(cfg.codec, cfg.model)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, cfg)
    batch = _batch(rng)
    key = jax.random.PRNGKey(3)
    _, m_single = jax.jit(step_fn)(state, batch, key)

    mesh = make_mesh((4, 2), ("data", "model"))
    state2 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    pstep = shard_train_step(step_fn, mesh, state2)
    s2, m2 = pstep(put_state(state2, mesh), put_batch(batch, mesh), key)
    assert float(m2["loss"]) == pytest.approx(float(m_single["loss"]), rel=1e-4)
    assert int(s2.step) == 1


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    mod.dryrun_multichip(2)  # 1-D data-only mesh path


@pytest.mark.slow
def test_restore_batch_sharded(rng):
    """Restoration is embarrassingly parallel: sampler over a data-sharded
    batch runs unchanged."""
    from ddpm_image_restoration_tpu.config import get_preset
    from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler

    cfg = _cfg()
    model = build_model(cfg.codec, cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros(1))
    mesh = make_mesh((-1,), ("data",))
    y = jax.device_put(
        np.clip(rng.normal(0, 0.4, (8, 16, 16, 3)), -1, 1).astype(np.float32),
        batch_sharding(mesh),
    )
    sampler = DDRMSampler(model, get_preset("webp"))
    out = sampler.sample(params, y, quality=30, steps=3)
    assert out.shape == (8, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_dp_restore_matches_single_device(rng):
    """shard_inference DP restoration == single-device restoration for the
    same key (noise inside the scan is sharding-invariant under JAX's
    partitionable threefry)."""
    from ddpm_image_restoration_tpu.config import get_preset
    from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler
    from ddpm_image_restoration_tpu.parallel.mesh import shard_inference

    cfg = _cfg()
    model = build_model(cfg.codec, cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros(1))
    y = np.clip(rng.normal(0, 0.4, (8, 16, 16, 3)), -1, 1).astype(np.float32)
    sampler = DDRMSampler(model, get_preset("webp"))
    key = jax.random.PRNGKey(7)

    single = np.asarray(
        sampler.sample(params, jnp.asarray(y), quality=30, steps=4, key=key)
    )
    mesh = make_mesh((-1,), ("data",))
    p_sh, y_sh = shard_inference(params, jnp.asarray(y), mesh)
    dp = np.asarray(sampler.sample(p_sh, y_sh, quality=30, steps=4, key=key))
    np.testing.assert_allclose(dp, single, rtol=0, atol=1e-5)


@pytest.mark.slow
def test_sp_restore_matches_single_device(rng):
    """shard_inference_spatial (image H axis over the mesh) == single-device
    restoration: XLA inserts conv halo exchanges / gathers for global ops,
    and the in-scan noise is sharding-invariant under partitionable threefry.
    This is the scale-out path for a batch smaller than the device count."""
    from ddpm_image_restoration_tpu.config import get_preset
    from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler
    from ddpm_image_restoration_tpu.parallel.mesh import shard_inference_spatial

    cfg = _cfg()
    model = build_model(cfg.codec, cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros(1))
    y = np.clip(rng.normal(0, 0.4, (2, 16, 16, 3)), -1, 1).astype(np.float32)
    sampler = DDRMSampler(model, get_preset("webp"))
    key = jax.random.PRNGKey(7)

    single = np.asarray(
        sampler.sample(params, jnp.asarray(y), quality=30, steps=4, key=key)
    )
    mesh = make_mesh((-1,), ("spatial",))
    p_sh, y_sh = shard_inference_spatial(params, jnp.asarray(y), mesh)
    assert y_sh.sharding.spec == P(None, "spatial")
    sp = np.asarray(sampler.sample(p_sh, y_sh, quality=30, steps=4, key=key))
    # unlike DP, spatial sharding SPLITS reductions (conv halo exchanges,
    # gathered FFT/attention) -> float reassociation at the 1e-5 level
    np.testing.assert_allclose(sp, single, rtol=0, atol=1e-4)
