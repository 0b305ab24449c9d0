"""Tests for the historical/experimental model family + DDPM schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_image_restoration_tpu.diffusion.ddpm_schedule import (
    cosine_quality_schedule,
    ddim_inference,
    ddpm_inference,
    ddpm_noise_target,
    ddpm_posterior_step,
    make_ddpm_schedule,
    quality_to_timestep,
)
from ddpm_image_restoration_tpu.models.experimental import (
    DCTDenoiser,
    ExperimentalFreqAwareBlock,
    HFCM,
    MLPDenoiser,
    SelectiveFreqUNet,
    SimpleConvUNet,
)


@pytest.fixture
def x16(rng):
    return jnp.asarray(np.clip(rng.normal(0, 0.4, (2, 16, 16, 3)), -1, 1).astype("f"))


def test_ddpm_schedule_values():
    s = make_ddpm_schedule(100)
    assert s.T == 100
    assert float(s.betas[0]) == pytest.approx(1e-4)
    assert float(s.betas[-1]) == pytest.approx(0.02)
    assert float(s.alpha_bars[-1]) < float(s.alpha_bars[0])
    assert np.all(np.asarray(s.alpha_bars) > 0)


def test_quality_timestep_map():
    assert int(quality_to_timestep(100)) == 1
    assert int(quality_to_timestep(1)) == 100


def test_noise_target_posterior_inverse(x16, rng):
    """Posterior step with the TRUE ε target must take xt toward x0's scale."""
    s = make_ddpm_schedule(100)
    x0 = x16
    xt = jnp.clip(x0 + 0.2 * rng.standard_normal(x0.shape).astype("f"), -1, 1)
    t = jnp.full((2,), 50, jnp.int32)
    eps = ddpm_noise_target(x0, xt, t, s)
    # reconstruct xt from (x0, eps): xt = sqrt(ab) x0 + sqrt(1-ab) eps
    ab = s.alpha_bars[49]
    xt_rec = jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * eps
    np.testing.assert_allclose(np.asarray(xt_rec), np.asarray(xt), atol=1e-5)
    out = ddpm_posterior_step(xt, eps, t, s)
    assert out.shape == xt.shape


def test_ddim_exact_with_true_eps(x16, rng):
    """With the trajectory's true constant-ε predictor, deterministic DDIM
    (eta=0) recovers x0 exactly — full grid AND a 5-step subsampled grid
    (the update is exact for any step size when ε̂ is the true ε)."""
    T = 20
    s = make_ddpm_schedule(T)
    x0 = x16
    eps = jnp.asarray(rng.standard_normal(x0.shape).astype("f"))
    ab_T = s.alpha_bars[T - 1]
    xT = jnp.sqrt(ab_T) * x0 + jnp.sqrt(1 - ab_T) * eps

    model = lambda params, xt, t_vec: eps
    for n_steps in (T, 5):
        out = ddim_inference(model, None, xT, T=T, n_steps=n_steps, eta=0.0, sched=s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_ddim_runs_with_model(x16):
    m = SimpleConvUNet(widths=(8, 8, 16))
    params = m.init(jax.random.PRNGKey(0), x16, jnp.zeros(2))
    t_apply = lambda p, x, t: m.apply(p, x, t)
    out = ddim_inference(t_apply, params, x16, T=10, n_steps=3, eta=0.5)
    assert out.shape == x16.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_cosine_quality_schedule():
    q0 = float(cosine_quality_schedule(jnp.float32(0.0)))
    q1 = float(cosine_quality_schedule(jnp.float32(1.0)))
    assert q0 == pytest.approx(5.0, abs=1e-4)     # 100 - 95*cos(0)^2
    assert q1 == pytest.approx(100.0, abs=1e-4)   # cos(pi/2) = 0
    lin = float(cosine_quality_schedule(jnp.float32(0.5), mode="linear"))
    assert lin == pytest.approx(52.5)


def test_mlp_denoiser(x16):
    m = MLPDenoiser(image_size=16, hidden=(64, 128, 64), t_dim=32)
    params = m.init(jax.random.PRNGKey(0), x16, jnp.zeros(2))
    out = m.apply(params, x16, jnp.full((2,), 50.0))
    assert out.shape == x16.shape
    assert float(jnp.abs(out).max()) <= 1.0


def test_simple_conv_unet_and_ddpm_inference(x16):
    m = SimpleConvUNet(widths=(8, 16, 16), time_dim=32)
    params = m.init(jax.random.PRNGKey(0), x16, jnp.zeros(2))
    out = m.apply(params, x16, jnp.full((2,), 10.0))
    assert out.shape == x16.shape
    restored = ddpm_inference(m.apply, params, x16, T=5)
    assert restored.shape == x16.shape
    assert np.all(np.isfinite(np.asarray(restored)))


def test_dct_denoiser(x16):
    m = DCTDenoiser(widths=(8, 16, 16), time_dim=32)
    params = m.init(jax.random.PRNGKey(0), x16, jnp.zeros(2))
    out = m.apply(params, x16, jnp.full((2,), 0.3))
    assert out.shape == x16.shape
    assert float(jnp.abs(out).max()) <= 1.0  # tanh head (direct x0 prediction)


def test_hfcm_and_freq_block_level_modulation(x16):
    for cls in (HFCM, ExperimentalFreqAwareBlock):
        m = cls(3)
        params = m.init(jax.random.PRNGKey(0), x16, jnp.zeros(2))
        lo = m.apply(params, x16, jnp.zeros(2))
        hi = m.apply(params, x16, jnp.ones(2))
        assert lo.shape == x16.shape
        assert float(jnp.abs(lo - hi).mean()) > 1e-8  # level changes output


def test_selective_freq_unet(x16):
    m = SelectiveFreqUNet(widths=(8, 8), bottleneck=(8, 8, 8), time_dim=32)
    params = m.init(jax.random.PRNGKey(0), x16, jnp.zeros(2))
    out = m.apply(params, x16, jnp.full((2,), 0.5))
    assert out.shape == x16.shape
    # bare conv head: outputs are NOT tanh-bounded by construction
    p = params["params"]
    assert "down2" in p and "hfcm" in p["down2"]      # freq guide at down2
    assert "hfcm" not in p["down1"]                   # but not at down1
