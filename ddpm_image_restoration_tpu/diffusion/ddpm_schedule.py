"""Classic DDPM β-schedule machinery used by the historical experiment models.

Reference: experiments/code/ddpm.ipynb — β linear 1e-4→0.02 over T=100,
quality→timestep map t = 101 - QF, ε-target
ε = (xt − √ᾱ_t·x0) / √(1−ᾱ_t), and the posterior mean update
x_{t-1} = (xt − (1−α_t)/√(1−ᾱ_t)·ε̂) / √α_t (extract ddpm.py:330-347,447-455).
Also the cosine quality schedule of experiments/code/dct.ipynb:
quality(t) = 100 − 95·cos²(π t / 2) for normalized t (dct.py:681-686 extract).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DDPMSchedule(NamedTuple):
    betas: jnp.ndarray        # [T]
    alphas: jnp.ndarray       # [T]
    alpha_bars: jnp.ndarray   # [T] cumulative products

    @property
    def T(self) -> int:
        return self.betas.shape[0]


def make_ddpm_schedule(T: int = 100, beta_start: float = 1e-4, beta_end: float = 0.02) -> DDPMSchedule:
    betas = jnp.linspace(beta_start, beta_end, T, dtype=jnp.float32)
    alphas = 1.0 - betas
    return DDPMSchedule(betas, alphas, jnp.cumprod(alphas))


def quality_to_timestep(quality) -> jnp.ndarray:
    """QF in [1,100] -> t in [1,100] (ddpm.ipynb: t = 101 - qf)."""
    return 101 - jnp.asarray(quality, jnp.int32)


def ddpm_noise_target(x0: jnp.ndarray, xt: jnp.ndarray, t, sched: DDPMSchedule) -> jnp.ndarray:
    """ε = (xt − √ᾱ_t x0)/√(1−ᾱ_t): treat codec output as the DDPM noisy state."""
    ab = sched.alpha_bars[jnp.asarray(t, jnp.int32) - 1]
    ab = ab.reshape(-1, *([1] * (x0.ndim - 1)))
    return (xt - jnp.sqrt(ab) * x0) / jnp.sqrt(1.0 - ab)


def ddpm_posterior_step(xt: jnp.ndarray, eps_hat: jnp.ndarray, t, sched: DDPMSchedule) -> jnp.ndarray:
    """One reverse posterior-mean update (no noise injection, as the reference)."""
    ti = jnp.asarray(t, jnp.int32) - 1
    a = sched.alphas[ti].reshape(-1, *([1] * (xt.ndim - 1)))
    ab = sched.alpha_bars[ti].reshape(-1, *([1] * (xt.ndim - 1)))
    return (xt - (1.0 - a) / jnp.sqrt(1.0 - ab) * eps_hat) / jnp.sqrt(a)


def ddpm_inference(model_apply, params, y: jnp.ndarray, T: int = 70,
                   sched: DDPMSchedule | None = None) -> jnp.ndarray:
    """Reverse chain t = T..1 as a jitted scan (ddpm.ipynb ddpm_inference)."""
    sched = sched or make_ddpm_schedule()

    def step(xt, t):
        t_vec = jnp.full((xt.shape[0],), t, jnp.float32)
        eps = model_apply(params, xt, t_vec)
        return ddpm_posterior_step(xt, eps, jnp.full((xt.shape[0],), t), sched), None

    ts = jnp.arange(T, 0, -1)
    out, _ = jax.lax.scan(step, y, ts)
    return out


def ddim_inference(model_apply, params, y: jnp.ndarray, T: int = 70,
                   n_steps: int = 0, eta: float = 0.0,
                   sched: DDPMSchedule | None = None,
                   key: jax.Array | None = None) -> jnp.ndarray:
    """DDIM sampling (Song et al., arXiv:2010.02502) over the same β-schedule
    — NOT in the reference (its experiments only run the full posterior
    chain, extract ddpm.py:447-455). With n_steps < T this subsamples the
    timestep grid uniformly, the few-eval analogue of the DDRM solver's
    `stride` for the historical ε-prediction models; eta=0 is deterministic,
    eta=1 recovers DDPM-like stochasticity on the subsampled grid.

        x_{s} = √ᾱ_s · x̂0 + √(1−ᾱ_s−σ²) · ε̂ + σ·z,
        x̂0 = (x_t − √(1−ᾱ_t)·ε̂)/√ᾱ_t,
        σ = eta·√((1−ᾱ_s)/(1−ᾱ_t))·√(1−ᾱ_t/ᾱ_s)
    """
    sched = sched or make_ddpm_schedule()
    n_steps = n_steps or T
    # descending subsampled grid T..1 (endpoints included), then pairs (t, s)
    import numpy as np

    grid = np.unique(np.round(np.linspace(1, T, n_steps)).astype(np.int64))[::-1]
    pairs = np.stack([grid, np.append(grid[1:], 0)], axis=1)  # s=0 -> x0
    key = key if key is not None else jax.random.PRNGKey(0)

    def step(carry, ts):
        xt, key = carry
        t, s = ts[0], ts[1]
        key, nkey = jax.random.split(key)
        t_vec = jnp.full((xt.shape[0],), t, jnp.float32)
        eps = model_apply(params, xt, t_vec)
        shape1 = (-1,) + (1,) * (xt.ndim - 1)
        ab_t = sched.alpha_bars[t - 1].reshape(shape1)
        # ᾱ_0 := 1 (fully denoised)
        ab_s = jnp.where(s > 0, sched.alpha_bars[jnp.maximum(s - 1, 0)], 1.0)
        ab_s = ab_s.reshape(shape1)
        x0_hat = (xt - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
        sigma = eta * jnp.sqrt((1.0 - ab_s) / (1.0 - ab_t)) * jnp.sqrt(
            1.0 - ab_t / ab_s
        )
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - ab_s - sigma**2, 0.0)) * eps
        noise = jax.random.normal(nkey, xt.shape, xt.dtype)
        x_next = jnp.sqrt(ab_s) * x0_hat + dir_xt + sigma * noise
        return (x_next, key), None

    (out, _), _ = jax.lax.scan(step, (y, key), jnp.asarray(pairs))
    return out


def cosine_quality_schedule(t: jnp.ndarray, mode: str = "cosine") -> jnp.ndarray:
    """dct.ipynb get_quality_schedule: t normalized in [0,1] -> quality."""
    t = jnp.asarray(t, jnp.float32)
    if mode == "cosine":
        return 100.0 - 95.0 * jnp.cos(t * jnp.pi / 2) ** 2
    return 100.0 - 95.0 * t
