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


def cosine_quality_schedule(t: jnp.ndarray, mode: str = "cosine") -> jnp.ndarray:
    """dct.ipynb get_quality_schedule: t normalized in [0,1] -> quality."""
    t = jnp.asarray(t, jnp.float32)
    if mode == "cosine":
        return 100.0 - 95.0 * jnp.cos(t * jnp.pi / 2) ** 2
    return 100.0 - 95.0 * t
