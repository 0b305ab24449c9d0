"""Experimental Gaussian-mixture solver + SVD structure guidance.

Reference: GaussianMixtureSampler and svd_structure_preservation in
experiments/code/new_method.ipynb (and 0408/0409 iterations; simpler variant
in conv_deep.ipynb). Per reverse step i = steps-1 .. 0, t = i/steps:

    pred = model(x_t, t, t)
    if svd_guide and i > steps/2:
        k_ratio = i/steps
        prior   = svd_lowrank(x_t, k_ratio)
        g       = k_ratio * 0.3
        pred    = (1-g)*pred + g*(y - prior)
    if i > 0:
        x0  = x_t + pred
        mu1 = 0.9*x0 + 0.1*x_t          # conservative
        mu2 = 1.1*x0 - 0.1*x_t          # aggressive
        p   = clamp(i/steps, 0.2, 0.8)  # P(choose conservative)
        mu  = mu1 with prob p else mu2
        x_t = mu + (0.1 * i/steps * guidance) * N(0,1)
        every 5 steps: x_t = phase_consistency(x_t, y, 0.6 + 0.3*(1 - i/steps))
    else:
        x_t = x_t + pred

TPU-native: one lax.scan; the per-image/per-channel Python SVD loop becomes a
batched jnp.linalg.svd over [B*C, H, W]; the mixture-component choice uses the
scan's PRNG key instead of Python random.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ddpm_image_restoration_tpu.config import CodecPreset
from ddpm_image_restoration_tpu.diffusion.ddrm import phase_consistency


def svd_structure_preservation(x: jnp.ndarray, k_ratio) -> jnp.ndarray:
    """Low-rank structure prior: per image & channel, keep the top
    k = max(1, min(h,w)*k_ratio) singular values of the HxW plane.

    `k_ratio` may be a traced scalar (the sampler anneals it), so the
    truncation is a mask over singular values, not a shape change.
    """
    b, h, w, c = x.shape
    planes = jnp.moveaxis(x.astype(jnp.float32), -1, 1).reshape(b * c, h, w)
    u, s, vh = jnp.linalg.svd(planes, full_matrices=False)
    n = s.shape[-1]
    k = jnp.maximum(1, (min(h, w) * k_ratio).astype(jnp.int32))
    mask = (jnp.arange(n)[None, :] < k).astype(s.dtype)
    recon = jnp.einsum("bij,bj,bjk->bik", u, s * mask, vh)
    return jnp.moveaxis(recon.reshape(b, c, h, w), 1, -1).astype(x.dtype)


class GaussianMixtureSampler:
    def __init__(self, model, preset: CodecPreset, codec_id=None):
        self.model = model
        self.preset = preset
        # conditioning index for unified multi-codec models (build_model('all'))
        self._cond = {} if codec_id is None else {"codec_id": int(codec_id)}
        self._compiled = {}

    def _build(self, steps: int, use_phase: bool, use_svd: bool):
        model = self.model
        cond = self._cond

        @jax.jit
        def run(params, y, key, guidance_scale):
            b = y.shape[0]
            y = y.astype(jnp.float32)
            idxs = jnp.arange(steps - 1, -1, -1)

            def step(carry, i):
                x_t, key = carry
                key, k_noise, k_choice = jax.random.split(key, 3)
                t = jnp.full((b,), i, jnp.float32) / steps

                pred = model.apply(params, x_t, t, t, **cond).astype(jnp.float32)

                if use_svd:
                    def guided(p):
                        k_ratio = i.astype(jnp.float32) / steps
                        prior = svd_structure_preservation(x_t, k_ratio)
                        g = k_ratio * 0.3
                        return (1.0 - g) * p + g * (y - prior)

                    pred = jax.lax.cond(i > steps // 2, guided, lambda p: p, pred)

                x0_pred = x_t + pred
                mu1 = x0_pred * 0.9 + x_t * 0.1
                mu2 = x0_pred * 1.1 - x_t * 0.1
                p_conservative = jnp.clip(i.astype(jnp.float32) / steps, 0.2, 0.8)
                use_first = jax.random.uniform(k_choice) < p_conservative
                mean = jnp.where(use_first, mu1, mu2)

                noise_scale = 0.1 * i.astype(jnp.float32) / steps * guidance_scale
                x_next = mean + noise_scale * jax.random.normal(
                    k_noise, x_t.shape, jnp.float32
                )

                if use_phase:
                    alpha = 0.6 + 0.3 * (1.0 - i.astype(jnp.float32) / steps)
                    x_next = jax.lax.cond(
                        jnp.logical_and(i % 5 == 0, i > 0),
                        lambda v: phase_consistency(v, y, alpha),
                        lambda v: v,
                        x_next,
                    )

                x_t = jnp.where(i > 0, x_next, x_t + pred)
                return (x_t, key), None

            (x_final, _), _ = jax.lax.scan(step, (y, key), idxs)
            return x_final

        return run

    def sample(
        self,
        params,
        y: jnp.ndarray,
        steps: int = 100,
        key: Optional[jax.Array] = None,
        use_phase_consistency: bool = True,
        use_svd_guide: bool = True,
        guidance_scale: float = 1.0,
    ) -> jnp.ndarray:
        sig = (steps, use_phase_consistency, use_svd_guide)
        if sig not in self._compiled:
            self._compiled[sig] = self._build(*sig)
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._compiled[sig](params, y, key, jnp.float32(guidance_scale))
