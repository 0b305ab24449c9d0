"""DDRM-codec sampler: the reference's custom solver as a jitted lax.scan.

Reference semantics (DDRM{WebP,JPEG,AVIF}Sampler, webp_training.py:424-473 /
avif.py:476-525), per reverse step i = steps-1 .. 0 with t = i/steps:

    x̂  = model(x_t, t, t)                      # predicted residual? No —
                                                 # the model output IS x_theta,
                                                 # the current clean estimate
    ĉ  = codec(x̂, quality)                     # re-compress the prediction
    x'  = x̂ - ĉ + y                            # DDRM measurement consistency
    i>0:  x_t = η_b·x' + (1-η_b)·x̂ + η·N(0, (noise_scale·t)²)
          every `phase_period` steps when quality < threshold:
              x_t = phase_consistency(x_t, y, α)
    i==0: x_t = x'

(The reference trains the model to predict the residual x0-xt but *samples*
treating the raw model output as x_theta — webp_training.py:448-455. That quirk
is reproduced via `prediction='direct'`; `prediction='residual'` adds x_t to
the model output first, flag-gated as the mathematically-consistent variant.)

TPU-native design: the whole reverse loop is one `lax.scan` under jit — no
host round-trip per step. The codec consistency step is pluggable:

  * 'surrogate' — `codecs.surrogate.codec_surrogate` on device (default).
  * 'callback'  — one batched `jax.pure_callback` per step into the host
                  PIL codec pool (bit-exact codec, still a single scan).
                  NOTE: the axon-tunneled PJRT platform raises UNIMPLEMENTED
                  for host callbacks; use 'host_loop' there.
  * 'host_loop' — bit-exact codec without callbacks: a jitted model+update
                  step per iteration with the codec round-trip on the host
                  between steps (exactly the reference's execution shape,
                  webp_training.py:437-471). Works on every platform; pays
                  one device<->host batch transfer per step.

Sampler statistics (x_t, noise, consistency algebra) stay in float32 even when
the model computes in bf16.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_image_restoration_tpu.config import CodecPreset
from ddpm_image_restoration_tpu.codecs.surrogate import codec_surrogate


def phase_consistency(x: jnp.ndarray, ref: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """Recombine x's FFT magnitude with ref's phase, blend with weight alpha
    (webp_training.py:402-421). NHWC; FFT over the spatial axes."""
    x = x.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    x_fft = jnp.fft.fft2(x, axes=(1, 2))
    ref_fft = jnp.fft.fft2(ref, axes=(1, 2))
    x_mag = jnp.abs(x_fft)
    ref_phase = jnp.angle(ref_fft)
    adjusted = jnp.fft.ifft2(
        x_mag * (jnp.cos(ref_phase) + 1j * jnp.sin(ref_phase)), axes=(1, 2)
    ).real
    return alpha * x + (1.0 - alpha) * adjusted


def quality_gated_blend(
    restored: jnp.ndarray,
    y: jnp.ndarray,
    quality,
    lo: float,
    hi: float,
) -> jnp.ndarray:
    """Protect near-lossless inputs from restoration damage (NOT in the
    reference; flag-gated). The published tables (SURVEY.md §6) and our own
    runs both show the smallest/negative gains at the highest qualities —
    at q>=90 a full restoration pass can *lose* PSNR. Blend the restoration
    back toward the observation with a linear ramp: full restoration at
    quality <= lo, untouched observation at quality >= hi. `quality` may be
    a scalar or a per-sample [B] vector."""
    w = jnp.clip((hi - jnp.asarray(quality, jnp.float32)) / (hi - lo), 0.0, 1.0)
    if w.ndim == 1:  # per-sample quality: broadcast over H, W, C
        w = w[:, None, None, None]
    return w * restored.astype(jnp.float32) + (1.0 - w) * y.astype(jnp.float32)


# Expected codec damage D(q): RMS of (codec(x0) - x0) in [-1,1] units,
# measured on the photographic-statistics `natural` corpus (n=32, 64^2,
# results/r5/natural_corpus_calibration.md; real-patch WebP spot-check
# agrees within ~0.003 RMS except q0 where natural is conservative).
# The trust-region blend below uses this as the per-quality trust radius.
_DAMAGE_Q = np.array([0.0, 5.0, 10.0, 20.0, 30.0, 50.0, 70.0, 90.0, 100.0])
_DAMAGE_RMS = {
    "webp": np.array([0.0909, 0.0656, 0.0598, 0.0533, 0.0483,
                      0.0417, 0.0362, 0.0248, 0.0192]),
    "jpeg": np.array([0.1480, 0.1115, 0.0791, 0.0563, 0.0469,
                      0.0323, 0.0272, 0.0211, 0.0077]),
    "avif": np.array([0.1201, 0.1011, 0.0870, 0.0651, 0.0547,
                      0.0366, 0.0244, 0.0158, 0.0064]),
}


def residual_trust_blend(
    restored: jnp.ndarray,
    y: jnp.ndarray,
    quality,
    codec: str,
    beta: float = 2.0,
    window: int = 8,
) -> jnp.ndarray:
    """Content-aware protection (round 5; NOT in the reference): cap the
    restoration residual's LOCAL energy at beta x the calibrated damage the
    codec plausibly inflicted at this quality.

    Rationale (VERDICT r4 missing #1 / next #1b): the quality-gated blend
    protects near-lossless inputs but fades restoration out by quality
    ALONE — it cannot distinguish a grain-dominated crop (where the model's
    rewrite is damage) from a blocked textured crop at the same quality
    (where it is restoration). The failure mode on real photographs is the
    model smoothing sensor grain: a rewrite whose local RMS far exceeds
    what codec(quality) could have destroyed. So per 8x8 window:

        w = min(1, beta * D(q) / rms_local(restored - y))
        out = y + w * (restored - y)

    with D(q) the calibrated RMS codec error at quality q (_DAMAGE_RMS).
    Legitimate restorations have rms(r) ~ D(q) -> w = min(1, beta) = 1;
    grain-smoothing rewrites at high quality have rms(r) >> D(q) -> shrunk.
    Never amplifies (w <= 1), spatially adaptive, quality-aware through
    D(q), and costs two pooling ops — no extra model evaluations.

    `beta` is a scalar, or a (q_knots, beta_knots) pair interpolated at each
    sample's quality. The round-5 real-patch measurement
    (results/r5/probe_real_rewrite.log + the q90 beta sweep) shows the
    model's rewrite magnitude is roughly quality-INDEPENDENT (~0.0067 RMS
    local) while the true codec damage shrinks with quality — so the
    rewrite's signal-to-noise falls with quality and the optimal trust
    radius tapers: beta 0.25-0.5 maximises real-patch gains at q10-q50
    but q90 only turns positive at beta~0.1 (shrinkage estimation: when
    the rewrite's SNR < 1, scaling it toward zero improves MSE). The
    calibrated schedule lives in diffusion/policy.py REAL_PHOTO_TRUST.

    `quality` is a scalar or per-sample [B] vector. Window edges: H, W are
    padded implicitly by average-pooling on the full window grid (model
    inputs are multiples of 8 everywhere in this framework)."""
    r = restored.astype(jnp.float32) - y.astype(jnp.float32)
    b, h, w_, c = r.shape
    q = jnp.broadcast_to(jnp.asarray(quality, jnp.float32).reshape(-1), (b,))
    if isinstance(beta, tuple):
        qk, bk = beta
        beta = jnp.interp(q, jnp.asarray(qk, jnp.float32),
                          jnp.asarray(bk, jnp.float32))[:, None, None]
    d = jnp.interp(q, jnp.asarray(_DAMAGE_Q, jnp.float32),
                   jnp.asarray(_DAMAGE_RMS[codec], jnp.float32))
    hw, ww = h // window, w_ // window
    local_rms = jnp.sqrt(
        (r[:, : hw * window, : ww * window, :] ** 2)
        .reshape(b, hw, window, ww, window, c)
        .mean(axis=(2, 4, 5))
        + 1e-12
    )
    w = jnp.minimum(1.0, beta * d[:, None, None] / local_rms)  # [B, hw, ww]
    # smooth upsample of the weight map (bilinear) to avoid window seams
    w_full = jax.image.resize(w, (b, h, w_), method="linear")
    return y.astype(jnp.float32) + w_full[..., None] * r


def make_consistency_fn(
    codec: str, mode: str = "surrogate"
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Returns fn(x_nhwc_f32, quality_[B]) -> codec round-trip of x."""
    if mode == "surrogate":
        def fn(x, quality):
            return codec_surrogate(x, quality, codec=codec).astype(jnp.float32)
        return fn
    if mode == "callback":
        from ddpm_image_restoration_tpu.codecs.pil_codecs import compress_batch

        def host_fn(x, quality):
            return compress_batch(np.asarray(x), codec, np.asarray(quality)).astype(
                np.float32
            )

        def fn(x, quality):
            return jax.pure_callback(
                host_fn,
                jax.ShapeDtypeStruct(x.shape, jnp.float32),
                x.astype(jnp.float32),
                quality,
            )
        return fn
    raise ValueError(f"unknown consistency mode {mode!r}")


def _ddrm_update(x_theta, c, y, nkey, i, last, t, q_vec, eta, eta_b, preset):
    """Post-consistency update — the reference's step algebra
    (webp_training.py:455-471) — shared by the lax.scan body and the
    host-loop execution shape so the two cannot drift. All conditions are
    traced (`i` is the reverse-step index as a scalar array; `last` marks
    the final solver step, whose output is the pure consistency projection
    x'). For every index set ending at 0 this is exactly the reference's
    `i == 0` final-step rule; making it positional is what allows a true
    single-evaluation restore (stride >= steps — used by distilled
    students, train/distill.py), which evaluates once at the degradation's
    own t instead of t=0."""
    x_prime = x_theta - c + y
    noise = jax.random.normal(nkey, y.shape, jnp.float32)
    noise_scale = (t * preset.sampler_noise_scale)[:, None, None, None]
    x_next = eta_b * x_prime + (1.0 - eta_b) * x_theta + eta * noise * noise_scale
    # `i`/`last` are scalars in the static-schedule paths and per-sample [B]
    # vectors in the traced-budget path (_build_budget).
    i_arr = jnp.asarray(i)
    if i_arr.ndim == 0:
        # Static schedule: the whole batch shares one step index, so the gate
        # is a batch-level decision keyed off the first sample's quality,
        # matching the reference's batch-scalar semantics (avif.py:518-520).
        apply_phase = jnp.logical_and(
            q_vec[0] < preset.phase_quality_threshold,
            jnp.logical_and(i_arr % preset.phase_period == 0, i_arr > 0),
        )
        x_next = jax.lax.cond(
            apply_phase,
            lambda v: phase_consistency(v, y, preset.phase_alpha),
            lambda v: v,
            x_next,
        )
    else:
        # Traced-budget path: every lane has its own step index and quality,
        # so gate PER SAMPLE — a file's restoration must not depend on which
        # other files share its serving batch. Padded slots (idx 0) are
        # excluded by i > 0, exactly like the static schedules' step 0.
        # phase_consistency is per-image (FFT over axes (1, 2)), so masking
        # lanes with where() is exact; the any() cond skips both FFTs on the
        # (common) steps where no lane is in the phase regime.
        q_b = jnp.broadcast_to(jnp.asarray(q_vec), (y.shape[0],))
        apply_b = jnp.logical_and(
            q_b < preset.phase_quality_threshold,
            jnp.logical_and(i_arr % preset.phase_period == 0, i_arr > 0),
        )
        x_next = jax.lax.cond(
            jnp.any(apply_b),
            lambda v: jnp.where(apply_b[:, None, None, None],
                                phase_consistency(v, y, preset.phase_alpha), v),
            lambda v: v,
            x_next,
        )
    last_b = jnp.reshape(
        jnp.broadcast_to(jnp.asarray(last), (y.shape[0],)), (-1, 1, 1, 1)
    )
    return jnp.where(last_b, x_prime, x_next)


def _solver_indices(steps: int, stride: int) -> np.ndarray:
    """Static descending step indices (webp_training.py:437); stride > 1 =
    reduced-step accelerated solver, ending at 0 — except stride >= steps,
    the single-evaluation budget, which keeps only the first index (one
    model call at the degradation's t, then the consistency projection)."""
    host_idxs = np.arange(steps - 1, -1, -stride)
    if host_idxs[-1] != 0 and stride < steps:
        host_idxs = np.append(host_idxs, 0)
    return host_idxs


def _last_flags(idxs: np.ndarray) -> np.ndarray:
    flags = np.zeros(len(idxs), bool)
    flags[-1] = True
    return flags


def _budget_schedule(init_t: jnp.ndarray, n_slots: int, s_max: int = 512):
    """Traced-quality solver schedule: the exact per-sample step indices that
    `student_stride(init_t, n_slots)` + `_solver_indices` would produce, but
    computed from a TRACED per-sample init_t — so one compiled program covers
    every quality (and mixed-quality batches) at a fixed eval budget.

    Rationale: each (steps, stride) pair is its own XLA program; a 7-quality
    eval or a quality-bucketed server compiles 7 programs, and fresh compiles
    through the TPU tunnel measured up to ~25 min EACH (results/README.md,
    round 3). At a fixed budget the schedule is data, not shape: scan length
    is `n_slots`, per-sample indices are gathered from init_t.

    Returns (idx, used, last), each [n_slots, B] (int32/bool/bool). Samples
    whose real schedule has n < n_slots steps pad with masked slots (idx 0,
    used False) AFTER their final step — padded slots still evaluate the
    model (their output is discarded), the price of the single program.

    The stride search replicates train/distill.py student_stride: the
    smallest s with ceil(init_t/s) + (0 missed) <= n_slots; no s qualifies
    only when n_slots == 1, where the fallback (stride = init_t) keeps one
    evaluation at the degradation's own t, exactly _solver_indices'
    stride >= steps rule.
    """
    s = jnp.asarray(init_t, jnp.int32)  # [B]
    n = int(n_slots)
    st_grid = jnp.arange(1, s_max + 1, dtype=jnp.int32)[:, None]        # [S,1]
    n_main_g = (s[None, :] + st_grid - 1) // st_grid                     # [S,B]
    miss_g = ((s[None, :] - 1) % st_grid) != 0
    ok = (n_main_g + miss_g) <= n
    st = jnp.where(jnp.any(ok, axis=0),
                   jnp.argmax(ok, axis=0).astype(jnp.int32) + 1, s)
    st = jnp.where(n >= s, 1, st)                                        # [B]
    n_main = (s + st - 1) // st
    miss = jnp.logical_and(((s - 1) % st) != 0, st < s)
    n_used = jnp.where(st >= s, 1, n_main + miss)
    k = jnp.arange(n, dtype=jnp.int32)[:, None]                          # [N,1]
    idx = jnp.where(k < n_main[None, :],
                    jnp.maximum(s[None, :] - 1 - k * st[None, :], 0), 0)
    used = k < n_used[None, :]
    last = k == (n_used[None, :] - 1)
    return idx, used, last


class DDRMSampler:
    """Jit-compiled DDRM-codec restoration.

    Example:
        sampler = DDRMSampler(model, preset, consistency_mode='surrogate')
        restored = sampler.sample(params, y, quality=10, steps=70, key=key)
    """

    def __init__(
        self,
        model,  # flax Module with .apply(params, x, t, level)
        preset: CodecPreset,
        consistency_mode: str = "surrogate",
        prediction: str = "direct",
        codec_id: Optional[int] = None,
    ):
        """`codec_id`: conditioning index (config.codec_index) for unified
        multi-codec checkpoints (build_model('all')). The sampler restores
        one codec per instance, so the id is a constant closed over the
        compiled solver — pair the TARGET codec's preset (constants +
        consistency codec) with its codec_id and the 'all' model."""
        self.model = model
        self.preset = preset
        self.consistency_mode = consistency_mode
        if consistency_mode != "host_loop":
            self.consistency = make_consistency_fn(preset.name, consistency_mode)
        if prediction not in ("direct", "residual"):
            raise ValueError(prediction)
        self.prediction = prediction
        self.codec_id = codec_id
        # kwargs appended to every model.apply; empty for single-codec models
        self._cond = {} if codec_id is None else {"codec_id": int(codec_id)}
        self._compiled = {}

    def _build(
        self,
        steps: int,
        stride: int = 1,
        encoder_reuse: int = 1,
        decoder_reuse_depth: int = 0,
        remat: bool = False,
    ):
        """`remat=True` wraps each solver step (or encoder-reuse group) in
        `jax.checkpoint`, so differentiating THROUGH the solver — solver
        distillation trains the student through its own unrolled run
        (train/distill.py) — keeps only the scan carry per step instead of
        every step's full UNet activations. Without it the backward holds
        O(n_steps) flash-attention buffers and full-width distillation OOMs
        HBM (round-2 postmortem: 23.9G requested vs 15.75G, two 2.25G
        f32[8,1,18,4,1024,1024] attention-backward buffers per step). Costs
        one extra forward per step on backward; inference ignores it."""
        preset = self.preset
        model = self.model
        consistency = self.consistency
        prediction = self.prediction
        cond = self._cond

        @functools.partial(jax.jit, static_argnames=())
        def run(params, y, quality, key, eta, eta_b):
            b = y.shape[0]
            y = y.astype(jnp.float32)
            q_vec = jnp.broadcast_to(jnp.asarray(quality, jnp.float32), (b,))
            idxs_host = _solver_indices(steps, stride)
            idxs = jnp.asarray(idxs_host)
            lasts = jnp.asarray(_last_flags(idxs_host))

            if encoder_reuse > 1:
                # Encoder-propagation acceleration (arXiv:2312.09608): run
                # the UNet encoder+bottleneck only every `encoder_reuse`-th
                # solver step and decode from cached features in between.
                # Implemented as a scan over GROUPS of `encoder_reuse` steps
                # (encode once per group body, decodes statically unrolled
                # inside) — static control flow only: a lax.cond on the step
                # position measured 10x slower on TPU (features forced into
                # the scan carry and copied through the conditional), while
                # this shape keeps features local to the group body.
                # decoder_reuse_depth > 0 additionally caches the deep
                # decoder stages across the group (DeepCache-style,
                # arXiv:2312.00858): only the last `depth` high-resolution
                # stages + head are recomputed on reuse steps.
                ddepth = decoder_reuse_depth

                def encode(x_t, t):
                    return model.apply(params, x_t, t, t, method="encode", **cond)

                def group_features(feats, t0):
                    """What the group caches: encode output, plus the deep
                    decoder feature when decoder reuse is on."""
                    if ddepth:
                        deep = model.apply(
                            params, feats, t0, t0, method="decode_deep", depth=ddepth,
                            **cond,
                        )
                        return (feats[0], deep)
                    return feats

                def decode(cached, t):
                    if ddepth:
                        skips, deep = cached
                        return model.apply(
                            params, deep, skips, t, t,
                            method="decode_shallow", depth=ddepth, **cond,
                        )
                    return model.apply(params, cached, t, t, method="decode", **cond)

                def model_step(x_t, cached, i, last, nkey):
                    t = jnp.full((b,), i, jnp.float32) / steps
                    x_theta = decode(cached, t).astype(jnp.float32)
                    if prediction == "residual":
                        x_theta = x_t + x_theta
                    c = consistency(x_theta, q_vec)
                    x_next = _ddrm_update(
                        x_theta, c, y, nkey, i, last, t, q_vec, eta, eta_b, preset
                    )
                    return x_next, x_theta

                idxs_np = _solver_indices(steps, stride)
                lasts_np = _last_flags(idxs_np)
                n_groups = len(idxs_np) // encoder_reuse
                main = idxs_np[: n_groups * encoder_reuse].reshape(
                    n_groups, encoder_reuse
                )
                main_last = lasts_np[: n_groups * encoder_reuse].reshape(
                    n_groups, encoder_reuse
                )
                tail = idxs_np[n_groups * encoder_reuse:]

                def group(carry, xs):
                    x_t, x_theta, key = carry
                    i_vec, last_vec = xs
                    t0 = jnp.full((b,), i_vec[0], jnp.float32) / steps
                    cached = group_features(encode(x_t, t0), t0)
                    for j in range(encoder_reuse):  # static unroll
                        key, nkey = jax.random.split(key)
                        x_t, x_theta = model_step(
                            x_t, cached, i_vec[j], last_vec[j], nkey
                        )
                    return (x_t, x_theta, key), None

                group_body = jax.checkpoint(group) if remat else group

                def tail_steps(x_t, key):
                    t0 = jnp.full((b,), int(tail[0]), jnp.float32) / steps
                    cached = group_features(encode(x_t, t0), t0)
                    x_theta = x_t
                    for p, i in enumerate(tail):
                        key, nkey = jax.random.split(key)
                        last = jnp.asarray(p == len(tail) - 1)
                        x_t, x_theta = model_step(
                            x_t, cached, jnp.asarray(int(i)), last, nkey
                        )
                    return x_t, x_theta

                x_t, x_theta = y, y
                if n_groups:
                    (x_t, x_theta, key), _ = jax.lax.scan(
                        group_body,
                        (x_t, x_theta, key),
                        (jnp.asarray(main), jnp.asarray(main_last)),
                    )
                if len(tail):  # leftover steps: one more encode, then reuse
                    fn = jax.checkpoint(tail_steps) if remat else tail_steps
                    x_t, x_theta = fn(x_t, key)
                return x_t, x_theta

            def step(carry, xs):
                x_t, _, key = carry
                i, last = xs
                key, nkey = jax.random.split(key)
                t = jnp.full((b,), i, jnp.float32) / steps

                x_theta = model.apply(params, x_t, t, t, **cond).astype(jnp.float32)
                if prediction == "residual":
                    x_theta = x_t + x_theta

                c = consistency(x_theta, q_vec)
                x_t = _ddrm_update(
                    x_theta, c, y, nkey, i, last, t, q_vec, eta, eta_b, preset
                )
                return (x_t, x_theta, key), None

            step_body = jax.checkpoint(step) if remat else step
            (x_final, x_theta_last, _), _ = jax.lax.scan(
                step_body, (y, y, key), (idxs, lasts)
            )
            return x_final, x_theta_last

        return run

    def _build_budget(
        self,
        n_slots: int,
        encoder_reuse: int = 1,
        decoder_reuse_depth: int = 0,
        remat: bool = False,
    ):
        """ONE compiled program for every quality: the fixed-budget solver
        with a TRACED per-sample init_t (see _budget_schedule). Shapes are
        static — scan length `n_slots`, indices/norms gathered from the
        traced init_t vector — so a 7-quality eval or a mixed-quality serving
        batch reuses a single XLA executable instead of compiling one program
        per (steps, stride) pair. Step algebra, key sequence, and encoder-
        reuse group boundaries are IDENTICAL to _build for every used slot
        (padded slots after a sample's final step evaluate the model and
        discard the result), so outputs match the static-schedule budgeted
        path to float-fusion tolerance (pinned in tests/test_samplers.py)."""
        if self.consistency_mode == "host_loop":
            raise ValueError("traced-budget solver requires an on-device "
                             "consistency mode")
        preset = self.preset
        model = self.model
        consistency = self.consistency
        prediction = self.prediction
        cond = self._cond

        @jax.jit
        def run(params, y, quality, init_t, key, eta, eta_b):
            b = y.shape[0]
            y = y.astype(jnp.float32)
            q_vec = jnp.broadcast_to(jnp.asarray(quality, jnp.float32), (b,))
            it_vec = jnp.broadcast_to(jnp.asarray(init_t, jnp.int32), (b,))
            idx, used, last = _budget_schedule(it_vec, n_slots)
            t_den = it_vec.astype(jnp.float32)  # t = i/init_t per sample
            #                                     (quirk 11, sample docstring)

            def model_eval(x_t, apply_fn, i_b):
                t = i_b.astype(jnp.float32) / t_den
                x_theta = apply_fn(x_t, t).astype(jnp.float32)
                if prediction == "residual":
                    x_theta = x_t + x_theta
                return t, x_theta

            def update(x_t, x_th, x_theta, t, i_b, u_b, l_b, nkey):
                c = consistency(x_theta, q_vec)
                x_next = _ddrm_update(
                    x_theta, c, y, nkey, i_b, l_b, t, q_vec, eta, eta_b, preset
                )
                u = u_b[:, None, None, None]
                return jnp.where(u, x_next, x_t), jnp.where(u, x_theta, x_th)

            if encoder_reuse > 1:
                ddepth = decoder_reuse_depth
                n_pad = -(-n_slots // encoder_reuse) * encoder_reuse
                if n_pad != n_slots:  # pad to whole groups with masked slots
                    pad = n_pad - n_slots
                    idx_p = jnp.concatenate(
                        [idx, jnp.zeros((pad, b), jnp.int32)])
                    used_p = jnp.concatenate(
                        [used, jnp.zeros((pad, b), bool)])
                    last_p = jnp.concatenate(
                        [last, jnp.zeros((pad, b), bool)])
                else:
                    idx_p, used_p, last_p = idx, used, last
                g = n_pad // encoder_reuse
                xs = tuple(a.reshape(g, encoder_reuse, b)
                           for a in (idx_p, used_p, last_p))

                def encode(x_t, t):
                    return model.apply(params, x_t, t, t, method="encode",
                                       **cond)

                def group_features(feats, t0):
                    if ddepth:
                        deep = model.apply(
                            params, feats, t0, t0, method="decode_deep",
                            depth=ddepth, **cond,
                        )
                        return (feats[0], deep)
                    return feats

                def decode(cached, t):
                    if ddepth:
                        skips, deep = cached
                        return model.apply(
                            params, deep, skips, t, t,
                            method="decode_shallow", depth=ddepth, **cond,
                        )
                    return model.apply(params, cached, t, t, method="decode",
                                       **cond)

                def group(carry, xs_g):
                    x_t, x_th, key = carry
                    i_g, u_g, l_g = xs_g  # each [encoder_reuse, B]
                    t0 = i_g[0].astype(jnp.float32) / t_den
                    cached = group_features(encode(x_t, t0), t0)
                    for j in range(encoder_reuse):  # static unroll
                        key, nkey = jax.random.split(key)
                        t, x_theta = model_eval(
                            x_t, lambda v, tt: decode(cached, tt), i_g[j]
                        )
                        x_t, x_th = update(
                            x_t, x_th, x_theta, t, i_g[j], u_g[j], l_g[j],
                            nkey,
                        )
                    return (x_t, x_th, key), None

                body = jax.checkpoint(group) if remat else group
                (x_final, x_theta_last, _), _ = jax.lax.scan(
                    body, (y, y, key), xs
                )
                return x_final, x_theta_last

            def step(carry, xs_s):
                x_t, x_th, key = carry
                i_b, u_b, l_b = xs_s  # each [B]
                key, nkey = jax.random.split(key)
                t, x_theta = model_eval(
                    x_t,
                    lambda v, tt: model.apply(params, v, tt, tt, **cond),
                    i_b,
                )
                x_t, x_th = update(x_t, x_th, x_theta, t, i_b, u_b, l_b, nkey)
                return (x_t, x_th, key), None

            body = jax.checkpoint(step) if remat else step
            (x_final, x_theta_last, _), _ = jax.lax.scan(
                body, (y, y, key), (idx, used, last)
            )
            return x_final, x_theta_last

        return run

    def _build_host_loop(
        self,
        steps: int,
        stride: int,
        encoder_reuse: int = 1,
        decoder_reuse_depth: int = 0,
    ):
        """Bit-exact-codec execution shape for platforms without host
        callbacks: one jitted model call + one jitted update per step, the
        PIL codec round-trip on the host in between (the reference's own
        loop structure, webp_training.py:437-471). Key-split order matches
        the scan exactly, so given the same PRNG key the 'callback' and
        'host_loop' modes produce identical samples."""
        from ddpm_image_restoration_tpu.codecs.pil_codecs import compress_batch

        preset = self.preset
        model = self.model
        prediction = self.prediction
        cond = self._cond

        @jax.jit
        def predict(params, x_t, t):
            x_theta = model.apply(params, x_t, t, t, **cond).astype(jnp.float32)
            if prediction == "residual":
                x_theta = x_t + x_theta
            return x_theta

        @jax.jit
        def update(x_theta, c, y, nkey, i, last, t, q_vec, eta, eta_b):
            return _ddrm_update(
                x_theta, c, y, nkey, i, last, t, q_vec, eta, eta_b, preset
            )

        ddepth = decoder_reuse_depth

        @jax.jit
        def encode(params, x_t, t):
            feats = model.apply(params, x_t, t, t, method="encode", **cond)
            if ddepth:
                deep = model.apply(
                    params, feats, t, t, method="decode_deep", depth=ddepth, **cond
                )
                return (feats[0], deep)
            return feats

        @jax.jit
        def decode(params, cached, x_t, t):
            if ddepth:
                skips, deep = cached
                x_theta = model.apply(
                    params, deep, skips, t, t, method="decode_shallow",
                    depth=ddepth, **cond,
                ).astype(jnp.float32)
            else:
                x_theta = model.apply(
                    params, cached, t, t, method="decode", **cond
                ).astype(jnp.float32)
            if prediction == "residual":
                x_theta = x_t + x_theta
            return x_theta

        def run(params, y, quality, key, eta, eta_b):
            b = y.shape[0]
            y = jnp.asarray(y, jnp.float32)
            q_vec = jnp.broadcast_to(jnp.asarray(quality, jnp.float32), (b,))
            q_host = np.broadcast_to(np.asarray(quality), (b,))
            x_t = y
            feats = None
            idxs_host = _solver_indices(steps, stride)
            for p_, i in enumerate(idxs_host):
                key, nkey = jax.random.split(key)
                t = jnp.full((b,), i, jnp.float32) / steps
                if encoder_reuse > 1:
                    if p_ % encoder_reuse == 0:
                        feats = encode(params, x_t, t)
                    x_theta = decode(params, feats, x_t, t)
                else:
                    x_theta = predict(params, x_t, t)
                c = jnp.asarray(
                    compress_batch(np.asarray(x_theta), preset.name, q_host),
                    jnp.float32,
                )
                x_t = update(
                    x_theta, c, y, nkey, jnp.asarray(i),
                    jnp.asarray(p_ == len(idxs_host) - 1), t, q_vec, eta, eta_b,
                )
            return x_t, x_theta

        return run

    def build_run(
        self,
        steps: int,
        stride: int = 1,
        encoder_reuse: int = 1,
        decoder_reuse_depth: int = 0,
        remat: bool = False,
    ):
        """The raw jitted solver fn(params, y, quality, key, eta, eta_b) for a
        static (steps, stride) — differentiable end-to-end in 'surrogate'
        mode. Used by solver distillation (train/distill.py), which trains a
        student *through* the sampler at high stride (pass remat=True there —
        see _build), and by bench.py, which scans it to amortise per-dispatch
        host latency."""
        if self.consistency_mode == "host_loop":
            raise ValueError("build_run requires an on-device consistency mode")
        run = self._build(steps, stride, encoder_reuse, decoder_reuse_depth,
                          remat=remat)

        def final_only(params, y, quality, key, eta, eta_b):
            return run(params, y, quality, key, eta, eta_b)[0]

        return final_only

    def sample(
        self,
        params,
        y: jnp.ndarray,
        quality: int,
        steps: int,
        key: Optional[jax.Array] = None,
        eta: Optional[float] = None,
        eta_b: Optional[float] = None,
        stride: int = 1,
        protect: Optional[tuple] = None,
        protect_adaptive: Optional[float] = None,
        encoder_reuse: int = 1,
        decoder_reuse_depth: int = 0,
        final_exact: Optional[bool] = None,
        traced_budget: int = 0,
    ) -> jnp.ndarray:
        """Restore compressed observation y (NHWC, [-1,1]) at codec `quality`
        (a scalar, or a per-sample [B] vector — each image restores at its own
        quality through the consistency step, noise schedule, and protection
        blend; in the static-schedule paths the phase-consistency gate keys
        off the first sample, matching the reference's batch-scalar semantics,
        while the traced-budget path gates it per sample so a lane's output
        never depends on batch composition).

        `steps` is both the scan length and the time normalizer, matching the
        reference's sample(y, q, steps=init_t) calling convention
        (webp_training.py:566). `stride` > 1 runs the reduced-step
        accelerated solver (steps/stride model evaluations). `protect`
        = (lo, hi) enables the non-reference quality-gated blend that keeps
        near-lossless inputs untouched (see `quality_gated_blend`).
        `encoder_reuse` = k > 1 runs the UNet encoder only every k-th model
        evaluation and decodes from cached features in between
        (encoder-propagation, arXiv:2312.09608). `decoder_reuse_depth` = d > 0
        additionally caches the deep decoder stages across each reuse group
        (DeepCache-style, arXiv:2312.00858): reuse steps recompute only the
        last d high-resolution decoder stages + head. Requires
        encoder_reuse > 1 (with per-step encoding there is nothing to cache).

        `final_exact` (default: auto = True in 'surrogate' mode) recomputes
        the FINAL consistency projection x' = x̂ − codec(x̂) + y with the
        bit-exact host codec — one host round-trip per restore. Rationale:
        the reference's last step (webp_training.py:469-471) uses the real
        codec, so when x̂ ≈ x0 the projection cancels — codec(x̂) ≈ y — and
        the output can never fall below the observation's quality. With the
        on-device surrogate that cancellation breaks: the output inherits the
        surrogate-vs-real mismatch, which *dominates* at high qualities where
        the real codec's own loss is tiny (measured −1.46 dB at WebP q90 in
        round 1). Running the scan's iterative refinement on the surrogate but
        the final anchor on the real codec restores the reference's
        never-worse-than-y property at the cost of ONE host codec call.

        `traced_budget` = N > 0 switches to the quality-traced fixed-budget
        solver (_build_budget): `steps` becomes a runtime input (int or
        per-sample [B] vector of init_t values), `stride` is ignored (derived
        per sample in-program), and ONE compiled executable serves every
        quality — including mixed-quality batches — at N evaluation slots.
        Used-step outputs match the static budgeted path (same schedule,
        same algebra, same keys; float-fusion tolerance across programs).
        """
        if encoder_reuse < 1:
            raise ValueError("encoder_reuse must be >= 1")
        if decoder_reuse_depth < 0:
            raise ValueError("decoder_reuse_depth must be >= 0")
        if decoder_reuse_depth and encoder_reuse == 1:
            raise ValueError(
                "decoder_reuse_depth requires encoder_reuse > 1 (the deep "
                "decoder is cached per encoder-reuse group)"
            )
        if key is None:
            key = jax.random.PRNGKey(0)
        eta = self.preset.eta if eta is None else eta
        eta_b = self.preset.eta_b if eta_b is None else eta_b
        if traced_budget:
            # Quality-traced fixed-budget solver: `steps` (init_t — an int or
            # a per-sample [B] vector) is a RUNTIME input, so one compiled
            # program serves every quality at this eval budget; `stride` is
            # derived per sample inside the program (_budget_schedule) and
            # the `stride` argument is ignored.
            sig = ("budget", int(traced_budget), encoder_reuse,
                   decoder_reuse_depth)
            if sig not in self._compiled:
                self._compiled[sig] = self._build_budget(
                    int(traced_budget), encoder_reuse, decoder_reuse_depth
                )
            out, x_theta_last = self._compiled[sig](
                params, y, quality, jnp.asarray(steps, jnp.int32), key,
                jnp.float32(eta), jnp.float32(eta_b)
            )
        else:
            sig = (steps, stride, encoder_reuse, decoder_reuse_depth)
            if sig not in self._compiled:
                if self.consistency_mode == "host_loop":
                    self._compiled[sig] = self._build_host_loop(
                        steps, stride, encoder_reuse, decoder_reuse_depth
                    )
                else:
                    self._compiled[sig] = self._build(
                        steps, stride, encoder_reuse, decoder_reuse_depth
                    )
            out, x_theta_last = self._compiled[sig](
                params, y, quality, key, jnp.float32(eta), jnp.float32(eta_b)
            )
        if final_exact is None:
            final_exact = self.consistency_mode == "surrogate"
        if final_exact and self.consistency_mode == "surrogate":
            from ddpm_image_restoration_tpu.codecs.pil_codecs import compress_batch

            q_host = np.broadcast_to(np.asarray(quality), (y.shape[0],))
            c_real = compress_batch(
                np.asarray(x_theta_last, np.float32), self.preset.name, q_host
            )
            out = (
                x_theta_last.astype(jnp.float32)
                - jnp.asarray(c_real, jnp.float32)
                + jnp.asarray(y, jnp.float32)
            )
        if protect is not None:
            lo, hi = protect
            out = quality_gated_blend(out, y, quality, float(lo), float(hi))
        if protect_adaptive is not None:
            # content-aware trust region (see residual_trust_blend): caps the
            # rewrite's local energy at beta x the calibrated codec damage
            # D(quality) — composes with `protect` (applied after it).
            pa = (protect_adaptive if isinstance(protect_adaptive, tuple)
                  else float(protect_adaptive))
            out = residual_trust_blend(
                out, y, quality, self.preset.name, beta=pa
            )
        return out
