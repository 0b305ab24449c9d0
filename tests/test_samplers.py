"""Sampler tests: DDRM step algebra on fake codecs, phase consistency
identities, Gaussian-mixture solver, SVD structure prior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_image_restoration_tpu.config import ModelConfig, get_preset
from ddpm_image_restoration_tpu.diffusion.ddrm import (
    DDRMSampler,
    make_consistency_fn,
    phase_consistency,
)
from ddpm_image_restoration_tpu.diffusion.gaussian_mixture import (
    GaussianMixtureSampler,
    svd_structure_preservation,
)
from ddpm_image_restoration_tpu.models import build_model

from tests._tiny import MINI as TINY  # noqa: E402


class _ZeroModel:
    """Stand-in model returning zeros (apply(params, x, t, level) protocol)."""

    def apply(self, params, x, t, level=None):
        return jnp.zeros_like(x)


@pytest.fixture
def y32(rng):
    return jnp.asarray(np.clip(rng.normal(0, 0.4, (2, 16, 16, 3)), -1, 1).astype("f"))


def test_phase_consistency_self_identity(y32):
    out = phase_consistency(y32, y32, alpha=0.7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y32), atol=1e-5)


def test_phase_consistency_blend(y32, rng):
    other = jnp.asarray(rng.normal(0, 0.4, y32.shape).astype("f"))
    out1 = phase_consistency(y32, other, alpha=1.0)  # alpha=1 -> unchanged
    np.testing.assert_allclose(np.asarray(out1), np.asarray(y32), atol=1e-5)


def test_ddrm_identity_codec_returns_y(y32):
    """With a perfect (identity) codec, x' = x̂ - x̂ + y = y at every step, so
    the restoration must return y exactly when eta=0 (no injected noise)."""
    preset = get_preset("webp")
    sampler = DDRMSampler(_ZeroModel(), preset)
    sampler.consistency = lambda x, q: x  # identity codec
    sampler._compiled.clear()
    out = sampler.sample(None, y32, quality=50, steps=5, eta=0.0, final_exact=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y32), atol=1e-5)


def test_ddrm_zero_codec_adds_prediction(y32):
    """With codec(x)=0 and a zero model: x' = 0 - 0 + y = y every step."""
    preset = get_preset("webp")
    sampler = DDRMSampler(_ZeroModel(), preset)
    sampler.consistency = lambda x, q: jnp.zeros_like(x)
    sampler._compiled.clear()
    out = sampler.sample(None, y32, quality=50, steps=4, eta=0.0, final_exact=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y32), atol=1e-5)


def test_ddrm_strided_solver(y32):
    """Reduced-step solver: identity-codec algebra holds at any stride, and
    the scan visits ~steps/stride indices (ends at 0)."""
    preset = get_preset("webp")
    sampler = DDRMSampler(_ZeroModel(), preset)
    sampler.consistency = lambda x, q: x
    sampler._compiled.clear()
    out = sampler.sample(None, y32, quality=50, steps=20, eta=0.0, stride=7,
                         final_exact=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y32), atol=1e-5)
    # (steps, stride, encoder_reuse, decoder_reuse_depth)
    assert (20, 7, 1, 0) in sampler._compiled


def test_quality_gated_protect(y32):
    """protect=(lo,hi): q>=hi returns y untouched, q<=lo full restoration,
    midpoint is the even blend."""
    preset = get_preset("webp")
    sampler = DDRMSampler(_ZeroModel(), preset)
    sampler.consistency = lambda x, q: jnp.zeros_like(x)  # restoration == y here
    sampler._compiled.clear()
    # make the restoration differ from y: model output 0, codec 0 -> x' = y,
    # so use eta=0 but compare against a shifted observation via eta_b
    out_hi = sampler.sample(None, y32, quality=95, steps=3, eta=0.0,
                            protect=(70, 95), final_exact=False)
    np.testing.assert_allclose(np.asarray(out_hi), np.asarray(y32), atol=1e-5)

    from ddpm_image_restoration_tpu.diffusion.ddrm import quality_gated_blend

    restored = jnp.ones_like(y32)
    full = quality_gated_blend(restored, y32, 50, 70.0, 90.0)
    np.testing.assert_allclose(np.asarray(full), np.asarray(restored), atol=1e-6)
    off = quality_gated_blend(restored, y32, 95, 70.0, 90.0)
    np.testing.assert_allclose(np.asarray(off), np.asarray(y32), atol=1e-6)
    mid = quality_gated_blend(restored, y32, 80, 70.0, 90.0)
    np.testing.assert_allclose(
        np.asarray(mid), 0.5 * np.asarray(restored) + 0.5 * np.asarray(y32), atol=1e-6
    )


def test_residual_trust_blend(y32):
    """Content-aware protection: residual energy within beta*D(q) passes
    through untouched; an oversized rewrite is shrunk toward y; the weight
    map is spatially adaptive (only the violating window shrinks); a
    per-sample quality vector broadcasts."""
    from ddpm_image_restoration_tpu.diffusion.ddrm import (
        _DAMAGE_Q,
        _DAMAGE_RMS,
        residual_trust_blend,
    )

    y = np.asarray(y32)
    d30 = float(np.interp(30.0, _DAMAGE_Q, _DAMAGE_RMS["webp"]))
    # 1. small legit restoration: rms(r) = 0.5*beta*D -> w = 1 everywhere
    r_small = np.full_like(y, 0.5 * 2.0 * d30)
    out = residual_trust_blend(jnp.asarray(y + r_small), jnp.asarray(y),
                               30.0, "webp", beta=2.0)
    np.testing.assert_allclose(np.asarray(out), y + r_small, atol=1e-5)
    # 2. oversized rewrite at q90: shrunk toward y (residual capped at
    # beta*D(90) local RMS)
    d90 = float(np.interp(90.0, _DAMAGE_Q, _DAMAGE_RMS["webp"]))
    big = np.full_like(y, 10.0 * d90)
    out = np.asarray(residual_trust_blend(jnp.asarray(y + big), jnp.asarray(y),
                                          90.0, "webp", beta=2.0))
    resid = out - y
    assert np.abs(resid).max() < np.abs(big).max() * 0.35  # strongly shrunk
    assert np.abs(resid).max() > 0  # not zeroed — a capped rewrite survives
    # 3. spatial adaptivity: violate only the top-left 8x8 window
    r_sp = np.full_like(y, 0.25 * d30)
    r_sp[:, :8, :8, :] = 10.0 * d30
    out = np.asarray(residual_trust_blend(jnp.asarray(y + r_sp), jnp.asarray(y),
                                          30.0, "webp", beta=2.0))
    resid = out - y
    # far corner untouched (bilinear weight upsample leaves it at w=1)
    np.testing.assert_allclose(resid[:, 16:, 16:, :], r_sp[:, 16:, 16:, :],
                               atol=1e-4)
    assert np.abs(resid[:, :8, :8, :]).mean() < np.abs(r_sp[:, :8, :8, :]).mean() * 0.5
    # 4. per-sample quality vector: sample 0 protected harder than sample 1
    qv = jnp.asarray([95.0, 5.0])
    big2 = np.full_like(y[:2], 0.15)
    out = np.asarray(residual_trust_blend(jnp.asarray(y[:2] + big2),
                                          jnp.asarray(y[:2]), qv, "webp",
                                          beta=2.0))
    shrink = np.abs(out - y[:2]).mean(axis=(1, 2, 3))
    assert shrink[0] < shrink[1]


def test_trust_blend_beta_schedule(y32):
    """beta as (q_knots, beta_knots): the interpolated radius tapers with
    quality, so the same oversized rewrite keeps more residual at q10 than
    at q90 (policy.REAL_PHOTO_TRUST shape)."""
    from ddpm_image_restoration_tpu.diffusion.ddrm import residual_trust_blend
    from ddpm_image_restoration_tpu.diffusion.policy import REAL_PHOTO_TRUST

    y = np.asarray(y32)[:2]
    big = np.full_like(y, 0.05)
    out = np.asarray(residual_trust_blend(
        jnp.asarray(y + big), jnp.asarray(y), jnp.asarray([10.0, 90.0]),
        "webp", beta=REAL_PHOTO_TRUST))
    kept = np.abs(out - y).mean(axis=(1, 2, 3))
    assert kept[0] > kept[1] > 0


def test_sampler_protect_adaptive_epilogue(y32):
    """sample(protect_adaptive=beta) applies the trust blend: with a
    zero-consistency zero-model sampler the restoration equals y, so the
    epilogue must be exactly identity (w=1 at zero residual)."""
    preset = get_preset("webp")
    sampler = DDRMSampler(_ZeroModel(), preset)
    sampler.consistency = lambda x, q: jnp.zeros_like(x)
    sampler._compiled.clear()
    out = sampler.sample(None, y32, quality=50, steps=3, eta=0.0,
                         protect_adaptive=2.0, final_exact=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y32), atol=1e-5)


@pytest.mark.slow
def test_ddrm_real_model_smoke(y32):
    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    sampler = DDRMSampler(model, get_preset("webp"), consistency_mode="surrogate")
    out = sampler.sample(params, y32, quality=10, steps=3, key=jax.random.PRNGKey(1))
    assert out.shape == y32.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddrm_callback_mode(y32):
    """The host-codec callback path must run under jit inside the scan."""
    sampler = DDRMSampler(_ZeroModel(), get_preset("jpeg"), consistency_mode="callback")
    out = sampler.sample(None, y32, quality=50, steps=2, eta=0.0)
    assert out.shape == y32.shape
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_ddrm_host_loop_matches_callback(y32):
    """'host_loop' (per-step jit + host codec, for platforms whose PJRT
    lacks host callbacks — the axon tunnel raises UNIMPLEMENTED) must
    reproduce the 'callback' scan bit-for-bit: same codec, same update
    algebra, same key-split order."""
    model = build_model("jpeg", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    kw = dict(quality=8, steps=7, key=jax.random.PRNGKey(3))
    ref = DDRMSampler(model, get_preset("jpeg"), consistency_mode="callback")
    alt = DDRMSampler(model, get_preset("jpeg"), consistency_mode="host_loop")
    out_cb = np.asarray(ref.sample(params, y32, **kw))
    out_hl = np.asarray(alt.sample(params, y32, **kw))
    np.testing.assert_allclose(out_hl, out_cb, atol=1e-5)
    # strided accelerated solver takes the same path
    out_cb5 = np.asarray(ref.sample(params, y32, stride=3, **kw))
    out_hl5 = np.asarray(alt.sample(params, y32, stride=3, **kw))
    np.testing.assert_allclose(out_hl5, out_cb5, atol=1e-5)
    assert not np.allclose(out_cb5, out_cb)  # stride actually changes the path


@pytest.mark.slow
def test_ddrm_residual_mode(y32):
    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    s = DDRMSampler(model, get_preset("webp"), prediction="residual")
    out = s.sample(params, y32, quality=30, steps=2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_svd_structure_full_rank_identity(y32):
    out = svd_structure_preservation(y32, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(y32), atol=1e-3)


def test_svd_structure_low_rank(y32):
    out = svd_structure_preservation(y32, jnp.float32(0.1))
    err = float(jnp.mean((out - y32) ** 2))
    assert err > 1e-5  # actually truncated
    # rank check on one plane
    plane = np.asarray(out[0, :, :, 0])
    s = np.linalg.svd(plane, compute_uv=False)
    assert (s > 1e-4 * s[0]).sum() <= 3  # k = max(1, 16*0.1) = 1 (+ slack)


def test_gaussian_mixture_sampler(y32):
    model = build_model("jpeg", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    gms = GaussianMixtureSampler(model, get_preset("jpeg"))
    out = gms.sample(params, y32, steps=4, key=jax.random.PRNGKey(0))
    assert out.shape == y32.shape
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_ddrm_encoder_reuse(y32):
    """encoder_reuse=k caches encoder features across solver steps
    (encoder-propagation): runs, stays finite, differs from the full path,
    and k=1 is exactly the base path; a reuse period covering every step but
    the first equals freezing the encoder at step 0."""
    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    sampler = DDRMSampler(model, get_preset("webp"), consistency_mode="surrogate")
    kw = dict(quality=10, steps=6, key=jax.random.PRNGKey(1))
    base = np.asarray(sampler.sample(params, y32, **kw))
    same = np.asarray(sampler.sample(params, y32, encoder_reuse=1, **kw))
    np.testing.assert_array_equal(same, base)
    r2 = np.asarray(sampler.sample(params, y32, encoder_reuse=2, **kw))
    assert r2.shape == y32.shape and np.all(np.isfinite(r2))
    assert not np.allclose(r2, base)  # approximation changes the trajectory
    with pytest.raises(ValueError):
        sampler.sample(params, y32, encoder_reuse=0, **kw)


@pytest.mark.slow
def test_ddrm_encoder_reuse_host_loop_matches_callback(y32):
    """The host-loop execution shape must reproduce the scan exactly under
    encoder reuse as well (same codec, same key-split order, same caching
    positions)."""
    model = build_model("jpeg", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    kw = dict(quality=8, steps=6, key=jax.random.PRNGKey(3), encoder_reuse=3)
    ref = DDRMSampler(model, get_preset("jpeg"), consistency_mode="callback")
    alt = DDRMSampler(model, get_preset("jpeg"), consistency_mode="host_loop")
    out_cb = np.asarray(ref.sample(params, y32, **kw))
    out_hl = np.asarray(alt.sample(params, y32, **kw))
    np.testing.assert_allclose(out_hl, out_cb, atol=1e-5)


@pytest.mark.slow
def test_ddrm_decoder_reuse_depth(y32):
    """decoder_reuse_depth=d caches the deep decoder stages across each
    encoder-reuse group (DeepCache-style): runs, stays finite, differs from
    the encoder-reuse-only trajectory, and is invalid without encoder reuse."""
    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    sampler = DDRMSampler(model, get_preset("webp"), consistency_mode="surrogate")
    kw = dict(quality=10, steps=6, key=jax.random.PRNGKey(1), encoder_reuse=2)
    base = np.asarray(sampler.sample(params, y32, **kw))
    d1 = np.asarray(sampler.sample(params, y32, decoder_reuse_depth=1, **kw))
    assert d1.shape == y32.shape and np.all(np.isfinite(d1))
    assert not np.allclose(d1, base)  # approximation changes the trajectory
    with pytest.raises(ValueError):
        sampler.sample(
            params, y32, quality=10, steps=6, encoder_reuse=1, decoder_reuse_depth=1
        )
    with pytest.raises(ValueError):
        sampler.sample(
            params, y32, quality=10, steps=6, encoder_reuse=2, decoder_reuse_depth=-1
        )


@pytest.mark.slow
def test_ddrm_decoder_reuse_host_loop_matches_callback(y32):
    """host_loop must reproduce the scan under decoder reuse too (same
    caching positions, same key-split order)."""
    model = build_model("jpeg", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    kw = dict(
        quality=8, steps=6, key=jax.random.PRNGKey(3),
        encoder_reuse=3, decoder_reuse_depth=1,
    )
    ref = DDRMSampler(model, get_preset("jpeg"), consistency_mode="callback")
    alt = DDRMSampler(model, get_preset("jpeg"), consistency_mode="host_loop")
    out_cb = np.asarray(ref.sample(params, y32, **kw))
    out_hl = np.asarray(alt.sample(params, y32, **kw))
    np.testing.assert_allclose(out_hl, out_cb, atol=1e-5)


def test_unet_decode_deep_shallow_split(y32):
    """decode_shallow(decode_deep(...)) at any depth must equal the full
    decode bit-for-bit when both run at the same t — the split is a pure
    refactoring of the stage loop."""
    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    t = jnp.array([0.3, 0.8])
    feats = model.apply(params, y32, t, t, method="encode")
    full = model.apply(params, feats, t, t, method="decode")
    for depth in (0, 1, 2):
        deep = model.apply(params, feats, t, t, method="decode_deep", depth=depth)
        out = model.apply(
            params, deep, feats[0], t, t, method="decode_shallow", depth=depth
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(full))


def test_unet_encode_decode_split(y32):
    """decode(encode(x)) must equal the single-pass forward bit-for-bit —
    the split exists so the solver can cache encoder features."""
    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    t = jnp.array([0.3, 0.8])
    full = model.apply(params, y32, t, t)
    feats = model.apply(params, y32, t, t, method="encode")
    split = model.apply(params, feats, t, t, method="decode")
    np.testing.assert_array_equal(np.asarray(split), np.asarray(full))


# --- dihedral test-time self-ensemble (diffusion/ensemble.py) ---


def test_dihedral_roundtrip_and_group(rng):
    from ddpm_image_restoration_tpu.diffusion.ensemble import (
        dihedral,
        dihedral_inverse,
    )

    x_sq = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype("f"))
    for k in range(8):
        back = dihedral_inverse(dihedral(x_sq, k), k)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x_sq), err_msg=str(k))
    # the 8 elements are distinct on a generic square image
    imgs = [np.asarray(dihedral(x_sq, k)) for k in range(8)]
    for a in range(8):
        for b in range(a + 1, 8):
            assert not np.allclose(imgs[a], imgs[b]), (a, b)
    # non-square: flips fine, transpositions rejected
    x_rect = jnp.asarray(rng.normal(size=(1, 4, 8, 3)).astype("f"))
    for k in range(4):
        back = dihedral_inverse(dihedral(x_rect, k), k)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x_rect))
    with pytest.raises(ValueError):
        dihedral(x_rect, 4)


def test_sample_ensemble_identity_codec(y32):
    """Ensembling a sampler that returns y for every variant must return y
    (each variant's restoration inverts back to y; the mean is y)."""
    from ddpm_image_restoration_tpu.diffusion.ensemble import sample_ensemble

    preset = get_preset("webp")
    sampler = DDRMSampler(_ZeroModel(), preset)
    sampler.consistency = lambda x, q: x  # identity codec
    sampler._compiled.clear()
    for n in (1, 2, 4):
        out = sample_ensemble(sampler, None, y32, 50, 5, n_transforms=n, eta=0.0,
                              final_exact=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(y32), atol=1e-5)
    with pytest.raises(ValueError):
        sample_ensemble(sampler, None, y32, 50, 5, n_transforms=3)


def test_sample_ensemble_averages_variants(y32):
    """A model whose prediction is orientation-sensitive: the ensemble output
    must equal the hand-computed mean over inverted variants."""
    from ddpm_image_restoration_tpu.diffusion.ensemble import (
        dihedral,
        dihedral_inverse,
        sample_ensemble,
    )

    class _RampModel:
        def apply(self, params, x, t, level=None):
            h = x.shape[1]
            ramp = jnp.linspace(-0.1, 0.1, h)[None, :, None, None]
            return jnp.broadcast_to(ramp, x.shape)

    preset = get_preset("webp")
    sampler = DDRMSampler(_RampModel(), preset)
    sampler.consistency = lambda x, q: jnp.zeros_like(x)  # codec(x)=0
    sampler._compiled.clear()

    want = []
    for k in range(4):
        out_k = sampler.sample(None, dihedral(y32, k), 50, 3, eta=0.0,
                               final_exact=False)
        want.append(np.asarray(dihedral_inverse(out_k, k)))
    got = sample_ensemble(sampler, None, y32, 50, 3, n_transforms=4, eta=0.0,
                          final_exact=False)
    np.testing.assert_allclose(np.asarray(got), np.mean(want, axis=0), atol=1e-5)
    # and it differs from the single-orientation restore (sanity: TTA does something)
    single = np.asarray(sampler.sample(None, y32, 50, 3, eta=0.0,
                                       final_exact=False))
    assert not np.allclose(np.asarray(got), single)


@pytest.mark.slow
def test_ddrm_unified_codec_id(y32):
    """A unified ('all') model restores through per-codec samplers: the
    conditioning id is closed over the compiled solver, and different ids
    give different restorations (plain + encoder-reuse paths)."""
    model = build_model("all", TINY)
    params = model.init(
        jax.random.PRNGKey(0), y32, jnp.zeros(2), codec_id=0
    )
    outs = []
    for codec, cid in [("jpeg", 0), ("webp", 1)]:
        s = DDRMSampler(
            model, get_preset(codec), consistency_mode="surrogate", codec_id=cid
        )
        out = s.sample(params, y32, quality=10, steps=4, key=jax.random.PRNGKey(1))
        assert np.all(np.isfinite(np.asarray(out)))
        outs.append(np.asarray(out))
        # encoder-reuse (an approximation: stale features between encodes)
        # must run conditioned too
        out_er = s.sample(
            params, y32, quality=10, steps=4, key=jax.random.PRNGKey(1),
            encoder_reuse=2,
        )
        assert out_er.shape == out.shape
        assert np.all(np.isfinite(np.asarray(out_er)))
    assert np.abs(outs[0] - outs[1]).max() > 1e-6


# --- exact final projection + per-sample quality (round 2) ---


@pytest.mark.slow
def test_final_exact_projection(y32):
    """final_exact recomputes the LAST consistency projection with the
    bit-exact host codec: sample(final_exact=True) must equal
    x̂_last − codec(x̂_last) + y where x̂_last comes from the compiled run,
    and final_exact=False must equal the compiled run's own output."""
    from ddpm_image_restoration_tpu.codecs.pil_codecs import compress_batch

    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    sampler = DDRMSampler(model, get_preset("webp"), consistency_mode="surrogate")
    kw = dict(quality=30, steps=4, key=jax.random.PRNGKey(7))

    raw = np.asarray(sampler.sample(params, y32, final_exact=False, **kw))
    exact = np.asarray(sampler.sample(params, y32, final_exact=True, **kw))

    run = sampler._compiled[(4, 1, 1, 0)]
    x_final, x_theta = run(
        params, y32, 30, jax.random.PRNGKey(7),
        jnp.float32(sampler.preset.eta), jnp.float32(sampler.preset.eta_b),
    )
    np.testing.assert_allclose(raw, np.asarray(x_final), atol=1e-6)
    c_real = compress_batch(np.asarray(x_theta, np.float32), "webp",
                            np.full(2, 30))
    want = np.asarray(x_theta, np.float32) - c_real + np.asarray(y32, np.float32)
    np.testing.assert_allclose(exact, want, atol=1e-5)
    assert not np.allclose(exact, raw)  # the real codec actually differs

    # encoder-reuse path threads x̂_last through its group scan too
    exact_er = np.asarray(
        sampler.sample(params, y32, final_exact=True, encoder_reuse=2, **kw)
    )
    assert exact_er.shape == y32.shape and np.all(np.isfinite(exact_er))


@pytest.mark.slow
def test_per_sample_quality_vector(y32):
    """sample() with a [B] quality vector restores each image at its own
    quality: each element must match the scalar-quality run of the same
    batch (qualities chosen so the batch-scalar phase gate agrees)."""
    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    sampler = DDRMSampler(model, get_preset("webp"), consistency_mode="surrogate")
    kw = dict(steps=4, key=jax.random.PRNGKey(5))

    q_vec = jnp.asarray([50.0, 30.0])
    out_vec = np.asarray(sampler.sample(params, y32, q_vec, **kw))
    out_50 = np.asarray(sampler.sample(params, y32, 50, **kw))
    out_30 = np.asarray(sampler.sample(params, y32, 30, **kw))
    np.testing.assert_allclose(out_vec[0], out_50[0], atol=1e-5)
    np.testing.assert_allclose(out_vec[1], out_30[1], atol=1e-5)
    assert not np.allclose(out_vec[1], out_50[1])  # quality actually differs

    # per-sample protection blend
    from ddpm_image_restoration_tpu.diffusion.ddrm import quality_gated_blend

    restored = jnp.ones_like(y32)
    blended = quality_gated_blend(restored, y32, jnp.asarray([50.0, 95.0]),
                                  70.0, 90.0)
    np.testing.assert_allclose(np.asarray(blended[0]), np.asarray(restored[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(blended[1]), np.asarray(y32[1]),
                               atol=1e-6)


def test_build_run_remat_matches_plain():
    """remat=True must change memory behaviour only — same values, same
    gradients (the distillation path differentiates through build_run;
    round-2 full-width distill OOM'd without remat, diffusion/ddrm.py)."""
    import jax
    import jax.numpy as jnp
    from ddpm_image_restoration_tpu.config import get_preset
    from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler
    from ddpm_image_restoration_tpu.models import build_model
    from tests._tiny import MINI

    model = build_model("webp", MINI)
    x = jnp.zeros((2, MINI.image_size, MINI.image_size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(2))
    preset = get_preset("webp")
    sampler = DDRMSampler(model, preset, consistency_mode="surrogate")
    y = jax.random.uniform(jax.random.PRNGKey(1), x.shape, minval=-1, maxval=1)
    key = jax.random.PRNGKey(2)
    eta, eta_b = jnp.float32(preset.eta), jnp.float32(preset.eta_b)

    for enc_reuse in (1, 2):
        plain = sampler.build_run(6, 2, encoder_reuse=enc_reuse)
        remat = sampler.build_run(6, 2, encoder_reuse=enc_reuse, remat=True)

        def loss(run, p):
            return jnp.mean(run(p, y, 30, key, eta, eta_b) ** 2)

        from jax.flatten_util import ravel_pytree

        v0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(params)
        v1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(params)
        assert jnp.allclose(v0, v1, rtol=1e-5), (enc_reuse, v0, v1)
        flat0 = ravel_pytree(g0)[0]
        flat1 = ravel_pytree(g1)[0]
        assert jnp.allclose(flat0, flat1, rtol=1e-4, atol=1e-6), enc_reuse


def test_production_solver_policy():
    """The round-3 production policy must (a) keep the validated 14-eval
    budget at every quality, (b) be DETERMINISTIC (eta 0 — the round-3
    controlled experiment results/r3/ex_me14_eta0 showed the reference's
    per-step noise injection is what loses quality in the few-step regime;
    eta 0 at the same compute beats stride-1 reference mode at every
    measured quality), and (c) keep encoder reuse 2 everywhere (validated
    at the eta-0 operating point; diffusion/policy.py findings 1-2)."""
    from ddpm_image_restoration_tpu.codecs.quality import (
        init_timestep_for_quality,
    )
    from ddpm_image_restoration_tpu.config import get_preset
    from ddpm_image_restoration_tpu.diffusion.ddrm import _solver_indices
    from ddpm_image_restoration_tpu.diffusion.policy import (
        production_solver_config,
    )
    from ddpm_image_restoration_tpu.train.distill import student_stride

    preset = get_preset("webp")
    strides = {}
    for q in (0, 10, 30, 50, 70, 90):
        pc = production_solver_config(q)
        init_t = init_timestep_for_quality(q, 100, preset)
        stride = student_stride(init_t, pc["max_evals"])
        strides[q] = stride
        n_evals = len(_solver_indices(init_t, stride))
        assert n_evals <= pc["max_evals"], (q, n_evals)
        assert pc["encoder_reuse"] == 2, q
        assert pc["eta"] == 0.0, q
    # the budgeted stride is quality-adaptive through init_t: coarse where
    # degradation is heavy, near-reference-exact where it is light
    assert strides[0] > strides[90], strides
    assert strides[90] == 2  # init_t 20 -> 10 evals (within the 14 budget)
    assert student_stride(14, production_solver_config(95)["max_evals"]) == 1


def test_budget_schedule_matches_static():
    """_budget_schedule (traced) must reproduce student_stride +
    _solver_indices + _last_flags exactly for every (init_t, budget):
    same used indices in order, last flag on the final used slot, padded
    slots unused — the contract that makes the traced-budget solver a
    drop-in for the per-quality-compiled one."""
    from ddpm_image_restoration_tpu.diffusion.ddrm import (
        _budget_schedule,
        _last_flags,
        _solver_indices,
    )
    from ddpm_image_restoration_tpu.train.distill import student_stride

    cases = [(s, n) for n in (1, 2, 4, 13, 14, 28)
             for s in (2, 3, 5, 10, 13, 15, 20, 37, 70, 75, 100)]
    init_ts = jnp.asarray([s for s, _ in cases if _ == 14] or [70])
    # vectorised check at N=14 across a mixed batch in ONE call
    idx_b, used_b, last_b = _budget_schedule(init_ts, 14)
    for col, s in enumerate(np.asarray(init_ts)):
        ref = _solver_indices(int(s), student_stride(int(s), 14))
        n = int(np.asarray(used_b)[:, col].sum())
        assert n == len(ref), (s, n, len(ref))
        np.testing.assert_array_equal(np.asarray(idx_b)[:n, col], ref)
        assert np.asarray(last_b)[n - 1, col] and not np.asarray(last_b)[:n - 1, col].any()
    # scalar-batch sweep over every (s, n) pair
    for s, n in cases:
        ref = _solver_indices(s, student_stride(s, n))
        idx, used, last = _budget_schedule(jnp.asarray([s]), n)
        idx, used, last = (np.asarray(a)[:, 0] for a in (idx, used, last))
        m = int(used.sum())
        assert m == len(ref), (s, n, m, len(ref))
        np.testing.assert_array_equal(idx[:m], ref)
        np.testing.assert_array_equal(_last_flags(ref), last[:m])
        assert not used[m:].any() and not last[m:].any()


def test_traced_budget_matches_static_budget(y32):
    """sample(traced_budget=N) must reproduce the static budgeted solver
    sample(stride=student_stride(init_t, N)) — same model, same keys — for
    used steps, at encoder_reuse 1 AND 2 (the production config shape).
    eta=0 so per-slot noise keys cannot differ on padded slots. Tolerance:
    the two are DIFFERENT XLA programs (the traced one carries masked
    where()s), so fusion may reorder float ops — measured max |diff| 4e-6
    on the tiny model; identical step algebra is pinned exactly by
    test_budget_schedule_matches_static and the fake-model path."""
    from ddpm_image_restoration_tpu.train.distill import student_stride

    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    sampler = DDRMSampler(model, get_preset("webp"), consistency_mode="surrogate")
    for enc in (1, 2):
        for q, init_t in ((10, 9), (50, 6)):
            kw = dict(quality=q, key=jax.random.PRNGKey(1), eta=0.0,
                      encoder_reuse=enc, final_exact=False)
            static = np.asarray(sampler.sample(
                params, y32, steps=init_t,
                stride=student_stride(init_t, 4), **kw))
            traced = np.asarray(sampler.sample(
                params, y32, steps=init_t, traced_budget=4, **kw))
            np.testing.assert_allclose(traced, static, atol=1e-4,
                                       err_msg=f"enc={enc} q={q}")


@pytest.mark.parametrize("q_pair,it_pair", [
    ((30.0, 80.0), (9, 3)),   # both above the phase threshold
    ((10.0, 80.0), (9, 3)),   # lane 0 INSIDE the phase regime (webp: q < 20)
])
def test_traced_budget_mixed_quality_batch(y32, q_pair, it_pair):
    """One traced-budget program restores a MIXED-quality batch: each lane
    must equal the same lane restored in a single-quality batch at its own
    quality (eta=0 makes lanes independent of batch composition). The
    phase-consistency gate is PER SAMPLE in the traced path — each lane keys
    off its own step index and quality — so independence holds even when one
    lane is inside the phase regime and the other is not, and a file served
    via serve --traced restores identically regardless of which other files
    share its batch."""
    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    sampler = DDRMSampler(model, get_preset("webp"), consistency_mode="surrogate")
    q_vec = jnp.asarray(q_pair)
    it_vec = jnp.asarray(it_pair)
    kw = dict(key=jax.random.PRNGKey(2), eta=0.0, final_exact=False,
              traced_budget=4)
    mixed = np.asarray(sampler.sample(params, y32, quality=q_vec,
                                      steps=it_vec, **kw))
    for lane in range(2):
        solo = np.asarray(sampler.sample(
            params, y32,
            quality=jnp.full((2,), q_vec[lane]),
            steps=jnp.full((2,), it_vec[lane], jnp.int32), **kw))
        np.testing.assert_allclose(mixed[lane], solo[lane], atol=1e-4,
                                   err_msg=f"lane={lane}")


def test_traced_budget_one_program_many_qualities(y32):
    """The point of the traced path: restoring at several qualities must
    reuse ONE cached executable (the static path caches one per quality)."""
    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), y32, jnp.zeros(2))
    sampler = DDRMSampler(model, get_preset("webp"), consistency_mode="surrogate")
    for q, it in ((5, 10), (30, 7), (80, 3)):
        out = sampler.sample(params, y32, quality=q, steps=it,
                             traced_budget=4, eta=0.0, final_exact=False)
        assert np.all(np.isfinite(np.asarray(out)))
    budget_sigs = [s for s in sampler._compiled if s[0] == "budget"]
    assert budget_sigs == [("budget", 4, 1, 0)]
    with pytest.raises(ValueError):
        DDRMSampler(_ZeroModel(), get_preset("webp"),
                    consistency_mode="host_loop").sample(
            None, y32, quality=10, steps=5, traced_budget=4)


def test_production_policy_codec_protection():
    """AVIF's near-lossless tier gets the protection ramp (every measured
    accelerated config loses PSNR at avif q90: r1 -1.45, r2 -1.17, r4
    unified -1.10 — compressed is already ~45 dB); other codecs don't,
    and callers that don't pass a codec keep the old behaviour."""
    from ddpm_image_restoration_tpu.diffusion.ddrm import quality_gated_blend
    from ddpm_image_restoration_tpu.diffusion.policy import (
        production_solver_config,
    )

    assert "protect" not in production_solver_config(90)
    assert "protect" not in production_solver_config(90, "webp")
    assert "protect" not in production_solver_config(90, "jpeg")
    lo, hi = production_solver_config(90, "avif")["protect"]
    assert lo >= 50 and hi <= 100
    # the ramp keeps the strongly-positive q<=50 regime fully restored and
    # turns q>=hi into a no-op
    y = jnp.zeros((1, 8, 8, 3))
    restored = jnp.ones((1, 8, 8, 3))
    np.testing.assert_allclose(
        quality_gated_blend(restored, y, 50.0, lo, hi), restored)
    np.testing.assert_allclose(
        quality_gated_blend(restored, y, hi, lo, hi), y)
