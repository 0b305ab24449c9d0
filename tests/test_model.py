"""Model tests: shape/range contracts, codec variants, param structure,
time-embedding distinguishability, level conditioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_image_restoration_tpu.config import ModelConfig
from ddpm_image_restoration_tpu.models import TimeEmbedding, build_model

from tests._tiny import TINY5 as TINY  # noqa: E402


@pytest.fixture
def small_images(rng):
    """[2,32,32,3] in [-1,1] — 5 pool stages need >=32px (bottleneck at 1x1)."""
    import numpy as np

    x = rng.normal(0, 0.4, size=(2, 32, 32, 3)).astype("float32")
    return np.clip(x, -1, 1)


_CACHE = {}


def _get(codec):
    """Init each codec variant once per test session (compiles are expensive)."""
    if codec not in _CACHE:
        model = build_model(codec, TINY)
        x0 = jnp.zeros((2, 32, 32, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros(2))
        _CACHE[codec] = (model, params)
    return _CACHE[codec]


def _init_and_run(codec, x, **kw):
    model, params = _get(codec)
    out = model.apply(params, x, jnp.full((x.shape[0],), 0.5), **kw)
    return model, params, out


@pytest.mark.parametrize("codec", ["webp", "jpeg", "avif"])
@pytest.mark.slow
def test_forward_shape_and_range(codec, small_images):
    x = jnp.asarray(small_images)
    _, params, out = _init_and_run(codec, x)
    assert out.shape == x.shape
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh head
    assert out.dtype == jnp.float32


def test_param_structure_webp(small_images):
    x = jnp.asarray(small_images)
    model, params, _ = _init_and_run("webp", x)
    top = set(params["params"].keys())
    # 5 encoder + 3 bottleneck + 5 decoder blocks + embed + head
    expected = (
        {f"down{i}" for i in range(1, 6)}
        | {f"bottleneck{i}" for i in range(1, 4)}
        | {f"up{i}" for i in range(1, 6)}
        | {"time_embed", "out_norm", "out_conv"}
    )
    assert top == expected
    # WebP blocks use the fixed-DCT freq module (no learnable transform)
    down1 = params["params"]["down1"]["freq_guide"]
    assert "adaptive_transform" not in down1
    assert "low_attn_in" in down1


def test_param_structure_avif(small_images):
    x = jnp.asarray(small_images)
    _, params, _ = _init_and_run("avif", x)
    fg = params["params"]["down1"]["freq_guide"]
    assert "adaptive_transform" in fg
    tw = fg["adaptive_transform"]["transform_weights"]
    assert tw.shape == (8, 8, 8)  # (channels=8, block=8, block=8)


def test_compression_level_conditioning(small_images):
    """Different compression levels must change the output (the boost path)."""
    x = jnp.asarray(small_images)
    model, params, _ = _init_and_run("webp", x)
    t = jnp.full((x.shape[0],), 0.5)
    out_lo = model.apply(params, x, t, jnp.zeros(x.shape[0]))
    out_hi = model.apply(params, x, t, jnp.ones(x.shape[0]))
    assert float(jnp.mean(jnp.abs(out_lo - out_hi))) > 1e-6


def test_level_defaults_to_t(small_images):
    """compression_level=None must behave as level=t (webp_training.py:373-374)."""
    x = jnp.asarray(small_images)
    model, params, _ = _init_and_run("webp", x)
    t = jnp.full((x.shape[0],), 0.3)
    np.testing.assert_allclose(
        np.asarray(model.apply(params, x, t)),
        np.asarray(model.apply(params, x, t, t)),
        atol=1e-6,
    )


def test_time_embedding_distinguishes_timesteps():
    emb = TimeEmbedding(64)
    params = emb.init(jax.random.PRNGKey(0), jnp.zeros(2))
    e1 = emb.apply(params, jnp.array([0.1, 0.9]))
    assert e1.shape == (2, 64)
    assert float(jnp.abs(e1[0] - e1[1]).mean()) > 1e-3


def test_dropout_stochastic_in_train_mode(small_images):
    x = jnp.asarray(small_images)
    model = build_model("webp", TINY)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(x.shape[0]))
    t = jnp.full((x.shape[0],), 0.5)
    o1 = model.apply(
        params, x, t, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    o2 = model.apply(
        params, x, t, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert float(jnp.abs(o1 - o2).mean()) > 1e-7


@pytest.mark.slow
def test_bf16_compute_dtype(small_images):
    cfg = TINY.__class__(**{**TINY.__dict__, "compute_dtype": "bfloat16"})
    x = jnp.asarray(small_images)
    model = build_model("webp", cfg)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(x.shape[0]))
    out = model.apply(params, x, jnp.full((x.shape[0],), 0.5))
    assert out.dtype == jnp.float32  # head forces fp32
    assert np.all(np.isfinite(np.asarray(out)))
    # params stored fp32
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32


@pytest.mark.slow
def test_remat_identical_outputs_and_grads(small_images):
    """cfg.remat must change memory behaviour only: same param tree, same
    forward outputs, same gradients."""
    import dataclasses

    x = small_images
    t = jnp.full((x.shape[0],), 0.4)
    outs, grads = [], []
    for remat in (False, True):
        cfg = dataclasses.replace(TINY, remat=remat)
        model = build_model("webp", cfg)
        params = model.init(jax.random.PRNGKey(0), x, t)
        outs.append(model.apply(params, x, t, t))

        def loss(p):
            return jnp.mean(model.apply(p, x, t, t) ** 2)

        grads.append(jax.grad(loss)(params))
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]), atol=1e-6)
    a, b = jax.tree_util.tree_leaves(grads[0]), jax.tree_util.tree_leaves(grads[1])
    assert len(a) == len(b)
    for ga, gb in zip(a, b):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


@pytest.mark.slow
def test_codec_conditioning_unified_model(small_images):
    """build_model('all') auto-enables codec conditioning: the param tree
    gains a codec_embed table, codec_id is REQUIRED, and different codec ids
    produce different outputs (the whole point of the unified model)."""
    import dataclasses

    x = jnp.asarray(small_images)
    t = jnp.full((x.shape[0],), 0.5)
    model = build_model("all", TINY)
    assert model.cfg.codec_conditioning
    cid = jnp.zeros((x.shape[0],), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, codec_id=cid)
    assert "codec_embed" in params["params"]
    with pytest.raises(ValueError, match="codec_id"):
        model.apply(params, x, t)
    outs = [
        model.apply(params, x, t, codec_id=jnp.full((x.shape[0],), i, jnp.int32))
        for i in range(3)
    ]
    for o in outs:
        assert o.shape == x.shape
    assert float(jnp.abs(outs[0] - outs[1]).mean()) > 1e-7
    assert float(jnp.abs(outs[1] - outs[2]).mean()) > 1e-7
    # scalar codec_id broadcasts to the batch
    o_scalar = model.apply(params, x, t, codec_id=1)
    np.testing.assert_allclose(
        np.asarray(o_scalar), np.asarray(outs[1]), atol=1e-6
    )
    # single-codec models are unchanged: no codec_embed in their tree
    plain = build_model("webp", TINY)
    p2 = plain.init(jax.random.PRNGKey(0), x, t)
    assert "codec_embed" not in p2["params"]
    assert not dataclasses.asdict(plain.cfg)["codec_conditioning"]


@pytest.mark.slow
def test_codec_conditioning_encode_decode_split(small_images):
    """encode/decode with codec_id must equal __call__ with codec_id (the
    solver's encoder-reuse path needs the conditioned split too)."""
    x = jnp.asarray(small_images)
    t = jnp.full((x.shape[0],), 0.5)
    model = build_model("all", TINY)
    cid = jnp.ones((x.shape[0],), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, codec_id=cid)
    full = model.apply(params, x, t, codec_id=cid)
    feats = model.apply(params, x, t, codec_id=cid, method="encode")
    split = model.apply(params, feats, t, codec_id=cid, method="decode")
    np.testing.assert_allclose(np.asarray(full), np.asarray(split), atol=1e-6)
