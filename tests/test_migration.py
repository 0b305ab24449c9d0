"""Checkpoint-layout migration: pre-fusion freq-gate checkpoints must load
into the fused-gate model with bit-identical math.

The fused DCTFreqAwareBlock (models/freq_blocks.py) computes the reference's
four 1x1 gate convs (webp_training.py:255-261) as two stacked batched
matmuls. These tests pin (a) the fusion algebra — slicing the fused params
and running the old two-conv formulation reproduces the module output — and
(b) migrate_state_dict turning an old-layout tree into the fused layout.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ddpm_image_restoration_tpu.models.freq_blocks import DCTFreqAwareBlock
from ddpm_image_restoration_tpu.ops.dct import low_freq_mask, spatial_block_dct
from ddpm_image_restoration_tpu.train.checkpoint import (
    downgrade_state_dict,
    migrate_state_dict,
)


def _old_gate(h, kernel, bias, kernel2, bias2):
    """The pre-fusion formulation: 1x1 conv -> leaky_relu -> 1x1 conv -> sigmoid."""
    g = jnp.einsum("bhwc,cm->bhwm", h, kernel) + bias
    g = nn.leaky_relu(g, 0.2)
    g = jnp.einsum("bhwm,mc->bhwc", g, kernel2) + bias2
    return nn.sigmoid(g)


def test_fused_gates_match_unfused_formulation(rng):
    c, bs, low = 8, 4, 3
    block = DCTFreqAwareBlock(c, bs, low, (0.15, 1.9))
    x = jnp.asarray(rng.normal(0, 0.5, (2, 16, 16, c)).astype("float32"))
    lvl = jnp.array([0.2, 0.7])
    params = block.init(jax.random.PRNGKey(0), x, lvl)
    p = params["params"]

    # recompute with the OLD formulation from slices of the fused params
    x_dct = spatial_block_dct(x, bs)
    mask = low_freq_mask(16, 16, bs, low).astype(x.dtype)
    lo_in, hi_in = x_dct * mask, x_dct * (1.0 - mask)
    low_attn = _old_gate(
        lo_in,
        p["gates_in_kernel"][0], p["gates_in_bias"][0],
        p["gates_out_kernel"][0], p["gates_out_bias"][0],
    )
    high_attn = _old_gate(
        hi_in,
        p["gates_in_kernel"][1], p["gates_in_bias"][1],
        p["gates_out_kernel"][1], p["gates_out_bias"][1],
    )
    high_attn = high_attn * jnp.clip(1.0 - lvl.reshape(-1, 1, 1, 1), 0.15, 1.9)
    combined = low_attn * lo_in + high_attn * hi_in
    ck = p["conv_out"]["kernel"]
    expected = (
        jax.lax.conv_general_dilated(
            x + combined, ck, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["conv_out"]["bias"]
    )

    got = block.apply(params, x, lvl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def _old_layout_tree(p, rng):
    """Build an old-layout freq_guide subtree carrying the same weights as the
    fused params `p` (inverse of the migration)."""
    def conv(kernel2d, bias):
        return {"kernel": np.asarray(kernel2d)[None, None], "bias": np.asarray(bias)}

    return {
        "low_attn_in": conv(p["gates_in_kernel"][0], p["gates_in_bias"][0]),
        "high_attn_in": conv(p["gates_in_kernel"][1], p["gates_in_bias"][1]),
        "low_attn_out": conv(p["gates_out_kernel"][0], p["gates_out_bias"][0]),
        "high_attn_out": conv(p["gates_out_kernel"][1], p["gates_out_bias"][1]),
        "conv_out": {
            "kernel": np.asarray(p["conv_out"]["kernel"]),
            "bias": np.asarray(p["conv_out"]["bias"]),
        },
    }


def test_migrate_state_dict_roundtrip(rng):
    c, bs, low = 8, 4, 3
    block = DCTFreqAwareBlock(c, bs, low, (0.15, 1.9))
    x = jnp.asarray(rng.normal(0, 0.5, (1, 8, 8, c)).astype("float32"))
    params = block.init(jax.random.PRNGKey(1), x, jnp.array([0.5]))
    p = params["params"]

    old = {"params": {"freq_guide": _old_layout_tree(p, rng)}}
    migrated = migrate_state_dict(old)
    fg = migrated["params"]["freq_guide"]
    for key in ("gates_in_kernel", "gates_in_bias", "gates_out_kernel", "gates_out_bias"):
        np.testing.assert_array_equal(fg[key], np.asarray(p[key]))
    assert "low_attn_in" not in fg

    # nested copies (as in optimizer mu/nu trees) migrate too
    nested = {"mu": old, "nu": old, "count": np.zeros(())}
    m2 = migrate_state_dict(nested)
    assert "gates_in_kernel" in m2["mu"]["params"]["freq_guide"]
    assert "gates_in_kernel" in m2["nu"]["params"]["freq_guide"]

    # downgrade (the restore template) is the exact inverse of migrate
    down = downgrade_state_dict({"params": {"freq_guide": dict(p)}})
    fg_old = down["params"]["freq_guide"]
    assert set(fg_old) == {
        "conv_out", "low_attn_in", "low_attn_out", "high_attn_in", "high_attn_out"
    }
    assert fg_old["low_attn_in"]["kernel"].ndim == 4
    roundtrip = migrate_state_dict(down)
    for key in ("gates_in_kernel", "gates_in_bias", "gates_out_kernel", "gates_out_bias"):
        np.testing.assert_array_equal(
            roundtrip["params"]["freq_guide"][key], np.asarray(p[key])
        )


def test_migrate_passthrough_on_new_layout(rng):
    c = 8
    block = DCTFreqAwareBlock(c, 4, 3, (0.15, 1.9))
    x = jnp.asarray(rng.normal(0, 0.5, (1, 8, 8, c)).astype("float32"))
    params = block.init(jax.random.PRNGKey(2), x, jnp.array([0.5]))
    as_np = jax.tree.map(np.asarray, dict(params))
    migrated = migrate_state_dict(as_np)
    jax.tree.map(np.testing.assert_array_equal, migrated, as_np)
