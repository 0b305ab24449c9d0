"""Test-time self-ensemble (dihedral TTA) for restoration.

Classic restoration quality lever (popularised as "geometric self-ensemble"
in EDSR, arXiv:1707.02921): restore the 4 flip / 8 dihedral transforms of the
degraded input, invert each restoration, average. The reference has no
equivalent; it composes with every solver acceleration here because each
transformed restore reuses the SAME compiled sampler executable (identical
shapes/signature), so the cost is exactly N sequential restores.

Codec-grid note: flips preserve the JPEG/WebP block-grid alignment whenever
H and W are multiples of the block size (always true for this framework's
model sizes), so the flipped input exhibits a valid artifact pattern of the
same codec. 90-degree rotations additionally require H == W; `dihedral`
transforms with k >= 4 transpose the axes and are only offered for square
inputs.
"""

from __future__ import annotations

import jax.numpy as jnp


def dihedral(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Apply the k-th (0..7) dihedral-group element to NHWC `x`.

    k = 0..3: identity, flip-W, flip-H, flip-both (grid-safe for any
    block-aligned rectangle); k = 4..7: the same four composed with an
    H<->W transpose (square inputs only).
    """
    if not 0 <= k < 8:
        raise ValueError(f"k must be in [0, 8), got {k}")
    if k >= 4:
        if x.shape[1] != x.shape[2]:
            raise ValueError("dihedral k>=4 (transpositions) needs H == W")
        x = jnp.swapaxes(x, 1, 2)
    if k % 4 in (1, 3):
        x = x[:, :, ::-1]
    if k % 4 in (2, 3):
        x = x[:, ::-1]
    return x


def dihedral_inverse(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Invert `dihedral(·, k)` (flips self-invert; transpose applied last)."""
    if not 0 <= k < 8:
        raise ValueError(f"k must be in [0, 8), got {k}")
    if k % 4 in (1, 3):
        x = x[:, :, ::-1]
    if k % 4 in (2, 3):
        x = x[:, ::-1]
    if k >= 4:
        x = jnp.swapaxes(x, 1, 2)
    return x


def sample_ensemble(sampler, params, y, quality, steps, n_transforms: int = 4, **kw):
    """Restore `y` as the average over `n_transforms` dihedral variants.

    n_transforms in {1, 2, 4, 8}; 8 requires square inputs. Every variant
    shares the sampler's compiled executable (same shapes), so wall time is
    ~n_transforms restores and there is no extra compilation.
    """
    if n_transforms not in (1, 2, 4, 8):
        raise ValueError(f"n_transforms must be 1, 2, 4 or 8, got {n_transforms}")
    acc = None
    for k in range(n_transforms):
        out = sampler.sample(params, dihedral(jnp.asarray(y), k), quality, steps, **kw)
        out = dihedral_inverse(out, k)
        acc = out if acc is None else acc + out
    return acc / n_transforms
