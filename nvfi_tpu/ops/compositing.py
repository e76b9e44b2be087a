"""Volume-rendering compositing: density -> alpha -> transmittance -> weights.

Matches the reference math exactly (models/tensorf_model_utils.py:186-223):
``alpha = 1 - exp(-sigma * dist)``, transmittance is the exclusive cumulative
product of ``1 - alpha + 1e-10`` along the sample axis, and per-sample
compositing weights are ``alpha * T``.

The ``1e-10`` floor marks the numerically fragile spot noted in SURVEY.md §5.2
and is preserved bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp


def raw2alpha(sigma: jnp.ndarray, dist: jnp.ndarray):
    """Compute (alpha, weights, background transmittance) per ray.

    Args:
      sigma: (..., S) densities.
      dist:  (..., S) step lengths, pre-multiplied by distance_scale by callers
             (reference models/tensorf_keyframe.py:717).

    Returns:
      alpha (..., S), weights (..., S), bg_T (..., 1) — matching the reference
      ``raw2alpha`` return convention (models/tensorf_model_utils.py:186-197).
    """
    alpha = 1.0 - jnp.exp(-sigma * dist)
    one = jnp.ones_like(alpha[..., :1])
    T = jnp.cumprod(jnp.concatenate([one, 1.0 - alpha + 1e-10], axis=-1), axis=-1)
    weights = alpha * T[..., :-1]
    return alpha, weights, T[..., -1:]


def raw2alpha_seg(sigma: jnp.ndarray, dist: jnp.ndarray):
    """Multi-field compositing: transmittance is the product over fields
    (reference models/tensorf_model_utils.py:200-211).

    sigma: (F, R, S) per-field densities; dist: (R, S).
    Returns alpha (F,R,S), weights (F,R,S), bg_T (R,1).
    """
    alpha = 1.0 - jnp.exp(-sigma * dist[None])
    one = jnp.ones_like(alpha[..., :1])
    T = jnp.cumprod(jnp.concatenate([one, 1.0 - alpha + 1e-10], axis=-1), axis=-1)
    T = jnp.prod(T, axis=0)  # combined transmittance across fields
    weights = alpha * T[None, :, :-1]
    return alpha, weights, T[:, -1:]


def alpha2weights(alpha: jnp.ndarray):
    """Weights from precomputed alpha (reference models/tensorf_model_utils.py:214-223)."""
    one = jnp.ones_like(alpha[..., :1])
    T = jnp.cumprod(jnp.concatenate([one, 1.0 - alpha + 1e-10], axis=-1), axis=-1)
    return alpha * T[..., :-1]
