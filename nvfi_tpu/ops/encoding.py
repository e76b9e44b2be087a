"""Positional / Fourier encodings.

The reference uses two distinct conventions, both reproduced here with exact
feature ordering so decoded-weight structure is comparable:

* ``positional_encoding(x, freqs)`` — shader-MLP flavor (reference
  models/tensorf_model_utils.py:176-183): frequencies 2^0..2^(F-1), all sines
  concatenated before all cosines, identity NOT included.
* ``position_encoder(x, F)`` — velocity-net flavor (reference
  models/base_network.py:20-54): identity first, then per-frequency
  ``[sin(x*f), cos(x*f)]`` pairs.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """Shader-MLP encoding: (..., D) -> (..., 2*freqs*D), sin-block then cos-block."""
    bands = 2.0 ** jnp.arange(freqs, dtype=x.dtype)
    pts = (x[..., None] * bands).reshape(*x.shape[:-1], freqs * x.shape[-1])
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)


def position_encoder(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """Velocity-net encoding: (..., D) -> (..., D*(1+2*num_freqs)), identity first."""
    out = [x]
    for i in range(num_freqs):
        f = 2.0**i
        out.append(jnp.sin(x * f))
        out.append(jnp.cos(x * f))
    return jnp.concatenate(out, axis=-1)
