"""MaskField: per-point K-way object-mask MLP for unsupervised segmentation.

Functional port of reference models/mask_field.py:34-83 — an n_layer ReLU MLP
(default used by train_segm.py: 4 layers, 128 wide, no skips) from xyz to a
softmax over ``mask_dim`` object slots, with an optional Fourier point
embedding (reference :6-31).  Static hyperparameters (skip indices, embed
bands, activation) are passed to ``apply`` rather than stored in the trainable
pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.encoding import position_encoder
from .mlp import linear, linear_init


def init(key, n_layer: int = 4, n_dim: int = 128, input_dim: int = 3,
         skips: tuple = (), mask_dim: int = 2, point_embed_freqs: int = 0):
    """Build MaskField params. ``point_embed_freqs=4`` matches the reference
    FourierEmbedding default (include_input + 4 log-spaced bands)."""
    in_dim = input_dim * (1 + 2 * point_embed_freqs) if point_embed_freqs else input_dim
    keys = jax.random.split(key, n_layer + 1)
    layers = []
    d = in_dim
    for l in range(n_layer):
        d_in = d + in_dim if (l > 0 and (l - 1) in skips) else d
        layers.append(linear_init(keys[l], d_in, n_dim))
        d = n_dim
    head = linear_init(keys[-1], n_dim, mask_dim)
    return {"layers": layers, "head": head}


def apply(params, xyz, skips: tuple = (), embed_freqs: int = 0, mask_act: str = "softmax"):
    """(..., 3) points -> (..., mask_dim) object probabilities."""
    x = position_encoder(xyz, embed_freqs) if embed_freqs else xyz
    h = x
    for l, layer in enumerate(params["layers"]):
        h = jax.nn.relu(linear(layer, h))
        if l in skips:
            h = jnp.concatenate([x, h], axis=-1)
    logits = linear(params["head"], h)
    if mask_act == "softmax":
        return jax.nn.softmax(logits, axis=-1)
    if mask_act == "sigmoid":
        return jax.nn.sigmoid(logits)
    return logits
