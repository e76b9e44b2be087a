"""Grid lifecycle ops: corner-aligned bilinear resize and same-padded 3D max-pool.

Used by the coarse-to-fine upsample schedule (reference
models/tensorf_keyframe.py:327-376 uses ``F.interpolate(mode='bilinear',
align_corners=True)``) and the alpha-mask dilation (reference
models/tensorf_base.py:386 uses ``F.max_pool3d(kernel=3, stride=1, pad=1)``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _resize_axis_ac(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    """Linear resample one axis with align_corners=True semantics."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if out_size == 1:
        idx = jnp.zeros((1,), dtype=jnp.int32)
        return jnp.take(x, idx, axis=axis)
    if in_size == 1:
        reps = [1] * x.ndim
        reps[axis] = out_size
        return jnp.tile(x, reps)
    # output index i maps to input coordinate i * (in-1) / (out-1)
    pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w = (pos - lo.astype(jnp.float32)).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return jnp.take(x, lo, axis=axis) * (1 - w) + jnp.take(x, hi, axis=axis) * w


def resize_bilinear_ac(x: jnp.ndarray, out_shape: tuple, axes: tuple) -> jnp.ndarray:
    """Resize the given axes of ``x`` to ``out_shape`` with align_corners=True.

    Separable: equals torch ``F.interpolate(..., align_corners=True)`` for both
    1D and 2D targets.
    """
    for axis, size in zip(axes, out_shape):
        x = _resize_axis_ac(x, axis, int(size))
    return x


def max_pool3d_same(volume: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """3D max pool, stride 1, SAME padding (reference models/tensorf_base.py:386)."""
    pad = kernel // 2
    return lax.reduce_window(
        volume,
        -jnp.inf,
        lax.max,
        window_dimensions=(kernel, kernel, kernel),
        window_strides=(1, 1, 1),
        padding=[(pad, pad)] * 3,
    ).astype(volume.dtype)
