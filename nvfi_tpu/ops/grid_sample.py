"""Bilinear / trilinear grid sampling with PyTorch ``align_corners=True`` semantics.

The reference leans on ``F.grid_sample(..., align_corners=True)`` at 15 call
sites for every plane / line / volume lookup (reference
models/tensorf_keyframe.py:259-264, models/tensorf_base.py:821-830,
models/tensorf_model_utils.py:435-437).  Exact corner-aligned indexing with
zeros padding is reproduced here:

* normalized coord u in [-1, 1] maps to pixel coordinate ``(u+1)/2 * (S-1)``;
* bilinear corners outside the grid contribute zero (padding_mode='zeros').

Layout: planes are stored channels-last ``(H, W, C)`` — one gather pulls a
contiguous C-vector into TPU lanes, instead of the reference's ``(1, C, H, W)``
layout which would scatter channels across strided memory.
"""

from __future__ import annotations

import jax.numpy as jnp


def _corner_weights(u: jnp.ndarray, size: int):
    """Map normalized coords to (lo index, hi index, hi weight, per-corner valid)."""
    x = (u + 1.0) * 0.5 * (size - 1)
    x0 = jnp.floor(x)
    w1 = x - x0
    i0 = x0.astype(jnp.int32)
    i1 = i0 + 1
    v0 = (i0 >= 0) & (i0 <= size - 1)
    v1 = (i1 >= 0) & (i1 <= size - 1)
    i0c = jnp.clip(i0, 0, size - 1)
    i1c = jnp.clip(i1, 0, size - 1)
    return (i0c, i1c), (1.0 - w1, w1), (v0, v1)


def grid_sample_2d(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample a channels-last plane at normalized 2D coordinates.

    Args:
      plane:  (H, W, C) array.
      coords: (..., 2) normalized (x, y) with x indexing W and y indexing H —
              identical convention to ``F.grid_sample`` on a (1, C, H, W) input
              with grid (1, N, 1, 2).

    Returns:
      (..., C) interpolated features.
    """
    H, W, C = plane.shape
    x, y = coords[..., 0], coords[..., 1]
    (ix0, ix1), (wx0, wx1), (vx0, vx1) = _corner_weights(x, W)
    (iy0, iy1), (wy0, wy1), (vy0, vy1) = _corner_weights(y, H)

    flat = plane.reshape(H * W, C)

    def corner(iy, ix, wy, wx, vy, vx):
        # weights keep the coordinate dtype (f32): bf16-stored planes are
        # gathered at half bandwidth, then upcast for the interpolation math
        w = wy * wx * (vy & vx)
        return flat[iy * W + ix].astype(w.dtype) * w[..., None]

    return (
        corner(iy0, ix0, wy0, wx0, vy0, vx0)
        + corner(iy0, ix1, wy0, wx1, vy0, vx1)
        + corner(iy1, ix0, wy1, wx0, vy1, vx0)
        + corner(iy1, ix1, wy1, wx1, vy1, vx1)
    )


def make_quad_plane(plane: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H-1, W-1, 4C) cell-quad view: channels ordered
    [y0x0, y0x1, y1x0, y1x1].  One flat row-gather of this array fetches all
    four bilinear corners of a cell at once (see grid_sample_2d_block)."""
    return jnp.concatenate(
        [plane[:-1, :-1], plane[:-1, 1:], plane[1:, :-1], plane[1:, 1:]],
        axis=-1,
    )


def grid_sample_2d_block(plane: jnp.ndarray, coords: jnp.ndarray,
                         compute_dtype=None) -> jnp.ndarray:
    """Bilinear plane sampling with ONE flat row-gather per point.

    Numerically identical to :func:`grid_sample_2d` (torch align_corners=True,
    zeros padding) but ~4x cheaper on TPU, where gather cost is bound by index
    count, not bytes: the plane is first expanded to a cell-quad array whose
    rows hold all 4 corners of a cell (a cheap dense concat), each point
    fetches its (clamped) cell row with a single 4C-wide gather, and every
    corner is weighted with the tent function ``max(0, 1 - |x - col|)`` —
    which reproduces the interior bilinear weights, the boundary cases, and
    the zero contribution of out-of-range corners in one formula.

    ``compute_dtype``: dtype of the tent-weighted interpolation arithmetic and
    the output.  TPU measurement (scripts/perf_micro2.py): gather cost is
    per-index, so reading f32 planes costs the same as bf16 — and the VJP's
    scatter-add is *faster* in f32 — so mixed precision keeps the plane (and
    its gradient) in f32 and downcasts the gathered rows only.  This mirrors
    the reference's AMP autocast around F.grid_sample (train_nvfi.py:144).

    Args / returns: identical to grid_sample_2d (output in compute_dtype).
    """
    H, W, C = plane.shape
    quad = make_quad_plane(plane).reshape((H - 1) * (W - 1), 4 * C)

    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    batch_shape = x.shape
    xf = x.reshape(-1)
    yf = y.reshape(-1)

    x0 = jnp.clip(jnp.floor(xf).astype(jnp.int32), 0, max(W - 2, 0))
    y0 = jnp.clip(jnp.floor(yf).astype(jnp.int32), 0, max(H - 2, 0))
    rows = quad[y0 * (W - 1) + x0]  # (P, 4C)

    x0f = x0.astype(xf.dtype)
    y0f = y0.astype(yf.dtype)
    wx0 = jnp.clip(1.0 - jnp.abs(xf - x0f), 0.0, 1.0)
    wx1 = jnp.clip(1.0 - jnp.abs(xf - (x0f + 1.0)), 0.0, 1.0)
    wy0 = jnp.clip(1.0 - jnp.abs(yf - y0f), 0.0, 1.0)
    wy1 = jnp.clip(1.0 - jnp.abs(yf - (y0f + 1.0)), 0.0, 1.0)

    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else wx0.dtype
    r = rows.astype(cd)
    out = (
        r[:, 0 * C : 1 * C] * (wy0 * wx0).astype(cd)[:, None]
        + r[:, 1 * C : 2 * C] * (wy0 * wx1).astype(cd)[:, None]
        + r[:, 2 * C : 3 * C] * (wy1 * wx0).astype(cd)[:, None]
        + r[:, 3 * C : 4 * C] * (wy1 * wx1).astype(cd)[:, None]
    )
    return out.reshape(*batch_shape, C)


def grid_sample_2d_block_multi(planes, coords, compute_dtype=None) -> jnp.ndarray:
    """Sample N same-channel-width planes with ONE fused flat row-gather.

    The per-plane :func:`grid_sample_2d_block` issues one gather op per plane;
    at the K-plane hot path that is 6 gather ops (3 space + 3 time) per
    evaluation, and the jax-0.9 micro-probe (docs/pallas_decision.md §5) puts
    the per-op dispatch floor above the per-index VJP cost at bench scale — so
    op count, not index count, is the next term.  This variant concatenates
    the N cell-quad tables along the row axis (all planes share the channel
    width C, so the 4C-wide rows align) and fetches every plane's row in a
    single gather of N·P indices; the backward pass likewise becomes ONE
    scatter-add into the concatenated table.

    Bit-identical to the per-plane path: same rows, same tent weights, same
    4-term summation order, same dtype casts (pinned by
    tests/test_gather_fuse.py).

    Args:
      planes: sequence of (Hi, Wi, C) channels-last planes (shared C, shapes
              may differ otherwise).
      coords: sequence of (..., 2) normalized coords, one per plane, sharing
              one batch shape.
      compute_dtype: as in grid_sample_2d_block.

    Returns:
      (N, ..., C) stacked samples; slice [i] equals
      grid_sample_2d_block(planes[i], coords[i], compute_dtype).
    """
    n = len(planes)
    C = planes[0].shape[-1]
    quads = []
    offsets = []
    off = 0
    for p in planes:
        H, W, Cp = p.shape
        assert Cp == C, "fused gather requires a shared channel width"
        quads.append(make_quad_plane(p).reshape((H - 1) * (W - 1), 4 * C))
        offsets.append(off)
        off += (H - 1) * (W - 1)
    table = jnp.concatenate(quads, axis=0)

    batch_shape = coords[0].shape[:-1]
    idxs = []
    wts = []
    for p, c, o in zip(planes, coords, offsets):
        H, W, _ = p.shape
        x = (c[..., 0] + 1.0) * 0.5 * (W - 1)
        y = (c[..., 1] + 1.0) * 0.5 * (H - 1)
        xf = x.reshape(-1)
        yf = y.reshape(-1)
        x0 = jnp.clip(jnp.floor(xf).astype(jnp.int32), 0, max(W - 2, 0))
        y0 = jnp.clip(jnp.floor(yf).astype(jnp.int32), 0, max(H - 2, 0))
        idxs.append(y0 * (W - 1) + x0 + o)
        x0f = x0.astype(xf.dtype)
        y0f = y0.astype(yf.dtype)
        wx0 = jnp.clip(1.0 - jnp.abs(xf - x0f), 0.0, 1.0)
        wx1 = jnp.clip(1.0 - jnp.abs(xf - (x0f + 1.0)), 0.0, 1.0)
        wy0 = jnp.clip(1.0 - jnp.abs(yf - y0f), 0.0, 1.0)
        wy1 = jnp.clip(1.0 - jnp.abs(yf - (y0f + 1.0)), 0.0, 1.0)
        # corner order matches the quad channel layout [y0x0, y0x1, y1x0, y1x1]
        wts.append(jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1))

    rows = table[jnp.concatenate(idxs, axis=0)]  # THE one gather: (n*P, 4C)
    w = jnp.concatenate(wts, axis=0)  # (n*P, 4), f32 tent products as per-plane

    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else w.dtype
    r = rows.astype(cd)
    w = w.astype(cd)
    out = (
        r[:, 0 * C : 1 * C] * w[:, 0:1]
        + r[:, 1 * C : 2 * C] * w[:, 1:2]
        + r[:, 2 * C : 3 * C] * w[:, 2:3]
        + r[:, 3 * C : 4 * C] * w[:, 3:4]
    )
    return out.reshape(n, *batch_shape, C)


def grid_sample_1d(line: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample a channels-last line grid at normalized 1D coordinates.

    Args:
      line:   (L, C) array — the reference stores lines as (1, C, L, 1) and
              samples them with a degenerate 2D grid (tensorf_base.py:805-830).
      coords: (...,) normalized coordinate along L.

    Returns:
      (..., C) interpolated features.
    """
    L, C = line.shape
    (i0, i1), (w0, w1), (v0, v1) = _corner_weights(coords, L)
    f0 = line[i0].astype(w0.dtype) * (w0 * v0)[..., None]
    f1 = line[i1].astype(w1.dtype) * (w1 * v1)[..., None]
    return f0 + f1


def grid_sample_3d(volume: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of a volume at normalized 3D coordinates.

    Args:
      volume: (D, H, W) array (single channel — the alpha-occupancy use case,
              reference models/tensorf_model_utils.py:433-439).
      coords: (..., 3) normalized (x, y, z) with x indexing W, y indexing H,
              z indexing D (torch 3D grid_sample convention).

    Returns:
      (...,) interpolated values.
    """
    D, H, W = volume.shape
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    (ix0, ix1), (wx0, wx1), (vx0, vx1) = _corner_weights(x, W)
    (iy0, iy1), (wy0, wy1), (vy0, vy1) = _corner_weights(y, H)
    (iz0, iz1), (wz0, wz1), (vz0, vz1) = _corner_weights(z, D)

    flat = volume.reshape(-1)

    def corner(iz, iy, ix, wz, wy, wx, vz, vy, vx):
        w = wz * wy * wx * (vz & vy & vx)
        return flat[(iz * H + iy) * W + ix].astype(w.dtype) * w

    return (
        corner(iz0, iy0, ix0, wz0, wy0, wx0, vz0, vy0, vx0)
        + corner(iz0, iy0, ix1, wz0, wy0, wx1, vz0, vy0, vx1)
        + corner(iz0, iy1, ix0, wz0, wy1, wx0, vz0, vy1, vx0)
        + corner(iz0, iy1, ix1, wz0, wy1, wx1, vz0, vy1, vx1)
        + corner(iz1, iy0, ix0, wz1, wy0, wx0, vz1, vy0, vx0)
        + corner(iz1, iy0, ix1, wz1, wy0, wx1, vz1, vy0, vx1)
        + corner(iz1, iy1, ix0, wz1, wy1, wx0, vz1, vy1, vx0)
        + corner(iz1, iy1, ix1, wz1, wy1, wx1, vz1, vy1, vx1)
    )
