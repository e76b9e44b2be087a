"""Golden tests for numeric primitives against PyTorch (CPU) references.

torch is used here ONLY as a test oracle for grid_sample / interpolate /
max_pool semantics — the framework itself never imports it.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from nvfi_tpu.ops import (
    grid_sample_2d,
    grid_sample_3d,
    raw2alpha,
    alpha2weights,
    resize_bilinear_ac,
    max_pool3d_same,
    positional_encoding,
    position_encoder,
)


def test_grid_sample_2d_matches_torch():
    rng = np.random.RandomState(0)
    H, W, C, N = 7, 11, 5, 257
    plane = rng.randn(H, W, C).astype(np.float32)
    # include in-range, boundary, and out-of-range coords
    coords = rng.uniform(-1.4, 1.4, size=(N, 2)).astype(np.float32)
    coords[:4] = [[-1, -1], [1, 1], [-1, 1], [1, -1]]

    ours = np.asarray(grid_sample_2d(jnp.array(plane), jnp.array(coords)))

    t_plane = torch.tensor(plane).permute(2, 0, 1)[None]  # (1,C,H,W)
    t_grid = torch.tensor(coords).view(1, N, 1, 2)
    ref = F.grid_sample(t_plane, t_grid, align_corners=True, padding_mode="zeros")
    ref = ref[0, :, :, 0].T.numpy()  # (N,C)

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_2d_block_matches_torch():
    """The quad-gather fast path must be bit-identical to the corner path
    (and hence to torch) including boundary and out-of-range coords."""
    from nvfi_tpu.ops.grid_sample import grid_sample_2d_block

    rng = np.random.RandomState(7)
    H, W, C, N = 8, 11, 6, 513
    plane = rng.randn(H, W, C).astype(np.float32)
    coords = rng.uniform(-1.7, 1.7, size=(N, 2)).astype(np.float32)
    coords[:4] = [[-1, -1], [1, 1], [0.9999, -0.3], [-1.0001, 0.4]]

    ours = np.asarray(grid_sample_2d_block(jnp.array(plane), jnp.array(coords)))
    t_plane = torch.tensor(plane).permute(2, 0, 1)[None]
    t_grid = torch.tensor(coords).view(1, N, 1, 2)
    ref = F.grid_sample(t_plane, t_grid, align_corners=True, padding_mode="zeros")
    ref = ref[0, :, :, 0].T.numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_matches_torch():
    rng = np.random.RandomState(1)
    D, H, W, N = 5, 6, 7, 123
    vol = rng.randn(D, H, W).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, size=(N, 3)).astype(np.float32)

    ours = np.asarray(grid_sample_3d(jnp.array(vol), jnp.array(coords)))

    t_vol = torch.tensor(vol)[None, None]  # (1,1,D,H,W)
    t_grid = torch.tensor(coords).view(1, N, 1, 1, 3)
    ref = F.grid_sample(t_vol, t_grid, align_corners=True, padding_mode="zeros")
    ref = ref.view(-1).numpy()

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_raw2alpha_matches_reference_math():
    rng = np.random.RandomState(2)
    sigma = np.abs(rng.randn(4, 9)).astype(np.float32)
    dist = np.abs(rng.randn(4, 9)).astype(np.float32) * 0.1

    alpha, weights, bg = raw2alpha(jnp.array(sigma), jnp.array(dist))

    t_alpha = 1.0 - torch.exp(-torch.tensor(sigma) * torch.tensor(dist))
    T = torch.cumprod(
        torch.cat([torch.ones(4, 1), 1.0 - t_alpha + 1e-10], -1), -1
    )
    t_weights = t_alpha * T[:, :-1]

    np.testing.assert_allclose(np.asarray(alpha), t_alpha.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(weights), t_weights.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bg), T[:, -1:].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(alpha2weights(jnp.array(np.asarray(alpha)))),
        t_weights.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )


@pytest.mark.parametrize("in_hw,out_hw", [((5, 7), (9, 13)), ((9, 13), (4, 6)), ((3, 3), (3, 8))])
def test_resize_bilinear_ac_2d_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(3)
    C = 4
    x = rng.randn(1, C, *in_hw).astype(np.float32)

    ours = np.asarray(
        resize_bilinear_ac(jnp.array(x), out_shape=out_hw, axes=(2, 3))
    )
    ref = F.interpolate(
        torch.tensor(x), size=out_hw, mode="bilinear", align_corners=True
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_max_pool3d_same_matches_torch():
    rng = np.random.RandomState(4)
    vol = rng.randn(6, 7, 8).astype(np.float32)
    ours = np.asarray(max_pool3d_same(jnp.array(vol), kernel=3))
    ref = F.max_pool3d(torch.tensor(vol)[None, None], kernel_size=3, padding=1, stride=1)
    np.testing.assert_allclose(ours, ref[0, 0].numpy(), rtol=1e-6)


def test_positional_encoding_matches_torch_reference_layout():
    """Reference layout (tensorf_model_utils.py:176-183): per-input-dim
    frequency groups — [x*1, x*2, y*1, y*2] — sin block then cos block."""
    x = jnp.array([[0.3, -0.7]], dtype=jnp.float32)
    enc = np.asarray(positional_encoding(x, 2))
    t = torch.tensor([[0.3, -0.7]])
    bands = (2 ** torch.arange(2).float())
    pts = (t[..., None] * bands).reshape(1, 4)
    ref = torch.cat([torch.sin(pts), torch.cos(pts)], dim=-1).numpy()
    np.testing.assert_allclose(enc, ref, rtol=1e-6)


def test_position_encoder_includes_identity_first():
    x = jnp.array([[0.5]], dtype=jnp.float32)
    enc = np.asarray(position_encoder(x, 2))
    expect = np.array([[0.5, np.sin(0.5), np.cos(0.5), np.sin(1.0), np.cos(1.0)]])
    np.testing.assert_allclose(enc, expect, rtol=1e-6)
