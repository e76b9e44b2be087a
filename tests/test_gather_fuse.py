"""Fused multi-plane gather (docs/pallas_decision.md §5 lever (b)).

The fused path must be BIT-identical to the per-plane quad-row gather — same
rows, same tent weights, same summation order, same dtype casts — so that
flipping ``nvfi.gather_fuse`` on is purely a scheduling change.  These tests
pin that equivalence at the op level, the plane-product level, and through a
full jitted render (fwd + grad).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from nvfi_tpu.ops.grid_sample import (
    grid_sample_2d_block,
    grid_sample_2d_block_multi,
)
from nvfi_tpu.fields import kplane


def _rand_planes_coords(key, shapes, batch=257, c=8):
    ks = jax.random.split(key, 2 * len(shapes))
    planes = [
        jax.random.normal(ks[i], (h, w, c), jnp.float32)
        for i, (h, w) in enumerate(shapes)
    ]
    # coords straddle the valid range: in-range, boundary-exact, out-of-range
    coords = [
        jax.random.uniform(ks[len(shapes) + i], (batch, 2), jnp.float32, -1.3, 1.3)
        for i in range(len(shapes))
    ]
    return planes, coords


@pytest.mark.parametrize("compute_dtype", [None, "bfloat16"])
def test_multi_matches_per_plane_bitwise(compute_dtype):
    planes, coords = _rand_planes_coords(
        jax.random.PRNGKey(0), [(17, 23), (23, 11), (11, 17), (4, 17), (4, 23), (4, 11)]
    )
    fused = grid_sample_2d_block_multi(planes, coords, compute_dtype)
    for i, (p, c) in enumerate(zip(planes, coords)):
        ref = grid_sample_2d_block(p, c, compute_dtype)
        assert fused[i].dtype == ref.dtype
        np.testing.assert_array_equal(np.asarray(fused[i]), np.asarray(ref))


def test_multi_batch_shape_preserved():
    planes, _ = _rand_planes_coords(jax.random.PRNGKey(1), [(9, 9), (9, 9)])
    coords = [jnp.zeros((3, 5, 2)), jnp.ones((3, 5, 2)) * 0.25]
    out = grid_sample_2d_block_multi(planes, coords)
    assert out.shape == (2, 3, 5, 8)


def _tiny_meta(**kw):
    base = kplane.KPlaneMeta(
        grid_size=(12, 10, 14),
        num_keyframes=4,
        tmax=0.75,
        aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
        near_far=(2.0, 6.0),
        density_n_comp=4,
        app_n_comp=6,
        app_dim=8,
        density_shift=-5.0,
        distance_scale=10.0,
        alpha_mask_thres=1e-4,
        raymarch_weight_thres=1e-4,
        feature_c=16,
        max_n_samples=48,
        use_vel=False,
    )
    return replace(base, **kw)


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_plane_product_fused_bitwise(compute_dtype):
    meta = _tiny_meta(compute_dtype=compute_dtype)
    params = kplane.init_params(jax.random.PRNGKey(2), meta)
    xyzt = jax.random.uniform(jax.random.PRNGKey(3), (123, 4), jnp.float32, -1.1, 1.1)

    base = kplane.field_features(params, meta, xyzt)
    fused = kplane.field_features(params, replace(meta, gather_fuse=True), xyzt)
    for a, b in zip(base, fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_render_and_grad_fused_bitwise():
    """Full jitted render_rays fwd + plane gradients, fused vs per-plane."""
    meta = _tiny_meta(compute_dtype="bfloat16", shade_fraction=0.5,
                      block_budget=0.75, sample_block=8)
    params = kplane.init_params(jax.random.PRNGKey(4), meta)
    key = jax.random.PRNGKey(5)
    n = 33
    o = jnp.stack([jnp.zeros(n), jnp.zeros(n), jnp.full(n, -4.0)], axis=-1)
    d_ = jax.random.normal(key, (n, 3))
    d_ = d_ / jnp.linalg.norm(d_, axis=-1, keepdims=True)
    d_ = d_.at[:, 2].set(jnp.abs(d_[:, 2]) + 0.5)
    t = jnp.linspace(0.0, 0.7, n)

    def loss(params, meta):
        out = kplane.render_rays(params, meta, t, o, d_,
                                 key=jax.random.PRNGKey(6), training=True,
                                 white_bg=False)
        return jnp.sum(out["rgb"].astype(jnp.float32) ** 2)

    def run(meta):
        v, g = jax.jit(jax.value_and_grad(loss), static_argnums=1)(params, meta)
        return v, g

    v0, g0 = run(meta)
    v1, g1 = run(replace(meta, gather_fuse=True))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
