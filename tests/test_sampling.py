"""Ray-sampling and data-sampler tests (NDC, contracted, ISG importance)."""

import numpy as np
import jax
import jax.numpy as jnp

from nvfi_tpu.fields import kplane
from nvfi_tpu.render.rays import ray_bundle, ndc_rays
from nvfi_tpu.data.sampler import SimpleSampler, RayImportanceSampler


def tiny_meta(**kw):
    d = dict(
        grid_size=(8, 8, 8), num_keyframes=2, tmax=0.75,
        aabb=((-2.0,) * 3, (2.0,) * 3), near_far=(2.0, 6.0),
        density_n_comp=4, app_n_comp=4, app_dim=4, density_shift=-10.0,
        distance_scale=25.0, alpha_mask_thres=1e-4, raymarch_weight_thres=1e-4,
        max_n_samples=16, use_vel=False, feature_c=16,
    )
    d.update(kw)
    return kplane.KPlaneMeta(**d)


def test_ndc_sampling_linear_in_depth():
    meta = tiny_meta(ray_sampling="ndc", near_far=(0.0, 1.0))
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    pts, z, valid = kplane.sample_ray_ndc(meta, o, d, 8, False, None)
    np.testing.assert_allclose(np.asarray(z[0]), np.linspace(0, 1, 8), atol=1e-6)


def test_contracted_sampling_stays_in_shell():
    meta = tiny_meta(ray_sampling="contracted", near_far=(0.5, 100.0))
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    pts, z, valid = kplane.sample_ray_contracted(meta, o, d, 16, False, None)
    # contraction maps everything into max-norm <= 2
    assert float(jnp.max(jnp.abs(pts))) <= 2.0 + 1e-5
    assert bool(valid.all())
    # z values monotonically increasing per ray
    assert bool((jnp.diff(z, axis=1) > 0).all())


def test_ndc_projection_matches_reference_formula():
    """ndc_rays must match reference models/camera.py:140-157."""
    H = W = 32
    focal = 20.0
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 2.0
    o, d = ray_bundle(pose, H, W, focal)
    no, nd = ndc_rays(H, W, focal, 1.0, o.reshape(-1, 3), d.reshape(-1, 3))
    # after shifting to the near plane, o2 = 1 + 2*near/oz
    oz = o.reshape(-1, 3)[:, 2] + (-(1.0 + o.reshape(-1, 3)[:, 2]) / d.reshape(-1, 3)[:, 2]) * d.reshape(-1, 3)[:, 2]
    np.testing.assert_allclose(no[:, 2], 1.0 + 2.0 / oz, rtol=1e-5)
    assert np.isfinite(nd).all()


def test_simple_sampler_covers_all_ids():
    s = SimpleSampler(100, 10)
    seen = set()
    for _ in range(10):
        seen.update(s.nextids().tolist())
    assert seen == set(range(100))


def test_importance_sampler_prefers_changing_pixels():
    rng = np.random.default_rng(0)
    n_img, n_pix = 4, 256
    rgbs = np.zeros((n_img, n_pix, 3), np.float32)
    # pixels 0..31 vary across images, the rest are constant
    rgbs[:, :32] = rng.random((n_img, 32, 3))
    s = RayImportanceSampler(rgbs, batch=64, n_images=n_img)
    ids = np.concatenate([s.nextids() for _ in range(50)])
    frac_dynamic = np.mean((ids % n_pix) < 32)
    assert frac_dynamic > 0.9, frac_dynamic


def test_block_sparse_matches_dense():
    """block_budget < 1 with a budget covering every active block must be
    numerically identical to the dense path (skipped blocks are all-invalid
    => exact zeros), with dropped_blocks == 0."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace
    from nvfi_tpu.fields import kplane

    meta = kplane.KPlaneMeta(
        grid_size=(24, 24, 24), num_keyframes=4, tmax=0.75,
        aabb=((-2.0,) * 3, (2.0,) * 3), near_far=(2.0, 6.0),
        density_n_comp=8, app_n_comp=8, app_dim=8,
        density_shift=-10.0, distance_scale=25.0,
        alpha_mask_thres=1e-4, raymarch_weight_thres=1e-4,
        feature_c=32, max_n_samples=192, use_vel=True,
    )
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    rng = np.random.RandomState(3)
    n = 32
    ro = jnp.asarray(np.tile([[0.0, 0.0, 4.0]], (n, 1)).astype(np.float32))
    d = np.concatenate([rng.randn(n, 2) * 0.3, -np.ones((n, 1))], -1)
    rd = jnp.asarray(d.astype(np.float32))
    t = jnp.asarray(rng.rand(n).astype(np.float32) * 0.75)
    key = jax.random.PRNGKey(7)

    dense = kplane.render_rays(params, meta, t, ro, rd, key=key,
                               training=False, white_bg=True)
    sparse_meta = replace(meta, block_budget=0.9)
    sparse = kplane.render_rays(params, sparse_meta, t, ro, rd, key=key,
                                training=False, white_bg=True)
    assert float(sparse["dropped_blocks"]) == 0.0
    for k in ("rgb", "depth", "acc"):
        np.testing.assert_allclose(np.asarray(sparse[k]), np.asarray(dense[k]),
                                    rtol=1e-5, atol=1e-6, err_msg=k)
    # gradients agree too (the scatter/gather VJPs are exact)
    def loss(p, m):
        out = kplane.render_rays(p, m, t, ro, rd, key=key, training=True,
                                 white_bg=True)
        return jnp.sum(out["rgb"] ** 2)

    g_dense = jax.grad(loss)(params, meta)
    g_sparse = jax.grad(loss)(params, sparse_meta)
    for a, b in zip(jax.tree.leaves(g_dense), jax.tree.leaves(g_sparse)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                    rtol=2e-4, atol=1e-6)
