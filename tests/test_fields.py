"""Field-level correctness tests with analytic golden values.

SURVEY.md §4 strategy: the rigid-motion velocity basis makes exact solutions
available (constant translation, pure rotation => circular trajectories).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvfi_tpu.fields import kplane, velocity as vel_mod


def tiny_meta(**kw):
    defaults = dict(
        grid_size=(16, 16, 16), num_keyframes=4, tmax=0.75,
        aabb=((-2.0,) * 3, (2.0,) * 3), near_far=(2.0, 6.0),
        density_n_comp=4, app_n_comp=4, app_dim=4,
        density_shift=-10.0, distance_scale=25.0,
        alpha_mask_thres=1e-4, raymarch_weight_thres=1e-4,
        feature_c=32, max_n_samples=48,
    )
    defaults.update(kw)
    return kplane.KPlaneMeta(**defaults)


def constant_weight_velocity(params, w6, a6=None):
    """Force the velocity MLPs to output constant basis weights: zero all
    layers, set the final bias.  v(x) = sum_i w6[i] * b_i(x) exactly."""
    p = jax.tree.map(jnp.zeros_like, params["vel"])
    p["weight_net"][-1]["b"] = jnp.asarray(w6, jnp.float32)
    if a6 is not None:
        p["a_weight_net"][-1]["b"] = jnp.asarray(a6, jnp.float32)
    out = dict(params)
    out["vel"] = p
    return out


def test_constant_translation_advection():
    """v = (c, 0, 0): backward advection from t to base shifts x by -c*(t-base)."""
    meta = tiny_meta(vel_gate=vel_mod.VelGate("aabb", eps=0.0))
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    c = 0.37
    params = constant_weight_velocity(params, [c, 0, 0, 0, 0, 0])

    xyz = jnp.array([[0.1, 0.2, -0.3], [0.5, -0.4, 0.0]], jnp.float32)
    t = jnp.full((2, 1), 0.4, jnp.float32)
    base = kplane.snap_to_keyframe(meta, t)  # delta=0.25 -> base=0.5, offset=-0.1
    adv = kplane.integrate_pos(params, meta, xyz, t, base, n_steps=1)
    offset = np.asarray(t - base)
    expect = np.asarray(xyz) - offset * np.array([c, 0, 0])
    np.testing.assert_allclose(np.asarray(adv), expect, atol=1e-5)


def test_rotation_advection_matches_exact_rotation():
    """v = w x r with w = (-1,0,0) (basis b4): trajectories are circles; the
    RK2 integrator must track the exact rotation to O(dt^3) per step."""
    meta = tiny_meta(num_keyframes=4, vel_gate=vel_mod.VelGate("aabb", eps=0.0))
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    params = constant_weight_velocity(params, [0, 0, 0, 1, 0, 0])

    xyz = jnp.array([[0.0, 0.5, 0.0], [0.2, -0.1, 0.4]], jnp.float32)
    t = jnp.full((2, 1), 0.625, jnp.float32)
    base = jnp.zeros_like(t)  # transfer-style full advection, offset 0.625
    n_steps = meta.max_adv_steps
    adv = np.asarray(kplane.integrate_pos(params, meta, xyz, t, base, n_steps=n_steps))

    # exact: backward advection solves dx/ds = -v; for v = omega x r the
    # solution is rotation by matrix exp(-[omega]_x * tau), omega = (-1,0,0)
    tau = 0.625
    ca, sa = np.cos(tau), np.sin(tau)
    # omega=(-1,0,0): rotation about x by angle -tau forward; backward = +tau
    R = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    expect = (R @ np.asarray(xyz).T).T
    np.testing.assert_allclose(adv, expect, atol=5e-3)


def test_advection_respects_aabb_gate():
    """Points within eps of the boundary must not move (VelocityAABB gating)."""
    meta = tiny_meta(vel_gate=vel_mod.VelGate("aabb", eps=0.05))
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    params = constant_weight_velocity(params, [1.0, 0, 0, 0, 0, 0])
    xyz = jnp.array([[0.97, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    t = jnp.full((2, 1), 0.4, jnp.float32)
    base = kplane.snap_to_keyframe(meta, t)
    adv = np.asarray(kplane.integrate_pos(params, meta, xyz, t, base, n_steps=1))
    np.testing.assert_allclose(adv[0], np.asarray(xyz[0]), atol=1e-7)  # gated
    assert abs(adv[1, 0] - float(xyz[1, 0])) > 1e-3  # interior point moved


def test_pde_loss_zero_for_divergence_free_steady_field():
    """Constant translation with matching acceleration=0 satisfies both PDE
    terms exactly -> loss == 0 (on occupied points)."""
    from nvfi_tpu.physics.pde import vel_pde_loss

    # density_shift 5 => softplus(feat+5) large => everything occupied
    meta = tiny_meta(density_shift=5.0, vel_gate=vel_mod.VelGate("aabb", eps=0.0))
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    params = constant_weight_velocity(params, [0.3, -0.2, 0.1, 0, 0, 0],
                                      a6=[0, 0, 0, 0, 0, 0])
    loss = float(vel_pde_loss(params, meta, jax.random.PRNGKey(1), 256))
    assert loss < 1e-8, loss


def test_pde_loss_positive_for_rotation_without_acceleration():
    """Pure rotation has (v.grad)v = centripetal term != 0; with a=0 the
    transport residual is |omega x (omega x r)|^2."""
    from nvfi_tpu.physics.pde import vel_pde_loss

    meta = tiny_meta(density_shift=5.0, vel_gate=vel_mod.VelGate("aabb", eps=0.0))
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    params = constant_weight_velocity(params, [0, 0, 0, 1, 0, 0],
                                      a6=[0, 0, 0, 0, 0, 0])
    loss = float(vel_pde_loss(params, meta, jax.random.PRNGKey(1), 256))
    assert loss > 1e-4, loss


def test_render_shapes_and_masking():
    meta = tiny_meta()
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (8, 1))
    rays_d = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (8, 2)) * 0.1, -jnp.ones((8, 1))], -1
    )
    out = kplane.render_rays(
        params, meta, 0.3, rays_o, rays_d, key=jax.random.PRNGKey(2),
        training=False, white_bg=True,
    )
    assert out["rgb"].shape == (8, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    # untrained white-bg scene is ~empty: acc ~ 0, rgb ~ 1
    assert float(out["acc"].mean()) < 0.1
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=0.05)


def test_keyframe_time_snap_matches_reference_rounding():
    meta = tiny_meta(num_keyframes=4, tmax=0.75)  # delta = 0.25
    t = jnp.array([[0.0], [0.1], [0.126], [0.375], [0.74], [1.0]])
    base = np.asarray(kplane.snap_to_keyframe(meta, t))[:, 0]
    # 0.375/0.25 = 1.5 -> round-half-even -> 2 -> 0.5
    np.testing.assert_allclose(base, [0.0, 0.0, 0.25, 0.5, 0.75, 0.75])


def test_checkpoint_roundtrip(tmp_path):
    from nvfi_tpu.train import checkpoint as ck

    meta = tiny_meta()
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    path = str(tmp_path / "model_00010")
    ck.save(path, params, meta, extra={"global_step": 10})
    params2, meta2, _, _, extra = ck.load(path)
    assert meta2 == meta
    assert extra["global_step"] == 10
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_upsample_preserves_function_at_corners():
    """Corner-aligned resize must preserve plane values at shared lattice
    points (align_corners invariant)."""
    meta = tiny_meta(grid_size=(8, 8, 8))
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    p2, m2 = kplane.upsample(params, meta, (15, 15, 15), meta.num_keyframes)
    # input grid index i maps to output index 2i for 8->15 (factor (15-1)/(8-1)=2)
    a = np.asarray(params["planes_space"][0])
    b = np.asarray(p2["planes_space"][0])
    np.testing.assert_allclose(b[::2, ::2], a, rtol=1e-5, atol=1e-6)


def test_extrapolation_advection_covers_past_tmax():
    """For t beyond tmax the keyframe snap clamps to the LAST keyframe and the
    offset grows to (1 - tmax) >> dt_max; the eval-time step bound
    (meta.render_adv_steps) must integrate it fully — a single RK2 step (the
    training bound) silently truncates the motion (reference integrate_pos
    while-loop, tensorf_keyframe.py:591-609)."""
    meta = tiny_meta(vel_gate=vel_mod.VelGate("aabb", eps=0.0))
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    c = 0.8
    params = constant_weight_velocity(params, [c, 0, 0, 0, 0, 0])

    xyz = jnp.array([[0.1, 0.2, -0.3]], jnp.float32)
    t = jnp.full((1, 1), 1.0, jnp.float32)
    base = kplane.snap_to_keyframe(meta, t)  # clamps to tmax = 0.75
    np.testing.assert_allclose(np.asarray(base), 0.75)

    assert meta.render_adv_steps >= int(np.ceil(0.25 / meta.dt_max))
    adv = kplane.integrate_pos(params, meta, xyz, t, base,
                               n_steps=meta.render_adv_steps)
    expect = np.asarray(xyz) - 0.25 * np.array([c, 0, 0])
    np.testing.assert_allclose(np.asarray(adv), expect, atol=1e-5)

    # the single-step (training) bound must NOT be used past tmax: it only
    # covers dt_max of the 0.25 offset
    adv1 = kplane.integrate_pos(params, meta, xyz, t, base, n_steps=1)
    np.testing.assert_allclose(
        np.asarray(adv1), np.asarray(xyz) - meta.dt_max * np.array([c, 0, 0]),
        atol=1e-5)


def test_eval_exact_meta_strips_turbo_budgets():
    """Eval meta normalization: training turbo budgets are reset to the dense
    bit-exact path; everything else (geometry, sampling semantics) is kept."""
    from dataclasses import replace
    from nvfi_tpu.fields import kplane

    meta = kplane.KPlaneMeta(
        grid_size=(16,) * 3, num_keyframes=4, tmax=0.75,
        aabb=((-2.0,) * 3, (2.0,) * 3), near_far=(2.0, 6.0),
        density_n_comp=8, app_n_comp=8, app_dim=8, density_shift=-10.0,
        distance_scale=25.0, alpha_mask_thres=1e-4,
        raymarch_weight_thres=1e-4, max_n_samples=48,
    )
    turbo = replace(meta, train_occupancy_prune=True, block_budget=0.3,
                    shade_fraction=0.1, parity_sampling=True)
    e = kplane.eval_exact_meta(turbo)
    assert e.block_budget == 1.0
    assert e.shade_fraction == 1.0
    assert not e.train_occupancy_prune
    assert e.parity_sampling  # geometry semantics preserved
    assert e.grid_size == turbo.grid_size and e.n_samples == turbo.n_samples
