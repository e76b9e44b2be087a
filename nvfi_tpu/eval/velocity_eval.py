"""Velocity-field accuracy evaluation against analytic ground truth.

The synthetic scene generator knows the exact rigid velocity at every point
(data/synthetic.py scene_velocity), so — unlike the reference, which can only
validate motion indirectly through image metrics — the learned velocity field
can be scored directly: mean end-point-error (EPE) over occupied points, plus
the advection displacement error over a time interval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.synthetic import scene_velocity
from ..fields import kplane
from ..fields import velocity as vel_mod


def velocity_epe(params, meta: kplane.KPlaneMeta, objects, t: float,
                 n_pts: int = 4096, seed: int = 0):
    """Mean |v_pred - v_true| over points inside the objects at time t.

    Velocities are compared in WORLD units: the field predicts velocity in
    normalized grid coordinates per unit time, so predictions are scaled by
    aabb_size/2 before comparison.
    """
    rng = np.random.RandomState(seed)
    pts, obj_id = [], []
    for oi, obj in enumerate(objects):
        c = obj.center(t)
        d = rng.randn(n_pts // len(objects), 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        if getattr(obj, "hollow", False):
            # material lives only on the shell band (an enclosing room)
            r = obj.r - obj.SHELL * rng.rand(len(d), 1)
        else:
            r = obj.r * rng.rand(len(d), 1) ** (1 / 3)
        pts.append(c + d * r)
        obj_id.append(np.full(len(d), oi))
    pts = np.concatenate(pts).astype(np.float32)
    obj_id = np.concatenate(obj_id)

    v_true = scene_velocity(objects, pts, t)

    xyz_norm = kplane.normalize_coord(meta, pts)
    tt = jnp.full((len(pts), 1), t, jnp.float32)
    v_pred_norm = vel_mod.gated_velocity(
        params["vel"], meta.vel_gate, jnp.asarray(xyz_norm), tt
    )
    scale = meta.aabb_size / 2.0  # normalized -> world units
    v_pred = np.asarray(v_pred_norm) * scale

    epe = np.linalg.norm(v_pred - v_true, axis=-1)
    speed = np.linalg.norm(v_true, axis=-1)
    moving = np.array([np.any(o.omega) or np.any(o.v_lin) for o in objects])
    mov = moving[obj_id]
    out = {
        "epe_mean": float(epe.mean()),
        "epe_median": float(np.median(epe)),
        "true_speed_mean": float(speed.mean()),
        "relative_epe": float(epe.mean() / max(speed.mean(), 1e-9)),
        # split over moving vs static material: the headline relative_epe
        # dilutes as static geometry (room/walls) is added to a scene
        "epe_moving": float(epe[mov].mean()) if mov.any() else 0.0,
        "rel_epe_moving": float(epe[mov].mean() / max(speed[mov].mean(), 1e-9))
        if mov.any() else 0.0,
        "epe_static": float(epe[~mov].mean()) if (~mov).any() else 0.0,
    }
    return out


def advection_error(params, meta: kplane.KPlaneMeta, objects, t0: float, t1: float,
                    n_pts: int = 2048, seed: int = 0):
    """Displacement error of RK2 advection from t1 back to t0 vs the exact
    rigid motion of each object."""
    rng = np.random.RandomState(seed)
    pts0, pts1 = [], []
    for obj in objects:
        d = rng.randn(n_pts // len(objects), 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        if getattr(obj, "hollow", False):
            r = obj.r - obj.SHELL * rng.rand(len(d), 1)
        else:
            r = obj.r * 0.8 * rng.rand(len(d), 1) ** (1 / 3)
        local = d * r
        c0, c1 = obj.center(t0), obj.center(t1)
        # rigid: the offset rotates with the object
        w = np.linalg.norm(obj.omega)
        if w > 0:
            from ..data.synthetic import _rot_axis

            R0 = _rot_axis(obj.omega / w, w * t0)
            R1 = _rot_axis(obj.omega / w, w * t1)
            pts0.append(c0 + local @ R0.T)
            pts1.append(c1 + local @ R1.T)
        else:
            pts0.append(c0 + local)
            pts1.append(c1 + local)
    pts0 = np.concatenate(pts0).astype(np.float32)
    pts1 = np.concatenate(pts1).astype(np.float32)

    xyz1 = jnp.asarray(kplane.normalize_coord(meta, pts1))
    t = jnp.full((len(pts1), 1), t1, jnp.float32)
    base = jnp.full_like(t, t0)
    adv = kplane.integrate_pos(params, meta, xyz1, t, base,
                               n_steps=meta.max_adv_steps)
    adv_world = kplane.denormalize_coord(meta, np.asarray(adv))
    err = np.linalg.norm(adv_world - pts0, axis=-1)
    disp = np.linalg.norm(pts1 - pts0, axis=-1)
    return {
        "adv_err_mean": float(err.mean()),
        "adv_err_median": float(np.median(err)),
        "displacement_mean": float(disp.mean()),
    }
