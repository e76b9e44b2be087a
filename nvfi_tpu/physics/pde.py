"""Physics PDE regularization for the velocity field.

Re-implements reference models/nvfi.py:42-84 (``NVFi.get_vel_loss``) inside
jit with fixed shapes:

* uniform-sample (x, t) in aabb x [0, 1);
* occupancy-filter by the density at the backward-advected keyframe position
  (gradients stopped, as the reference wraps this in ``no_grad``);
* per-point Jacobian of the velocity net via ``jax.jacfwd`` — forward mode is
  the right direction here (4 inputs -> 6 outputs), cheaper than the
  reference's ``functorch jacrev`` (SURVEY.md §7.1.5) — with the primal fused
  in as aux;
* loss = 5 * mean(div^2) + 0.1 * mean(transport^2), where div = tr(dv/dx) and
  transport = (v . grad)v + dv/dt - a, with means taken over the surviving
  points (x3 components for the transport term, matching torch.mean over an
  (N, 3) tensor).

Two TPU-native twists over the reference:

1. the boolean compaction (``xyzt[alpha > 0.5]``) becomes a masked mean —
   identical value, static shapes;
2. ``occupied_budget``: the expensive second-order Jacobian runs only on a
   fixed-size uniformly-subsampled set of *occupied* points (selected by
   top-k over occupancy + noise).  The reference pays the Jacobian for all
   262144 uniform samples and discards the unoccupied majority; the subsample
   keeps the estimator unbiased (uniform among occupied) at a fraction of the
   FLOPs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import kplane
from ..fields import velocity as vel_mod


def occupancy_mask(params, meta: kplane.KPlaneMeta, xyz_norm, t):
    """Density-based point filter (reference models/nvfi.py:50-64), grad-stopped.

    Returns (N,) boolean: alpha >= alphaMask_thres with the reference's
    hardcoded ``1 - exp(-sigma * 0.01 * 25)`` proxy opacity.
    """
    base = kplane.snap_to_keyframe(meta, t)
    # t is sampled in [0, 1): for t past tmax the snapped offset exceeds
    # dt_max, and the reference advects it fully (integrate_pos while-loop,
    # models/nvfi.py:57) — use the static eval-time bound
    prev = kplane.integrate_pos(params, meta, xyz_norm, t, base,
                                n_steps=meta.render_adv_steps)
    xyzt = jnp.concatenate([prev, kplane.normalize_time(meta, base)], axis=-1)
    feat = kplane.density_feature(params, meta, xyzt)
    sigma = kplane.feature2density(meta, feat, None)
    alpha = 1.0 - jnp.exp(-sigma * 0.01 * 25.0)
    return jax.lax.stop_gradient(alpha >= meta.alpha_mask_thres)


def vel_pde_loss(params, meta: kplane.KPlaneMeta, key, n_pts: int,
                 chunk: int = 32768, occupied_budget: int | None = None,
                 alpha_state: dict | None = None):
    """Divergence-free + transport-equation loss over occupied samples.

    Jacobian points are processed in rematerialized ``lax.scan`` chunks so the
    second-order graph keeps only O(chunk) activations in HBM.

    ``alpha_state``: turbo-mode shortcut — filter by the precomputed
    time-maxed occupancy volume (one trilinear lookup) instead of the
    reference's advect-then-evaluate-density filter (11 RK2 sweeps + a
    density pass for t past tmax).  The mask is the union of per-time
    occupancy, so it keeps a superset of the reference's points; quality
    parity is checked end-to-end by scripts/turbo_quality.py.
    """
    k_x, k_t, k_sel = jax.random.split(key, 3)
    a = meta.aabb_np
    pts = jax.random.uniform(k_x, (n_pts, 3)) * (a[1] - a[0]) + a[0]
    xyz = kplane.normalize_coord(meta, pts)
    t = jax.random.uniform(k_t, (n_pts, 1))

    if alpha_state is not None:
        mask = jax.lax.stop_gradient(
            (kplane.sample_alpha(alpha_state, xyz) > 0).astype(jnp.float32)
        )
    else:
        mask = occupancy_mask(params, meta, xyz, t).astype(jnp.float32)

    if occupied_budget is not None and occupied_budget < n_pts:
        # uniform subsample among occupied: occupied score in [1,2),
        # unoccupied in [0,1) — top-k picks occupied first, randomly within
        score = mask + jax.random.uniform(k_sel, (n_pts,))
        _, sel = jax.lax.top_k(score, occupied_budget)
        sel = jax.lax.stop_gradient(sel)
        xyz = xyz[sel]
        t = t[sel]
        mask = mask[sel]
        n_pts = occupied_budget

    vel_params = params["vel"]

    def u_func_aux(xt):
        u = vel_mod.vel_accel(vel_params, xt)
        return u, u

    chunk = min(chunk, n_pts)
    assert n_pts % chunk == 0, "n_pts must be a multiple of the PDE chunk size"
    n_chunks = n_pts // chunk

    @jax.checkpoint
    def chunk_terms(params, xyz_c, t_c, mask_c):
        xyzt = jnp.concatenate([xyz_c, t_c], axis=-1)
        # one fused pass: Jacobian via forward-mode with the primal as aux
        jac, u = jax.vmap(jax.jacfwd(u_func_aux, has_aux=True))(xyzt)  # (C,6,4),(C,6)
        vel, acc = u[..., :3], u[..., 3:]
        divergence = jac[..., 0, 0] + jac[..., 1, 1] + jac[..., 2, 2]
        transport = (
            jnp.einsum("noi,ni->no", jac[..., :3, :3], vel) + jac[..., :3, 3] - acc
        )
        return (
            jnp.sum(mask_c * divergence**2),
            jnp.sum(mask_c[:, None] * transport**2),
            jnp.sum(mask_c),
        )

    if n_chunks == 1:
        div_sum, trans_sum, n_occ = chunk_terms(params, xyz, t, mask)
    else:
        def body(carry, inp):
            xyz_c, t_c, m_c = inp
            d, tr, n = chunk_terms(params, xyz_c, t_c, m_c)
            return (carry[0] + d, carry[1] + tr, carry[2] + n), None

        (div_sum, trans_sum, n_occ), _ = jax.lax.scan(
            body,
            (jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
            (
                xyz.reshape(n_chunks, chunk, 3),
                t.reshape(n_chunks, chunk, 1),
                mask.reshape(n_chunks, chunk),
            ),
        )

    denom = jnp.maximum(n_occ, 1.0)
    loss = (div_sum / denom) * 5.0 + (trans_sum / (denom * 3.0)) * 0.1
    return jnp.where(n_occ > 0, loss, 0.0)
