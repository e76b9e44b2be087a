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


def occupancy_mask(params, meta: kplane.KPlaneMeta, xyz_norm, t,
                   n_steps: int | None = None):
    """Density-based point filter (reference models/nvfi.py:50-64), grad-stopped.

    Returns (N,) boolean: alpha >= alphaMask_thres with the reference's
    hardcoded ``1 - exp(-sigma * 0.01 * 25)`` proxy opacity.
    """
    base = kplane.snap_to_keyframe(meta, t)
    # t is sampled in [0, 1): for t past tmax the snapped offset exceeds
    # dt_max, and the reference advects it fully (integrate_pos while-loop,
    # models/nvfi.py:57) — default to the static eval-time bound; callers that
    # know every t in the batch is within dt_max of its keyframe pass 1
    if n_steps is None:
        n_steps = meta.render_adv_steps
    prev = kplane.integrate_pos(params, meta, xyz_norm, t, base,
                                n_steps=n_steps)
    xyzt = jnp.concatenate([prev, kplane.normalize_time(meta, base)], axis=-1)
    feat = kplane.density_feature(params, meta, xyzt)
    sigma = kplane.feature2density(meta, feat, None)
    alpha = 1.0 - jnp.exp(-sigma * 0.01 * 25.0)
    return jax.lax.stop_gradient(alpha >= meta.alpha_mask_thres)


def vel_pde_loss(params, meta: kplane.KPlaneMeta, key, n_pts: int,
                 chunk: int = 32768, occupied_budget: int | None = None,
                 alpha_state: dict | None = None,
                 prefilter_state: dict | None = None):
    """Divergence-free + transport-equation loss over occupied samples.

    Jacobian points are processed in rematerialized ``lax.scan`` chunks so the
    second-order graph keeps only O(chunk) activations in HBM.

    ``alpha_state``: opt-in shortcut — REPLACE the reference's
    advect-then-evaluate-density filter (11 RK2 sweeps + a density pass for t
    past tmax) with one trilinear lookup in the precomputed time-maxed
    occupancy volume.  The mask is the union of per-time occupancy, so it
    keeps a superset of the reference's points and measurably dilutes the
    loss (BASELINE.md turbo table) — default OFF.

    ``prefilter_state``: the turbo default — the occupancy volume only ROUTES
    the Jacobian budget: candidates are pre-screened by one dilated occupancy
    lookup, the budget is drawn uniformly among pre-passing points, and the
    reference's exact advect+density filter then runs on just the selected
    ``occupied_budget`` points instead of all ``n_pts``.  The time-maxed,
    corner-dilated mask is APPROXIMATELY a superset of per-time density
    occupancy (it is binarized at grid nodes and maxed over a discrete time
    sweep, so sub-voxel or between-sweep-time occupancy can slip through);
    to the extent the superset property holds — the corner dilation buys a
    full cell of slack in space — uniform-among-(mask ∧ density-occupied)
    equals uniform-among-density-occupied, i.e. the reference estimator at
    ~n_pts/budget (8x) less filter work.  The end-to-end turbo-vs-dense
    quality table (BASELINE.md) is the backstop for the approximation.
    """
    k_x, k_t, k_sel = jax.random.split(key, 3)
    a = meta.aabb_np
    pts = jax.random.uniform(k_x, (n_pts, 3)) * (a[1] - a[0]) + a[0]
    xyz = kplane.normalize_coord(meta, pts)

    # Stratified time sampling with proportional allocation: n*tmax points in
    # [0, tmax) and n*(1-tmax) in [tmax, 1) — the same marginal U[0,1) the
    # reference draws (models/nvfi.py:47), but now each bucket's advection
    # depth is statically known: within the training window the keyframe snap
    # leaves |offset| <= dt_max (ONE exact RK2 step), while only the
    # extrapolation bucket needs the full ceil((1-tmax)/dt_max) bound.  The
    # reference's while-loop does exactly this per point, data-dependently;
    # the split recovers it with static shapes at ~1/3 the advection cost.
    split = (
        alpha_state is None and meta.use_vel
        and 0.0 < meta.tmax < 1.0 and meta.num_keyframes > 1
    )
    if split:
        n1 = int(round(n_pts * meta.tmax))
        n1 = min(max(n1, 0), n_pts)
        n2 = n_pts - n1
        u = jax.random.uniform(k_t, (n_pts, 1))
        t = jnp.concatenate(
            [u[:n1] * meta.tmax, meta.tmax + u[n1:] * (1.0 - meta.tmax)], axis=0
        )
    else:
        t = jax.random.uniform(k_t, (n_pts, 1))

    def budget_select(score_noise, b, xyz_b, t_b):
        """Uniform subsample among score>=1 points: scores of passing points
        land in [1,2), failing in [0,1) — top-k picks passing first,
        uniformly at random within each class."""
        _, sel = jax.lax.top_k(score_noise, b)
        sel = jax.lax.stop_gradient(sel)
        return xyz_b[sel], t_b[sel]

    if (prefilter_state is not None and occupied_budget is not None
            and occupied_budget < n_pts):
        pre = jax.lax.stop_gradient(
            kplane.sample_occupied(prefilter_state, xyz, meta)
        ).astype(jnp.float32)
        noise = jax.random.uniform(k_sel, (n_pts,))
        if split and n1 > 0 and n2 > 0:
            # keep the time strata through the selection (static shapes);
            # clamp both bucket budgets into [1, stratum size] — proportional
            # rounding can otherwise produce b2 <= 0 (tmax near 1 with a tiny
            # budget) or b2 > n2, which would fail at trace time with an
            # opaque top_k error (advisor round-3 finding)
            assert occupied_budget >= 2, (
                f"occupied_budget={occupied_budget} too small for the "
                f"2-stratum time split (needs >= 1 point per stratum)"
            )
            b1 = min(n1, max(1, int(round(occupied_budget * meta.tmax))))
            b2 = occupied_budget - b1
            if not (1 <= b2 <= n2):
                b2 = min(max(b2, 1), n2)
                b1 = occupied_budget - b2
            assert 1 <= b1 <= n1 and 1 <= b2 <= n2, (
                f"infeasible PDE strata split: budget={occupied_budget} "
                f"n1={n1} n2={n2} -> b1={b1} b2={b2}"
            )
            xyz1, t1 = budget_select((pre + noise)[:n1], b1, xyz[:n1], t[:n1])
            xyz2, t2 = budget_select((pre + noise)[n1:], b2, xyz[n1:], t[n1:])
            mask = jnp.concatenate([
                occupancy_mask(params, meta, xyz1, t1, n_steps=1),
                occupancy_mask(params, meta, xyz2, t2,
                               n_steps=meta.render_adv_steps),
            ]).astype(jnp.float32)
            xyz = jnp.concatenate([xyz1, xyz2])
            t = jnp.concatenate([t1, t2])
        else:
            xyz, t = budget_select(pre + noise, occupied_budget, xyz, t)
            mask = occupancy_mask(params, meta, xyz, t).astype(jnp.float32)
        n_pts = occupied_budget
    else:
        if alpha_state is not None:
            mask = jax.lax.stop_gradient(
                (kplane.sample_alpha(alpha_state, xyz, meta) > 0).astype(jnp.float32)
            )
        elif split and n1 > 0 and n2 > 0:
            mask = jnp.concatenate([
                occupancy_mask(params, meta, xyz[:n1], t[:n1], n_steps=1),
                occupancy_mask(params, meta, xyz[n1:], t[n1:],
                               n_steps=meta.render_adv_steps),
            ]).astype(jnp.float32)
        else:
            mask = occupancy_mask(params, meta, xyz, t).astype(jnp.float32)

        if occupied_budget is not None and occupied_budget < n_pts:
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
