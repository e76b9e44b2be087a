"""Rendering orchestrator: jit-compiled chunked image rendering.

Replaces reference models/renderer.py's python chunk loop with a fixed-size
chunked driver around one jitted render function — every chunk reuses a single
compiled executable (the last chunk is padded to the static chunk size, so no
shape-polymorphic recompiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import kplane


@functools.partial(
    jax.jit,
    static_argnums=(1,),
    static_argnames=("training", "white_bg", "transfer_vel", "n_samples"),
)
def _render_chunk(params, meta, t, rays_o, rays_d, key, alpha_state, mask_params,
                  *, training, white_bg, transfer_vel, n_samples):
    return kplane.render_rays(
        params, meta, t, rays_o, rays_d, key=key, training=training,
        white_bg=white_bg, transfer_vel=transfer_vel, alpha_state=alpha_state,
        n_samples=n_samples, mask_params=mask_params,
    )


def render_image(
    params,
    meta: kplane.KPlaneMeta,
    t: float,
    rays_o: np.ndarray,
    rays_d: np.ndarray,
    *,
    white_bg: bool,
    transfer_vel: bool = False,
    alpha_state=None,
    mask_params=None,
    chunk: int = 8192,
    key=None,
):
    """Render a full image (eval mode, no stratified jitter, alpha pruning on).

    Args:
      rays_o, rays_d: (H, W, 3) host arrays (from rays.ray_bundle).
    Returns:
      dict of maps shaped (H, W, ...) as numpy arrays.
    """
    H, W = rays_o.shape[:2]
    o = rays_o.reshape(-1, 3)
    d = rays_d.reshape(-1, 3)
    n = o.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)

    outs = []
    for start in range(0, n, chunk):
        co = o[start : start + chunk]
        cd = d[start : start + chunk]
        pad = chunk - co.shape[0]
        if pad:
            co = np.concatenate([co, np.zeros((pad, 3), co.dtype)])
            cd = np.concatenate([cd, np.tile(d[-1:], (pad, 1))])
        res = _render_chunk(
            params, meta, jnp.float32(t), jnp.asarray(co), jnp.asarray(cd), key,
            alpha_state, mask_params,
            training=False, white_bg=white_bg, transfer_vel=transfer_vel,
            n_samples=meta.n_samples,
        )
        nd = float(res.get("dropped_blocks", 0.0))
        if nd > 0:
            # budget clipped real work: the render is no longer exact
            print(f"[render] WARNING: {int(nd)} active sample-blocks dropped "
                  f"by block_budget={meta.block_budget}; raise the budget")
        res = {k: np.asarray(v) for k, v in res.items() if k in ("rgb", "depth", "acc", "mask")}
        if pad:
            res = {k: v[:-pad] for k, v in res.items()}
        outs.append(res)

    merged = {k: np.concatenate([o_[k] for o_ in outs]) for k in outs[0]}
    merged["rgb"] = merged["rgb"].reshape(H, W, 3)
    merged["depth"] = merged["depth"].reshape(H, W)
    merged["acc"] = merged["acc"].reshape(H, W)
    merged["mask"] = merged["mask"].reshape(H, W, -1)
    return merged
