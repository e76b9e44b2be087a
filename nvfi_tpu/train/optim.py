"""Per-group Adam with exponential per-step learning-rate decay.

The reference uses ``torch.optim.Adam(grad_vars, betas=(0.9, 0.99))`` with two
parameter groups — grids at lr_grid (0.02) and networks (basis mats, shader,
velocity) at lr_net (1e-3) (reference models/tensorf_keyframe.py:539-550) —
and multiplies every group's lr by ``lr_factor`` each iteration
(reference train_nvfi.py:90-94,248-249).

Implemented as a pure pytree transform: the per-leaf base lr lives in an
``lr_tree`` mirroring the params, and the decay enters as a traced scalar
``lr_scale = lr_factor ** step`` so the whole schedule stays inside jit.
Matches torch.Adam bias correction and eps placement exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

B1, B2 = 0.9, 0.99
EPS = 1e-8


def make_lr_tree(params: dict, lr_grid: float, lr_net: float, lr_vel=None) -> dict:
    """Reference param grouping: planes at lr_grid, velocity at lr_vel,
    everything else at lr_net (reference tensorf_keyframe.py:539-550 +
    train_nvfi.py:90-94: get_optparam_groups(lr_grid, lr_net, lr_vel))."""
    grid_keys = {"planes_space", "planes_time",
                 "density_plane", "density_line", "app_plane", "app_line"}
    if lr_vel is None:
        lr_vel = lr_net

    def assign(path_key, subtree):
        lr = lr_grid if path_key in grid_keys else (lr_vel if path_key == "vel" else lr_net)
        return jax.tree.map(lambda _: lr, subtree)

    return {k: assign(k, v) for k, v in params.items()}


def init_state(params):
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {"m": zeros, "v": jax.tree.map(jnp.zeros_like, params), "step": jnp.zeros((), jnp.int32)}


def apply_updates(params, grads, state, lr_tree, lr_scale):
    """One Adam step.  ``lr_scale`` is a traced scalar multiplying every leaf lr."""
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - B1**t
    bc2 = 1.0 - B2**t

    def upd(p, g, m, v, lr):
        m = B1 * m + (1 - B1) * g
        v = B2 * v + (1 - B2) * g * g
        mhat = m / bc1
        vhat = v / bc2
        return p - lr_scale * lr * mhat / (jnp.sqrt(vhat) + EPS), m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])
    flat_lr = treedef.flatten_up_to(lr_tree)
    out = [upd(p, g, m, v, lr) for p, g, m, v, lr in zip(flat_p, flat_g, flat_m, flat_v, flat_lr)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, {"m": new_m, "v": new_v, "step": step}
