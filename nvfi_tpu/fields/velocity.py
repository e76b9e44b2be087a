"""Velocity field: rigid-motion-basis MLP with boundary gating.

Re-designs reference models/velocity_field.py for JAX:

* ``VelBasis`` (reference :54-98): input (x,y,z,t) -> PositionEncoder(3 freqs)
  -> two 6-layer 128-wide MLPs (SiLU weights-net for velocity, ReLU for
  acceleration), each emitting 6 coefficients over a rigid-motion basis
  (3 translations + 3 instantaneous rotations); full forward returns
  cat[v, a] in R^6.
* boundary gating replaces the reference's boolean-indexed ``VelocityAABB`` /
  ``VelocityAABBSur`` wrappers (reference :21-51) with a multiplicative mask —
  identical values, fixed shapes (SURVEY.md §7.1.2).

The gate mode and its constants live in the static field meta so the jitted
render specializes on them.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.encoding import position_encoder
from .mlp import mlp_init, mlp_apply

_ENCODE_DIM = 3
_IN_DIM = 4 + 4 * 2 * _ENCODE_DIM  # 28
_HIDDEN = 128  # reference width (models/velocity_field.py:60-61)


class VelGate(NamedTuple):
    """Static gate spec: 'aabb' zeroes velocity within ``eps`` of the [-1,1]^3
    boundary; 'sur' zeroes it outside a normalized surround box.

    ``world`` carries the sur box in WORLD coordinates so ``bounds`` can be
    re-normalized when the scene aabb changes (kplane.shrink at an alpha-mask
    event).  The reference computes bounds once from the INITIAL aabb
    (models/velocity_field.py:44) and never exercises shrink on sur scenes
    (config/InDoorSeg/*: update_AlphaMask_list []), so its stale-bounds case
    is latent; our sur-family throughput mode does shrink, hence the fix."""

    mode: str  # 'aabb' | 'sur'
    eps: float = 0.03
    bounds: tuple = ()  # ((xmin,ymin,zmin),(xmax,ymax,zmax)) in normalized coords
    world: tuple = ()  # same box in world coords ('sur' mode; () for 'aabb')


def init_velocity_params(key, hidden: int = _HIDDEN):
    """``hidden`` widens both 6-layer nets past the reference's 128 (an
    extrapolation-gap capacity experiment, NEXT.md §6); the apply path reads
    layer shapes from the params, so only init changes."""
    layers = [_IN_DIM] + [hidden] * 5 + [6]
    kv, ka = jax.random.split(key)
    return {
        "weight_net": mlp_init(kv, layers),
        "a_weight_net": mlp_init(ka, layers),
    }


def _rigid_bases(xyz):
    """Velocity basis b1..b6 and acceleration basis (reference :83-98)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    v_basis = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], -1),
            jnp.stack([zeros, ones, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
            jnp.stack([zeros, z, -y], -1),
            jnp.stack([-z, zeros, x], -1),
            jnp.stack([y, -x, zeros], -1),
        ],
        axis=-2,
    )  # (..., 6, 3)
    a_basis = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], -1),
            jnp.stack([zeros, ones, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
            jnp.stack([zeros, -y, -z], -1),
            jnp.stack([-x, zeros, -z], -1),
            jnp.stack([-x, -y, zeros], -1),
        ],
        axis=-2,
    )
    return v_basis, a_basis


def vel_accel(params, xt):
    """Full forward: (..., 4) xyzt -> (..., 6) cat[velocity, acceleration]."""
    enc = position_encoder(xt, _ENCODE_DIM)
    w = mlp_apply(params["weight_net"], enc, jax.nn.silu)
    aw = mlp_apply(params["a_weight_net"], enc, jax.nn.relu)
    v_basis, a_basis = _rigid_bases(xt[..., :3])
    v = jnp.einsum("...ij,...i->...j", v_basis, w)
    a = jnp.einsum("...ij,...i->...j", a_basis, aw)
    return jnp.concatenate([v, a], axis=-1)


def get_vel(params, xt):
    """Velocity only (reference VelBasis.get_vel :77-81)."""
    enc = position_encoder(xt, _ENCODE_DIM)
    w = mlp_apply(params["weight_net"], enc, jax.nn.silu)
    v_basis, _ = _rigid_bases(xt[..., :3])
    return jnp.einsum("...ij,...i->...j", v_basis, w)


def gated_velocity(params, gate: VelGate, xyz, t):
    """Boundary-gated velocity at normalized positions (fixed-shape form of
    reference VelocityAABB/VelocityAABBSur.forward)."""
    xt = jnp.concatenate([xyz, t], axis=-1)
    v = get_vel(params, xt)
    if gate.mode == "sur":
        lo = jnp.asarray(gate.bounds[0])
        hi = jnp.asarray(gate.bounds[1])
        inside = jnp.all((xyz >= lo) & (xyz <= hi), axis=-1, keepdims=True)
    else:
        e = gate.eps
        inside = jnp.all((xyz >= -1 + e) & (xyz <= 1 - e), axis=-1, keepdims=True)
    return v * inside.astype(v.dtype)
