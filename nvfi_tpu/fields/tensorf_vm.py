"""Static TensoRF fields: VM (plane+line) and CP (rank-1) decompositions.

TPU-native re-design of reference models/tensorf_base.py:600-1151
(``TensorVMSplit`` / ``TensorCP``).  Note the reference static subclasses are
bitrotted (their ``__init__`` signatures no longer match ``TensorBase``,
SURVEY.md §2.3); this module implements the *intended* live math: density is
``sum_i sum_c plane_i[c] * line_i[c]`` over the three (plane, line) pairs with
matMode=((0,1),(0,2),(1,2)) / vecMode=(2,1,0), appearance concatenates the
three per-pair products and decodes through a shared linear basis
(reference :795-885).

Shares sampling / compositing / shaders with the K-plane module; static
rendering is exposed through ``render_rays`` with a ``StaticMeta``.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_1d, grid_sample_2d
from ..ops.compositing import raw2alpha
from ..ops.resize import resize_bilinear_ac
from .mlp import linear_init
from .shaders import init_shader, make_shader
from .kplane import MAT_SPACE, sample_alpha

VEC_MODE = (2, 1, 0)  # reference models/tensorf_base.py:165


@dataclass(frozen=True)
class StaticMeta:
    grid_size: tuple
    aabb: tuple
    near_far: tuple
    density_n_comp: int
    app_n_comp: int
    app_dim: int
    density_shift: float
    distance_scale: float
    alpha_mask_thres: float
    raymarch_weight_thres: float
    decomposition: str = "VM"  # 'VM' | 'CP'
    fea2dense: str = "softplus"
    shading_mode: str = "MLP_PE"
    pos_pe: int = 6
    view_pe: int = 6
    fea_pe: int = 6
    feature_c: int = 128
    step_ratio: float = 0.5
    max_n_samples: int = 1024

    @property
    def aabb_np(self):
        return np.asarray(self.aabb, dtype=np.float32)

    @property
    def aabb_size(self):
        a = self.aabb_np
        return a[1] - a[0]

    @property
    def step_size(self) -> float:
        units = self.aabb_size / (np.asarray(self.grid_size) - 1)
        return float(np.mean(units) * self.step_ratio)

    @property
    def n_samples(self) -> int:
        diag = float(np.linalg.norm(self.aabb_size))
        return min(self.max_n_samples, int(diag / self.step_size) + 1)


def init_params(key, meta: StaticMeta) -> dict:
    """Init VM or CP decomposition (reference init_one_svd* :631-727, 983-1003).

    VM planes/lines use gaussian init scaled 0.1 (softplus density) as the
    reference does; CP lines use scale 0.2.
    """
    gs = meta.grid_size
    keys = jax.random.split(key, 16)
    params = {}
    if meta.decomposition == "VM":
        def plane(k, i, c, scale):
            m0, m1 = MAT_SPACE[i]
            return scale * jax.random.normal(k, (gs[m1], gs[m0], c), jnp.float32)

        def line(k, i, c, scale):
            return scale * jax.random.normal(k, (gs[VEC_MODE[i]], c), jnp.float32)

        params["density_plane"] = [plane(keys[i], i, meta.density_n_comp, 0.1) for i in range(3)]
        params["density_line"] = [line(keys[3 + i], i, meta.density_n_comp, 0.1) for i in range(3)]
        params["app_plane"] = [plane(keys[6 + i], i, meta.app_n_comp, 0.1) for i in range(3)]
        params["app_line"] = [line(keys[9 + i], i, meta.app_n_comp, 0.1) for i in range(3)]
        params["basis_mat"] = linear_init(keys[12], 3 * meta.app_n_comp, meta.app_dim, bias=False)
    elif meta.decomposition == "CP":
        def line(k, i, c, scale):
            return scale * jax.random.normal(k, (gs[VEC_MODE[i]], c), jnp.float32)

        params["density_line"] = [line(keys[i], i, meta.density_n_comp, 0.2) for i in range(3)]
        params["app_line"] = [line(keys[3 + i], i, meta.app_n_comp, 0.2) for i in range(3)]
        params["basis_mat"] = linear_init(keys[6], meta.app_n_comp, meta.app_dim, bias=False)
    else:
        raise ValueError(meta.decomposition)
    params["shader"] = init_shader(
        keys[13], meta.shading_mode, meta.app_dim, meta.view_pe, meta.pos_pe,
        meta.fea_pe, meta.feature_c,
    )
    return params


def normalize_coord(meta: StaticMeta, xyz):
    a = meta.aabb_np
    return (xyz - a[0]) * (2.0 / (a[1] - a[0])) - 1.0


def density_feature(params, meta: StaticMeta, xyz):
    """(..., 3) normalized -> (...,) density feature."""
    if meta.decomposition == "CP":
        prod = None
        for i in range(3):
            s = grid_sample_1d(params["density_line"][i], xyz[..., VEC_MODE[i]])
            prod = s if prod is None else prod * s
        return jnp.sum(prod, axis=-1)
    total = None
    for i in range(3):
        m0, m1 = MAT_SPACE[i]
        p = grid_sample_2d(params["density_plane"][i], jnp.stack([xyz[..., m0], xyz[..., m1]], -1))
        l = grid_sample_1d(params["density_line"][i], xyz[..., VEC_MODE[i]])
        contrib = jnp.sum(p * l, axis=-1)
        total = contrib if total is None else total + contrib
    return total


def app_feature(params, meta: StaticMeta, xyz):
    """(..., 3) normalized -> (..., app_dim)."""
    if meta.decomposition == "CP":
        prod = None
        for i in range(3):
            s = grid_sample_1d(params["app_line"][i], xyz[..., VEC_MODE[i]])
            prod = s if prod is None else prod * s
        return prod @ params["basis_mat"]["w"]
    feats = []
    for i in range(3):
        m0, m1 = MAT_SPACE[i]
        p = grid_sample_2d(params["app_plane"][i], jnp.stack([xyz[..., m0], xyz[..., m1]], -1))
        l = grid_sample_1d(params["app_line"][i], xyz[..., VEC_MODE[i]])
        feats.append(p * l)
    return jnp.concatenate(feats, axis=-1) @ params["basis_mat"]["w"]


def feature2density(meta: StaticMeta, x):
    if meta.fea2dense == "softplus":
        return jax.nn.softplus(x + meta.density_shift)
    if meta.fea2dense == "relu":
        return jax.nn.relu(x)
    if meta.fea2dense == "relu_abs":
        return jnp.abs(x)
    raise ValueError(meta.fea2dense)


def sample_ray(meta: StaticMeta, rays_o, rays_d, n_samples, training, key):
    """Same uniform-in-box sampler as the keyframe model (tensorf_base.py:290-314)."""
    a = meta.aabb_np
    near, far = meta.near_far
    inside_any = jnp.any(jnp.all((rays_o >= a[0]) & (rays_o <= a[1]), axis=-1))
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (a[1] - rays_o) / vec
    rate_b = (a[0] - rays_o) / vec
    t_min_c = jnp.clip(jnp.max(jnp.minimum(rate_a, rate_b), axis=-1), near, far)
    t_min = jnp.where(inside_any, near, t_min_c)
    rng = jnp.arange(n_samples, dtype=rays_o.dtype)[None, :]
    if training:
        rng = rng + jax.random.uniform(key, (rays_o.shape[0], 1), rays_o.dtype)
    z_vals = t_min[:, None] + rng * meta.step_size
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    valid = jnp.all((pts >= a[0]) & (pts <= a[1]), axis=-1)
    return pts, z_vals, valid


def render_rays(params, meta: StaticMeta, rays_o, rays_d, *, key, training, white_bg,
                alpha_state=None, n_samples=None):
    """Static volume render (reference TensorBase.forward :532-597)."""
    if n_samples is None:
        n_samples = meta.n_samples
    k_strat, k_bg = (jax.random.split(key) if key is not None else (None, None))
    pts, z_vals, valid = sample_ray(meta, rays_o, rays_d, n_samples, training, k_strat)
    dists = jnp.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])], axis=-1
    )
    viewdirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    xyz = normalize_coord(meta, pts)

    if alpha_state is not None and not training:
        valid = valid & (sample_alpha(alpha_state, xyz) > 0)

    sigma = feature2density(meta, density_feature(params, meta, xyz))
    sigma = jnp.where(valid, sigma, 0.0)
    alpha, weight, bg_w = raw2alpha(sigma, dists * meta.distance_scale)
    app_mask = weight > meta.raymarch_weight_thres

    feats = app_feature(params, meta, xyz)
    shader = make_shader(meta.shading_mode, meta.view_pe, meta.pos_pe, meta.fea_pe)
    rgb_pts = shader(params["shader"], xyz, viewdirs, feats, None)
    rgb_pts = jnp.where(app_mask[..., None], rgb_pts, 0.0)

    acc = jnp.sum(weight, axis=-1)
    rgb = jnp.sum(weight[..., None] * rgb_pts, axis=-2)
    if white_bg:
        rgb = rgb + (1.0 - acc[..., None])
    elif training:
        coin = jax.random.uniform(k_bg, ()) < 0.5
        rgb = jnp.where(coin, rgb + (1.0 - acc[..., None]), rgb)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    depth = jnp.sum(weight * z_vals, axis=-1) + (1.0 - acc) * meta.near_far[1]
    return {"rgb": rgb, "depth": depth, "acc": acc, "weight": weight}


def upsample(params, meta: StaticMeta, res_target: tuple):
    """Bilinear-upsample planes + lines (reference up_sampling_VM :887-924)."""
    res_target = tuple(int(r) for r in res_target)
    new_params = dict(params)
    if meta.decomposition == "VM":
        for name in ("density_plane", "app_plane"):
            new_params[name] = [
                resize_bilinear_ac(p, (res_target[MAT_SPACE[i][1]], res_target[MAT_SPACE[i][0]]), axes=(0, 1))
                for i, p in enumerate(params[name])
            ]
    for name in ("density_line", "app_line"):
        new_params[name] = [
            resize_bilinear_ac(p, (res_target[VEC_MODE[i]],), axes=(0,))
            for i, p in enumerate(params[name])
        ]
    return new_params, replace(meta, grid_size=res_target)


def density_l1(params, meta: StaticMeta):
    total = 0.0
    if meta.decomposition == "VM":
        for p in params["density_plane"]:
            total = total + jnp.mean(jnp.abs(p))
    for p in params["density_line"]:
        total = total + jnp.mean(jnp.abs(p))
    return total


def tv_loss_density(params, meta: StaticMeta):
    """Plane TV (reference TensorVMSplit.TV_loss_density: planes only x1e-2)."""
    from .kplane import _tv

    total = 0.0
    if meta.decomposition == "VM":
        for p in params["density_plane"]:
            total = total + _tv(p, False) * 1e-2
    return total


def tv_loss_app(params, meta: StaticMeta):
    from .kplane import _tv

    total = 0.0
    if meta.decomposition == "VM":
        for p in params["app_plane"]:
            total = total + _tv(p, False) * 1e-2
    return total


def compute_dense_alpha(params, meta: StaticMeta, grid_size: tuple, chunk: int = 262144):
    """Dense static alpha grid (reference TensorBase.getDenseAlpha :356-376:
    alpha = 1 - exp(-sigma * 0.01) with the hardcoded 0.01 step)."""
    gx, gy, gz = grid_size
    a = meta.aabb_np
    lin = [np.linspace(0.0, 1.0, g, dtype=np.float32) for g in (gx, gy, gz)]
    mesh = np.stack(np.meshgrid(*lin, indexing="ij"), axis=-1)
    dense_xyz = a[0] * (1 - mesh) + a[1] * mesh
    flat = normalize_coord(meta, dense_xyz.reshape(-1, 3)).astype(np.float32)
    total = flat.shape[0]
    chunk = min(chunk, total)

    @jax.jit
    def alpha_chunk(params, xyz_c):
        sigma = feature2density(meta, density_feature(params, meta, xyz_c))
        return 1.0 - jnp.exp(-sigma * 0.01 * meta.distance_scale)

    pad = (-total) % chunk
    padded = np.concatenate([flat, np.zeros((pad, 3), np.float32)]) if pad else flat
    out = [np.asarray(alpha_chunk(params, jnp.asarray(padded[i:i + chunk])))
           for i in range(0, padded.shape[0], chunk)]
    alpha = np.concatenate(out)
    if pad:
        alpha = alpha[:-pad]
    return jnp.asarray(alpha.reshape(gx, gy, gz)), jnp.asarray(dense_xyz)


def update_alpha_mask(params, meta: StaticMeta, grid_size: tuple):
    """Binary occupancy volume + shrunk aabb (reference updateAlphaMask
    :378-405), stored (gz,gy,gx) like the dynamic model's mask."""
    from ..ops.resize import max_pool3d_same

    alpha, dense_xyz = compute_dense_alpha(params, meta, grid_size)
    alpha = jnp.clip(alpha, 0, 1).transpose(2, 1, 0)
    alpha = max_pool3d_same(alpha, kernel=3)
    alpha = (alpha >= meta.alpha_mask_thres).astype(jnp.float32)

    alpha_np = np.asarray(alpha)
    dense_np = np.asarray(dense_xyz).transpose(2, 1, 0, 3)
    occ = alpha_np > 0.5
    if occ.any():
        valid_xyz = dense_np[occ]
        new_aabb = np.stack([valid_xyz.min(0), valid_xyz.max(0)])
    else:
        new_aabb = meta.aabb_np.copy()
    return {"volume": jnp.asarray(alpha_np), "aabb": jnp.asarray(meta.aabb_np)}, new_aabb


def shrink(params, meta: StaticMeta, new_aabb):
    """Crop planes + lines to a tightened aabb (reference TensorBase.shrink
    :926-968), with the reference's voxel-boundary aabb correction."""
    a = meta.aabb_np
    gs = np.asarray(meta.grid_size)
    units = meta.aabb_size / (gs - 1)
    xyz_min, xyz_max = np.asarray(new_aabb)
    t_l = np.round(np.round((xyz_min - a[0]) / units)).astype(np.int64)
    b_r = np.round((xyz_max - a[0]) / units).astype(np.int64) + 1
    b_r = np.minimum(b_r, gs)
    t_l = np.clip(t_l, 0, None)

    new_params = dict(params)
    if meta.decomposition == "VM":
        for name in ("density_plane", "app_plane"):
            new_params[name] = [
                p[t_l[MAT_SPACE[i][1]]:b_r[MAT_SPACE[i][1]],
                  t_l[MAT_SPACE[i][0]]:b_r[MAT_SPACE[i][0]], :]
                for i, p in enumerate(params[name])
            ]
    for name in ("density_line", "app_line"):
        new_params[name] = [
            p[t_l[VEC_MODE[i]]:b_r[VEC_MODE[i]], :]
            for i, p in enumerate(params[name])
        ]

    t_l_r = t_l / (gs - 1)
    b_r_r = (b_r - 1) / (gs - 1)
    correct = np.zeros((2, 3), dtype=np.float32)
    correct[0] = (1 - t_l_r) * a[0] + t_l_r * a[1]
    correct[1] = (1 - b_r_r) * a[0] + b_r_r * a[1]
    new_meta = replace(
        meta,
        grid_size=tuple(int(v) for v in (b_r - t_l)),
        aabb=tuple(tuple(float(v) for v in row) for row in correct),
    )
    return new_params, new_meta
