"""Unsupervised 3D instance segmentation: MaskField distillation.

Re-implements reference train_segm.py:54-227 — distill a frozen NVFi scene's
motion field into a per-point K-way MaskField:

1. stratified-sample a dense volume grid, keep points whose t=0 opacity
   exceeds ``alphaMask_thres * alpha_scale`` (reference :127-150);
2. balance foreground/background by the surround box (reference :35-51);
3. forward-advect the kept t=0 points to a random t in [min_t, tmax] through
   the frozen velocity field; the displacement is the supervision flow
   (reference :162-171);
4. train the MaskField with the rigid-fit ``dynamic_loss`` (+ KNN
   ``smooth_loss`` after ``smooth_iter``) (reference :183-207).

Shape strategy: occupancy filtering + balancing run on host each iteration
(cheap, numpy), then a FIXED point budget is resampled with replacement so the
jitted flow+loss step never recompiles.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import kplane, mask_field
from ..utils.seg_loss import dynamic_loss, entropy_loss, smooth_loss
from . import checkpoint as ckpt_mod


def sample_volume_points(rng: np.random.RandomState, bounds: np.ndarray, n: int,
                         perturb: bool = True) -> np.ndarray:
    """Stratified 3D grid sampling (reference utils/point_util.py:4-22).

    bounds (3, 2) -> (n, n, n, 3) points.
    """
    t_vals = np.linspace(0.0, 1.0, n + 1)[:, None]
    xyz_vals = bounds[:, 0] * (1 - t_vals) + bounds[:, 1] * t_vals
    lower, upper = xyz_vals[:-1], xyz_vals[1:]
    if perturb:
        pts = lower + (upper - lower) * rng.rand(n, 3)
    else:
        pts = 0.5 * (lower + upper)
    x, y, z = np.meshgrid(pts[:, 0], pts[:, 1], pts[:, 2], indexing="ij")
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def balanced_sample(rng: np.random.RandomState, xyz: np.ndarray,
                    object_bounds: np.ndarray) -> np.ndarray:
    """FG/BG balance by the surround box (reference train_segm.py:35-51)."""
    fg = np.all((xyz > object_bounds[:, 0]) & (xyz < object_bounds[:, 1]), axis=-1)
    xyz_fg, xyz_bg = xyz[fg], xyz[~fg]
    if len(xyz_bg) > len(xyz_fg) and len(xyz_fg) > 0:
        idx = rng.choice(len(xyz_bg), len(xyz_fg), replace=False)
        xyz_bg = xyz_bg[idx]
    return np.concatenate([xyz_fg, xyz_bg], axis=0)


class SegmTrainer:
    """Drives MaskField training against a frozen NVFi scene."""

    def __init__(self, cfg, params, meta: kplane.KPlaneMeta, seed: int = 0,
                 point_budget: int = 8192):
        self.cfg = cfg
        self.scene_params = params
        self.meta = meta
        self.rng = np.random.RandomState(seed)
        self.key = jax.random.PRNGKey(seed)
        self.point_budget = point_budget

        seg = cfg.segmentation
        self.n_object = int(seg.n_object)
        self.n_iters = int(seg.n_iters)
        self.smooth_iter = int(seg.smooth_iter)
        self.lrate = float(seg.lrate)
        self.lrate_decay = float(seg.lrate_decay)
        self.lrate_decay_step = int(seg.lrate_decay_step)
        self.loss_smooth_w = float(seg.loss_smooth_w)
        self.alpha_scale = float(seg.alpha_scale)
        self.n_sample_res = int(seg.n_sample_res)
        self.min_t = float(seg.min_t)

        self.key, k0 = jax.random.split(self.key)
        self.mask_params = mask_field.init(
            k0, n_layer=4, n_dim=128, input_dim=3, skips=(),
            mask_dim=self.n_object,
        )
        # surround box for FG/BG balancing, if the scene has one
        if meta.vel_gate.mode == "sur":
            b = np.asarray(meta.vel_gate.bounds)  # normalized coords
            a = meta.aabb_np
            unnorm = (b + 1.0) * (a[1] - a[0]) / 2.0 + a[0]
            self.object_bounds = unnorm.T  # (3, 2)
        else:
            self.object_bounds = None

        self._build_jits()

    def _build_jits(self):
        meta = self.meta
        scene = self.scene_params

        @jax.jit
        def alpha_at_t0(xyz_norm):
            t0 = jnp.zeros((*xyz_norm.shape[:-1], 1), jnp.float32)
            xyzt = jnp.concatenate([xyz_norm, kplane.normalize_time(meta, t0)], -1)
            feat = kplane.density_feature(scene, meta, xyzt)
            sigma = kplane.feature2density(meta, feat, None)
            return 1.0 - jnp.exp(-sigma * 0.01)

        @jax.jit
        def flow_to(xyz_norm, t_target):
            t0 = jnp.zeros((xyz_norm.shape[0], 1), jnp.float32)
            t = jnp.full_like(t0, t_target)
            # forward advection t0 -> t = integrate_pos(xyz, t0, base=t)
            xyz2 = kplane.integrate_pos(scene, meta, xyz_norm, t0, t,
                                        n_steps=meta.max_adv_steps)
            return xyz2 - xyz_norm

        @functools.partial(jax.jit, static_argnames=("use_smooth",))
        def seg_step(mask_params, opt_m, opt_v, step, xyz, flow, lr, use_smooth):
            def loss_fn(mp):
                mask = mask_field.apply(mp, xyz)
                l_dyn, _ = dynamic_loss(xyz[None], mask[None], flow[None])
                l_smooth = smooth_loss(xyz[None], mask[None], k=4, radius=0.01)
                l_ent = entropy_loss(mask[None])
                loss = l_dyn + (self.loss_smooth_w * l_smooth if use_smooth else 0.0)
                return loss, {"dynamic": l_dyn, "smooth": l_smooth, "entropy": l_ent,
                              "loss": loss}

            grads, metrics = jax.grad(loss_fn, has_aux=True)(mask_params)
            # Adam(0.9, 0.999) as the reference's segm optimizer (:113)
            b1, b2, eps = 0.9, 0.999, 1e-8
            step = step + 1
            t = step.astype(jnp.float32)

            def upd(p, g, m, v):
                m = b1 * m + (1 - b1) * g
                v = b2 * v + (1 - b2) * g * g
                return p - lr * (m / (1 - b1**t)) / (jnp.sqrt(v / (1 - b2**t)) + eps), m, v

            flat_p, tdef = jax.tree.flatten(mask_params)
            flat_g = tdef.flatten_up_to(grads)
            flat_m = tdef.flatten_up_to(opt_m)
            flat_v = tdef.flatten_up_to(opt_v)
            out = [upd(*args) for args in zip(flat_p, flat_g, flat_m, flat_v)]
            return (
                tdef.unflatten([o[0] for o in out]),
                tdef.unflatten([o[1] for o in out]),
                tdef.unflatten([o[2] for o in out]),
                step,
                metrics,
            )

        self._alpha_at_t0 = alpha_at_t0
        self._flow_to = flow_to
        self._seg_step = seg_step

    def _sample_points(self):
        """Host-side: stratified grid -> occupancy filter -> balance -> fixed budget."""
        meta = self.meta
        bounds = meta.aabb_np.T  # (3, 2)
        xyz = sample_volume_points(self.rng, bounds, self.n_sample_res).reshape(-1, 3)
        xyz_norm = kplane.normalize_coord(meta, xyz)
        alpha = np.asarray(self._alpha_at_t0(jnp.asarray(xyz_norm)))
        keep = alpha > (meta.alpha_mask_thres * self.alpha_scale)
        xyz = xyz[keep]
        if len(xyz) == 0:
            xyz = sample_volume_points(self.rng, bounds, 8).reshape(-1, 3)
        if self.object_bounds is not None:
            xyz = balanced_sample(self.rng, xyz, self.object_bounds)
        # fixed budget: resample with replacement
        idx = self.rng.choice(len(xyz), self.point_budget, replace=True)
        return kplane.normalize_coord(meta, xyz[idx]).astype(np.float32)

    def train(self, logdir: str | None = None, log_fn=None, iters: int | None = None):
        opt_m = jax.tree.map(jnp.zeros_like, self.mask_params)
        opt_v = jax.tree.map(jnp.zeros_like, self.mask_params)
        step = jnp.zeros((), jnp.int32)
        iters = iters if iters is not None else self.n_iters
        metrics = {}
        for it in range(1, iters + 1):
            xyz = jnp.asarray(self._sample_points())
            t = self.min_t + (self.meta.tmax - self.min_t) * self.rng.rand()
            flow = self._flow_to(xyz, jnp.float32(t))
            lr = self.lrate * (self.lrate_decay ** (it / self.lrate_decay_step))
            self.mask_params, opt_m, opt_v, step, metrics = self._seg_step(
                self.mask_params, opt_m, opt_v, step, xyz, flow,
                jnp.float32(lr), use_smooth=it >= self.smooth_iter,
            )
            if log_fn and (it % 50 == 0 or it == 1):
                log_fn({"it": it, **{k: float(v) for k, v in metrics.items()}})
            if logdir and it % int(self.cfg.segmentation.save_freq) == 0:
                self.save(os.path.join(logdir, f"mask_{it:06d}"))
        return metrics

    def save(self, path: str):
        ckpt_mod.save(path, self.mask_params, self.meta,
                      extra={"n_object": self.n_object})

    def restore(self, path: str):
        params, _, _, _, extra = ckpt_mod.load(path)
        self.mask_params = jax.tree.map(jnp.asarray, params)
        return extra
