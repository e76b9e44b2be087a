"""Static TensoRF training (BASELINE config 1: single-frame reconstruction).

Drives the VM/CP static field (fields/tensorf_vm.py) with the same staged
coarse-to-fine loop as the dynamic trainer: in-jit pixel sampling + ray
generation, L1/TV regularizers with per-iter decay, per-group Adam, upsample
schedule (reference train_nvfi.py --static with a TensorVMSplit-style model;
the reference's static subclasses are bitrotted — SURVEY.md §2.3 — so this is
the working equivalent).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import tensorf_vm
from ..eval.metrics import mse2psnr
from . import optim
from .trainer import TrainHP, _rays_from_pose, exp_schedule, n_to_reso


def static_meta_from_cfg(cfg, aabb, grid_size, near_far) -> tensorf_vm.StaticMeta:
    n = cfg.nvfi
    return tensorf_vm.StaticMeta(
        grid_size=tuple(int(g) for g in grid_size),
        aabb=tuple(tuple(float(v) for v in row) for row in np.asarray(aabb)),
        near_far=tuple(float(v) for v in near_far),
        density_n_comp=int(n.density_n_comp[0]),
        app_n_comp=int(n.appearance_n_comp[0]),
        app_dim=int(n.app_dim),
        density_shift=float(n.density_shift),
        distance_scale=float(n.distance_scale),
        alpha_mask_thres=float(n.alphaMask_thres),
        raymarch_weight_thres=float(n.rayMarch_weight_thres),
        decomposition="CP" if "CP" in str(n.model_name) else "VM",
        fea2dense=str(n.fea2denseAct),
        shading_mode=str(n.shadingMode),
        pos_pe=int(n.pos_pe),
        view_pe=int(n.view_pe),
        fea_pe=int(n.fea_pe),
        feature_c=int(n.featureC),
        step_ratio=float(n.step_ratio),
        max_n_samples=int(n.max_n_samples),
    )


def make_static_step(meta: tensorf_vm.StaticMeta, hp: TrainHP, H, W, focal):
    n_rays = hp.n_rays
    lr_factor = hp.lr_factor

    def loss_fn(params, key, frame_idx, global_step, poses, images):
        k_pix, k_render = jax.random.split(key)
        pix = jax.random.choice(k_pix, H * W, (n_rays,), replace=False)
        ii, jj = pix // W, pix % W
        pose = poses[frame_idx]
        ray_o, ray_d = _rays_from_pose(pose, H, W, focal, ii, jj)
        target = images[frame_idx][ii, jj]
        out = tensorf_vm.render_rays(
            params, meta, ray_o, ray_d, key=k_render, training=True,
            white_bg=hp.white_bg,
        )
        rgb_loss = jnp.mean((out["rgb"] - target) ** 2)
        reg_scale = lr_factor ** (global_step.astype(jnp.float32) + 1.0)
        loss = rgb_loss
        if hp.L1_weight_initial > 0:
            loss = loss + hp.L1_weight_initial * reg_scale * tensorf_vm.density_l1(params, meta)
        if hp.TV_weight_density > 0:
            loss = loss + hp.TV_weight_density * reg_scale * tensorf_vm.tv_loss_density(params, meta)
        if hp.TV_weight_app > 0:
            loss = loss + hp.TV_weight_app * reg_scale * tensorf_vm.tv_loss_app(params, meta)
        return loss, {"loss": loss, "rgb_loss_0": rgb_loss}

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, frame_idx, global_step, poses, images):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, key, frame_idx, global_step, poses, images
        )
        lr_tree = optim.make_lr_tree(params, hp.lr_grid, hp.lr_net)
        lr_scale = lr_factor ** opt_state["step"].astype(jnp.float32)
        params, opt_state = optim.apply_updates(params, grads, opt_state, lr_tree, lr_scale)
        return params, opt_state, metrics

    return step


class StaticTrainer:
    """t=0-only TensoRF VM/CP training with the coarse-to-fine schedule."""

    def __init__(self, cfg, dataset, seed: int | None = None):
        self.cfg = cfg
        self.hp = TrainHP.from_cfg(cfg)
        (self.all_imgs, self.all_poses, self.all_times, self.counts,
         _, _, (self.H, self.W, self.focal)) = dataset[:7]

        aabb = np.stack(
            [np.asarray(cfg.nvfi.bbox_x), np.asarray(cfg.nvfi.bbox_y),
             np.asarray(cfg.nvfi.bbox_z)], axis=-1,
        )
        res0 = n_to_reso(self.hp.n_voxel_init, aabb)
        near_far = (float(cfg.dataset.near), float(cfg.dataset.far))
        self.meta = static_meta_from_cfg(cfg, aabb, res0, near_far)
        seed = int(cfg.experiment.randomseed) if seed is None else seed
        self.key = jax.random.PRNGKey(seed)
        self.rng = np.random.RandomState(seed)
        self.key, k0 = jax.random.split(self.key)
        self.params = tensorf_vm.init_params(k0, self.meta)
        self.global_step = 0
        self.alpha_state = None
        n_up = len(self.hp.upsamp_list)
        self.n_voxel_list = exp_schedule(self.hp.n_voxel_init, self.hp.n_voxel_final, n_up)

        split = "init" if self.counts.get("init") else "train"
        self.split = split
        self.poses_buf = jnp.asarray(
            np.stack([np.asarray(p, np.float32) for p in self.all_poses[split]])
        )
        self.images_buf = jnp.asarray(np.asarray(self.all_imgs[split], np.float32))

    def train(self, iters=None, log_fn=None):
        hp = self.hp
        iters = hp.train_iters if iters is None else iters
        step_fn = make_static_step(self.meta, hp, self.H, self.W, self.focal)
        opt_state = optim.init_state(self.params)
        n_frames = self.counts[self.split]
        metrics = {}
        t0 = time.time()
        for it in range(self.global_step, iters):
            self.key, k = jax.random.split(self.key)
            self.params, opt_state, metrics = step_fn(
                self.params, opt_state, k, jnp.int32(self.rng.randint(n_frames)),
                jnp.int32(it), self.poses_buf, self.images_buf,
            )
            if log_fn and (it % hp.print_every == 0 or it == iters - 1):
                m = {k2: float(v) for k2, v in metrics.items()}
                m.update(it=it, psnr_0=mse2psnr(m["rgb_loss_0"] or 1.0),
                         elapsed=time.time() - t0)
                log_fn(m)
            if it in hp.update_alphamask_list:
                # alpha-mask + shrink stage event (reference train_nvfi.py:332-341)
                reso_mask = tuple(min(g, 200) for g in self.meta.grid_size)
                self.alpha_state, new_aabb = tensorf_vm.update_alpha_mask(
                    self.params, self.meta, reso_mask
                )
                self.params, self.meta = tensorf_vm.shrink(self.params, self.meta, new_aabb)
                step_fn = make_static_step(self.meta, hp, self.H, self.W, self.focal)
                opt_state = optim.init_state(self.params)
            if it in hp.upsamp_list:
                n_vox = self.n_voxel_list.pop(0)
                res = n_to_reso(n_vox, self.meta.aabb_np)
                self.params, self.meta = tensorf_vm.upsample(self.params, self.meta, res)
                step_fn = make_static_step(self.meta, hp, self.H, self.W, self.focal)
                opt_state = optim.init_state(self.params)
            self.global_step = it + 1
        self.opt_state = opt_state
        return metrics
