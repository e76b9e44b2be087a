"""Evaluation harness: render a split and compute image metrics.

Equivalent of reference train_nvfi.py:395-459 (``render_test_evaluation``):
rebuild the alpha mask, render every pose in the split at its time, save PNGs,
and report MSE/PSNR/SSIM(/LPIPS).  The test split extends past the training
tmax, so this measures future-frame extrapolation (SURVEY.md §3.2).
"""

from __future__ import annotations

import os

import numpy as np

from ..fields import kplane
from ..render import rays as rays_mod
from ..render.renderer import render_image
from . import metrics as metrics_mod


def save_png(path: str, img: np.ndarray):
    from PIL import Image

    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def save_gif_time_sweep(
    params, meta: kplane.KPlaneMeta, dataset, path: str, *, white_bg: bool,
    n_frames: int = 16, view: int = 0, max_res: int = 128, chunk: int = 4096,
    transfer_vel: bool = False, alpha_state=None,
):
    """Render a fixed val/test pose swept over t in [0, 1] and save a GIF
    (the reference's wandb video panel, train_nvfi.py:311-324).

    Returns the (T, H, W, 3) frame stack.
    """
    import imageio

    meta = kplane.eval_exact_meta(meta)
    _, all_poses, _, counts, _, _, (H, W, focal) = dataset[:7]
    split = "val" if counts.get("val") else "test"
    stride = max(1, int(np.ceil(max(H, W) / max_res)))
    Hs, Ws, fs = H // stride, W // stride, focal / stride
    cam = rays_mod.Camera(all_poses[split][view], Hs, Ws, fs,
                          near=meta.near_far[0], far=meta.near_far[1])
    frames = []
    for t in np.linspace(0.0, 1.0, n_frames):
        out = render_image(
            params, meta, float(t),
            cam.rays_o.reshape(Hs, Ws, 3), cam.rays_d.reshape(Hs, Ws, 3),
            white_bg=white_bg, chunk=chunk, transfer_vel=transfer_vel,
            alpha_state=alpha_state,
        )
        frames.append(out["rgb"])
    frames = np.stack(frames)
    imageio.mimsave(path, (np.clip(frames, 0, 1) * 255).astype(np.uint8), loop=0)
    return frames


def render_split(
    params,
    meta: kplane.KPlaneMeta,
    dataset,
    split: str = "test",
    *,
    white_bg: bool,
    alpha_state=None,
    update_alpha: bool = True,
    transfer_vel: bool = False,
    savedir: str | None = None,
    chunk: int = 4096,
    mask_params=None,
    alpha_grid: int = 200,
    max_views: int = 0,
    sparse_budget: float | None = None,
):
    """Render all views of a split; returns (preds (N,H,W,3), metrics dict).

    The meta's training-time turbo budgets are RESET (``kplane.eval_exact_meta``)
    — a turbo checkpoint's probed budgets are calibrated for train rays and
    can truncate full-frame eval renders.  ``sparse_budget``: opt-in
    block-sparse budget for faster eval renders (e.g. 0.5); exactness is still
    ENFORCED: any render that drops an active block or an above-threshold
    shade sample raises instead of feeding an inexact image into the metric
    tables.
    """
    all_imgs, all_poses, all_times, counts, _, _, (H, W, focal) = dataset[:7]
    meta = kplane.eval_exact_meta(meta)
    if update_alpha and alpha_state is None:
        alpha_state, _ = kplane.update_alpha_mask(
            params, meta, tuple(min(g, alpha_grid) for g in meta.grid_size),
            transfer=transfer_vel,
        )
    if sparse_budget:
        from dataclasses import replace

        meta = replace(meta, block_budget=float(sparse_budget))
    if savedir:
        os.makedirs(savedir, exist_ok=True)

    n_views = counts[split] if not max_views else min(counts[split], max_views)
    preds = []
    for idx in range(n_views):
        cam = rays_mod.Camera(
            all_poses[split][idx], H, W, focal,
            near=meta.near_far[0], far=meta.near_far[1],
        )
        out = render_image(
            params, meta, float(all_times[split][idx]),
            cam.rays_o.reshape(H, W, 3), cam.rays_d.reshape(H, W, 3),
            white_bg=white_bg, transfer_vel=transfer_vel, alpha_state=alpha_state,
            chunk=chunk, mask_params=mask_params,
        )
        if out.get("dropped", 0.0) > 0:
            raise RuntimeError(
                f"inexact eval render (view {idx}): {int(out['dropped'])} "
                f"active blocks/shade samples dropped at block_budget="
                f"{meta.block_budget}, shade_fraction={meta.shade_fraction}; "
                "raise the budget or pass sparse_budget=0 for the dense path"
            )
        preds.append(out["rgb"])
        if savedir:
            save_png(os.path.join(savedir, f"r_{idx:03d}.png"), out["rgb"])
            # depth panel (reference saves/wandb-logs depth maps alongside
            # rgb, train_nvfi.py:311-324); near/far-normalized jet colormap
            from ..utils.viz import visualize_depth

            save_png(os.path.join(savedir, f"r_{idx:03d}_depth.png"),
                     visualize_depth(out["depth"], minmax=meta.near_far)[0])
    preds = np.stack(preds)
    gts = np.asarray(all_imgs[split][:n_views], dtype=np.float32)
    errors = metrics_mod.estim_error(preds, gts)
    if savedir:
        metrics_mod.save_error(errors, savedir)
    return preds, errors
