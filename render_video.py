#!/usr/bin/env python
"""Render a novel-view video along the spiral render path at arbitrary times.

Covers the reference's render_poses/render_times capability
(datasets/load_blender.py:132-141: a spiral of poses with t swept over [0,1])
— application 4 of SURVEY.md (novel-view synthesis at arbitrary t).

  python render_video.py --config <yaml> [--checkpoint N] [--synthetic]
                         [--n_frames 40] [--fps 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=int, default=-1)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synth_res", type=int, default=128)
    parser.add_argument("--n_frames", type=int, default=40)
    parser.add_argument("--fps", type=int, default=10)
    parser.add_argument("--radius", type=float, default=4.0)
    parser.add_argument("--outdir", type=str, default="")
    parser.add_argument("--alpha_grid", type=int, default=128)
    parser.add_argument("--depth", action="store_true", help="also save depth maps")
    parser.add_argument("--scene_dir", type=str, default="",
                        help="override checkpoint dir (default: "
                             "<logdir>/<project>/<name>, as the other drivers)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from nvfi_tpu.config import load_config
    from nvfi_tpu.data.blender import _spherical_pose
    from nvfi_tpu.fields import kplane
    from nvfi_tpu.render import rays as rays_mod
    from nvfi_tpu.render.renderer import render_image
    from nvfi_tpu.train import checkpoint as ckpt_mod
    from nvfi_tpu.utils.viz import visualize_depth

    cfg = load_config(args.config)
    logdir = args.scene_dir or os.path.join(
        str(cfg.experiment.logdir), str(cfg.wandb.project), str(cfg.wandb.name)
    )
    path = ckpt_mod.find_checkpoint(logdir, args.checkpoint)
    assert path, f"no checkpoint under {logdir}"
    params, meta, _, _, _ = ckpt_mod.load(path)
    meta = kplane.eval_exact_meta(meta)  # strip training turbo budgets
    params = jax.tree.map(jnp.asarray, params)
    print(f"[video] ckpt {path} grid {meta.grid_size} K {meta.num_keyframes}")

    H = W = args.synth_res
    focal = 0.5 * W / np.tan(0.5 * 0.6911112)

    outdir = args.outdir or os.path.join(logdir, "render_path")
    os.makedirs(outdir, exist_ok=True)

    alpha_state, _ = kplane.update_alpha_mask(
        params, meta, tuple(min(g, args.alpha_grid) for g in meta.grid_size)
    )

    frames = []
    thetas = np.linspace(-180, 180, args.n_frames, endpoint=False)
    times = np.linspace(0.0, 1.0, args.n_frames)
    for i, (th, t) in enumerate(zip(thetas, times)):
        pose = _spherical_pose(float(th), -30.0, args.radius)
        cam = rays_mod.Camera(pose, H, W, focal, near=meta.near_far[0], far=meta.near_far[1])
        out = render_image(
            params, meta, float(t), cam.rays_o.reshape(H, W, 3),
            cam.rays_d.reshape(H, W, 3),
            white_bg=bool(cfg.dataset.white_background), alpha_state=alpha_state,
        )
        img = (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(outdir, f"r_{i:03d}.png"))
        if args.depth:
            d, _ = visualize_depth(out["depth"])
            Image.fromarray((d * 255).astype(np.uint8)).save(
                os.path.join(outdir, f"d_{i:03d}.png")
            )
        frames.append(img)
        print(f"[video] frame {i + 1}/{args.n_frames}", flush=True)

    # animated GIF (PIL-native; no external video deps in this image)
    gif = [Image.fromarray(f) for f in frames]
    gif[0].save(
        os.path.join(outdir, "video.gif"), save_all=True, append_images=gif[1:],
        duration=int(1000 / args.fps), loop=0,
    )
    print(f"[video] wrote {outdir}/video.gif")


if __name__ == "__main__":
    main()
