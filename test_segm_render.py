#!/usr/bin/env python
"""Render + evaluate instance segmentation (AP@50, PQ, F1, mIoU).

CLI mirrors reference test_segm_render.py:19-32 (with its argparse bugs fixed
— SURVEY.md §2.3): renders test views with ``transfer_vel=True`` so all
geometry is evaluated in the canonical t=0 frame through the velocity field,
composites the MaskField along each ray, then Hungarian-aligns labels and
scores against GT masks.

  python test_segm_render.py --config <yaml> [--checkpoint N] [--ckpt_segm PATH]
                             [--synthetic]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=int, default=-1)
    parser.add_argument("--ckpt_segm", type=str, default="")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--outdir", type=str, default="")
    parser.add_argument("--alpha_grid", type=int, default=128)
    parser.add_argument("--n_views", type=int, default=0, help="limit test views")
    parser.add_argument("--scene_dir", type=str, default="",
                        help="override the NVFi checkpoint directory")
    parser.add_argument("--export_points", type=int, default=0,
                        help="also export 3D debug artifacts: an N-res volume "
                             "sweep classified by the MaskField as segm-colored "
                             "mesh balls, flow arrows through the velocity "
                             "field, the model aabb wireframe (PLY, any "
                             "viewer) + a headless PNG snapshot "
                             "(utils/point_viz — the reference's open3d "
                             "tooling, point_visual_util.py:17-192, headless)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from nvfi_tpu.config import load_config
    from nvfi_tpu.train import checkpoint as ckpt_mod
    from nvfi_tpu.eval import segm_metrics as sm
    from nvfi_tpu.render import rays as rays_mod
    from nvfi_tpu.render.renderer import render_image
    from nvfi_tpu.fields import kplane

    cfg = load_config(args.config)
    scene_logdir = args.scene_dir or os.path.join(
        str(cfg.experiment.logdir), str(cfg.wandb.project), str(cfg.wandb.name)
    )
    path = ckpt_mod.find_checkpoint(scene_logdir, args.checkpoint)
    assert path, f"no NVFi checkpoint under {scene_logdir}"
    params, meta, _, _, _ = ckpt_mod.load(path)
    meta = kplane.eval_exact_meta(meta)  # strip training turbo budgets
    params = jax.tree.map(jnp.asarray, params)

    segm_dir = os.path.join("logs_segm", f"{cfg.wandb.name}_k={cfg.segmentation.n_object}")
    mask_path = args.ckpt_segm or os.path.join(segm_dir, "mask_final")
    mask_params, _, _, _, extra = ckpt_mod.load(mask_path)
    mask_params = jax.tree.map(jnp.asarray, mask_params)
    n_object = int(extra.get("n_object", cfg.segmentation.n_object))
    meta = replace(meta, mask_dim=n_object)

    # dataset with GT masks
    if args.synthetic:
        from nvfi_tpu.data import make_synthetic_scene

        data = make_synthetic_scene(
            n_train=8, n_val=2, n_test=8, H=64, W=64,
            tmax_frac=float(cfg.nvfi.tmax),
            white_background=bool(cfg.dataset.white_background),
            objects=str(cfg.dataset.get("synthetic_objects", "bat")),
        )
        imgs, poses, times = data[0]["test"], data[1]["test"], data[2]["test"]
        segms = data[7]["segm"]["test"]
        H, W, focal = data[6]
    else:
        from nvfi_tpu.data import load_blender_data_segm

        basedir = str(cfg.dataset.basedir).replace("data", "data_segm_allframe")
        imgs, poses, segms, times, _, _, _, (H, W, focal) = load_blender_data_segm(
            basedir, bool(cfg.dataset.half_res), int(cfg.dataset.test_skip),
            bool(cfg.dataset.white_background),
        )

    outdir = args.outdir or os.path.join(segm_dir, "test_render")
    os.makedirs(outdir, exist_ok=True)

    alpha_state, _ = kplane.update_alpha_mask(
        params, meta, tuple(min(g, args.alpha_grid) for g in meta.grid_size),
        transfer=True,
    )

    n_views = min(len(poses), args.n_views) if args.n_views else len(poses)
    poses, times, segms = poses[:n_views], times[:n_views], segms[:n_views]
    pred_masks = []
    for vid in range(len(poses)):
        cam = rays_mod.Camera(poses[vid], H, W, focal,
                              near=meta.near_far[0], far=meta.near_far[1])
        out = render_image(
            params, meta, float(times[vid]),
            cam.rays_o.reshape(H, W, 3), cam.rays_d.reshape(H, W, 3),
            white_bg=bool(cfg.dataset.white_background), transfer_vel=True,
            alpha_state=alpha_state, mask_params=mask_params,
        )
        pred_masks.append(out["mask"])
        np.save(os.path.join(outdir, f"r_{vid:03d}_segm.npy"), out["mask"])
    pred_masks = np.stack(pred_masks)  # (V, H, W, K)

    # metrics (reference test_segm_render.py:115-180)
    ap_iou, ap_matched, ap_conf, n_inst = [], [], [], 0
    mious = []
    for vid in range(len(poses)):
        gt = np.asarray(segms[vid]).reshape(-1)
        pm = pred_masks[vid].reshape(-1, n_object)
        i, m, c, n = sm.eval_segm(gt, pm)
        ap_iou.append(i); ap_matched.append(m); ap_conf.append(c); n_inst += n
        mious.append(sm.clustering_miou(pm, sm.compress_label(gt)))

    AP = sm.calculate_AP(np.concatenate(ap_matched), np.concatenate(ap_conf), n_inst)
    PQ, F1, Pre, Rec = sm.calculate_PQ_F1(
        np.concatenate(ap_iou), np.concatenate(ap_matched), n_inst
    )
    results = {"AP@50": AP, "PQ@50": PQ, "F1@50": F1, "Pre@50": Pre,
               "Rec@50": Rec, "mIoU": float(np.mean(mious))}
    print(results)
    with open(os.path.join(outdir, "segm_metrics.txt"), "w") as f:
        f.write(str(results))

    if args.export_points:
        from nvfi_tpu.fields import mask_field
        from nvfi_tpu.train.segm import sample_volume_points
        from nvfi_tpu.utils import point_viz as pv

        rng = np.random.RandomState(0)
        a = meta.aabb_np
        xyz = sample_volume_points(rng, np.stack([a[0], a[1]], -1),
                                   int(args.export_points)).reshape(-1, 3)
        xyz_n = np.asarray(kplane.normalize_coord(meta, jnp.asarray(xyz)))
        t0 = jnp.zeros((len(xyz), 1), jnp.float32)
        xyzt = jnp.concatenate(
            [jnp.asarray(xyz_n), kplane.normalize_time(meta, t0)], -1)
        sigma = kplane.feature2density(
            meta, kplane.density_feature(params, meta, xyzt), None)
        keep = np.asarray(1.0 - jnp.exp(-sigma * 0.01)) > 1e-3
        xyz, xyz_n = xyz[keep], xyz_n[keep]
        labels = np.argmax(
            np.asarray(mask_field.apply(mask_params, jnp.asarray(xyz_n))), -1)

        # forward flow t0 -> mid-window through the velocity field
        t_tgt = 0.5 * meta.tmax
        bt = jnp.full((len(xyz), 1), t_tgt, jnp.float32)
        adv = kplane.integrate_pos(params, meta, jnp.asarray(xyz_n),
                                   jnp.zeros_like(bt), bt,
                                   n_steps=meta.max_adv_steps)
        flow = (np.asarray(adv) - xyz_n) * (a[1] - a[0]) / 2.0  # world units

        pv.save_ply_mesh(os.path.join(outdir, "points_segm.ply"),
                         pv.pc_segm_to_sphere(xyz, labels, radius=0.01))
        pv.save_ply_mesh(os.path.join(outdir, "flow_arrows.ply"),
                         pv.pc_flow_to_arrows(xyz, flow, radius=0.004))
        (bbox,) = pv.build_bbox3d(pv.bound_to_box([np.stack([a[0], a[1]], -1)]))
        pv.save_ply_mesh(os.path.join(outdir, "aabb.ply"),
                         {"vertices": bbox["points"], "edges": bbox["edges"],
                          "colors": np.tile([[0.0, 1.0, 0.0]], (8, 1))})
        pv.snapshot_png(os.path.join(outdir, "points_segm.png"),
                        pointclouds=[pv.build_pointcloud_segm(xyz, labels)],
                        boxes=[bbox], flows=(xyz[::17], flow[::17]),
                        lim=float(np.abs(a).max()))
        print(f"[viz] {keep.sum()} occupied points -> "
              f"{outdir}/points_segm.ply, flow_arrows.ply, aabb.ply, "
              "points_segm.png")


if __name__ == "__main__":
    main()
