#!/usr/bin/env python
"""Inner reference-eval driver: runs INSIDE /root/reference (cwd) with the
wandb/lpips/torchvision stubs on PYTHONPATH.

Replicates render_test_evaluation (/root/reference/train_nvfi.py:395-459)
without its `ext` NameError bug: load the saved checkpoint with the
reference's own load_model_checkpoint, rebuild the alpha mask with the
reference's updateAlphaMask, render the test split with the reference
renderer, and write per-view PSNR + interp/extrap means to <out>/ref_eval.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np
import torch
import yaml

sys.path.insert(0, "/root/reference")

TMAX = 0.75


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from utils.cfgnode import CfgNode
    from models.camera import Camera
    from datasets import load_blender_data
    from train_nvfi import load_model_checkpoint

    with open(args.cfg) as f:
        cfg = CfgNode(yaml.load(f, Loader=yaml.FullLoader))
    device = "cpu"

    ckpt_dir = os.path.join(cfg.experiment.logdir, cfg.wandb.project, cfg.wandb.name)
    paths = sorted(glob.glob(os.path.join(ckpt_dir, "*.ckpt")))
    assert paths, f"no reference checkpoint under {ckpt_dir}"
    print(f"[ref_eval] loading {paths[-1]}", flush=True)
    ckpt = torch.load(paths[-1], map_location=device)
    nvfi, renderer = load_model_checkpoint(cfg, ckpt, device)
    nvfi.eval()
    renderer.eval()

    print("[ref_eval] updateAlphaMask ...", flush=True)
    nvfi.nvfi.updateAlphaMask(nvfi.nvfi.gridSize)
    print("[ref_eval] alpha mask done", flush=True)

    all_targets, all_poses, all_times, counts, _, _, (H, W, focal) = load_blender_data(
        basedir=cfg.dataset.basedir,
        half_res=cfg.dataset.half_res,
        testskip=cfg.dataset.test_skip,
        white_background=cfg.dataset.white_background,
    )

    os.makedirs(os.path.join(args.out, "ref_test_img"), exist_ok=True)
    rows, preds = [], []
    with torch.no_grad():
        for idx in range(counts["test"]):
            pose = all_poses["test"][idx]
            target = all_targets["test"][idx]
            t = float(all_times["test"][idx])
            camera = Camera(pose, H, W, focal, target, cfg.dataset.near, cfg.dataset.far)
            rgb_map, depth_map, acc_map, weights, velocity = renderer.render(
                t, camera.rays.to(device),
                white_background=cfg.dataset.white_background, mode="test",
            )
            img = rgb_map.cpu().numpy().reshape(H, W, 3)
            preds.append(img)
            gt = np.asarray(target, dtype=np.float32).reshape(H, W, 3)
            mse = float(np.mean((img - gt) ** 2))
            p = 10.0 * np.log10(1.0 / mse)
            rows.append({"i": idx, "t": t, "psnr": p})
            print(f"[ref_eval] view {idx} t={t:.3f} psnr={p:.2f}", flush=True)
            try:
                from PIL import Image

                Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                    os.path.join(args.out, "ref_test_img", f"r_{idx:03d}.png"))
            except Exception:
                pass

    np.save(os.path.join(args.out, "ref_test_preds.npy"), np.stack(preds))
    res = {
        "per_view": rows,
        "interp_psnr": float(np.mean([r["psnr"] for r in rows if r["t"] <= TMAX])),
        "extrap_psnr": float(np.mean([r["psnr"] for r in rows if r["t"] > TMAX])),
        "checkpoint": paths[-1],
    }
    with open(os.path.join(args.out, "ref_eval.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(f"[ref_eval] interp={res['interp_psnr']:.2f} extrap={res['extrap_psnr']:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
