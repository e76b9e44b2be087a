#!/usr/bin/env python
"""One-shot reproduction of every BASELINE.md quality row from a checkpoint.

  python scripts/eval_all.py --scene_dir logs/synth/bat30k/from_checkpoint \
      [--config configs/synth/bat.yaml] [--res 128] [--frames 128]

Runs, in order: per-view test PSNR (interpolation vs extrapolation split),
aggregate image metrics, velocity EPE + advection error vs the analytic rigid
field, and (if a MaskField checkpoint is given) segmentation metrics.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    # default None = prefer the config the TRAINER dumped into the scene dir
    # (train_nvfi.py writes <logdir>/config.yaml, mirroring the reference's
    # startup snapshot at train_nvfi.py:50-51) — evaluating a checkpoint
    # against another scene's ground truth by a stale default is exactly the
    # class of error this prevents
    parser.add_argument("--config", default=None)
    parser.add_argument("--scene_dir", required=True)
    parser.add_argument("--checkpoint", type=int, default=-1)
    parser.add_argument("--res", type=int, default=128)
    parser.add_argument("--frames", type=int, default=128)
    parser.add_argument("--alpha_grid", type=int, default=128)
    # 'orbit' = 360° novel-view sweep (harder than the reference protocol);
    # 'heldout' = two fixed held-out cameras, the reference's per-camera test
    # split (load_blender_dynamic.py:89-100) — rig scenes only, see
    # make_synthetic_scene(heldout_test=...)
    parser.add_argument("--protocol", choices=("orbit", "heldout"),
                        default="orbit")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nvfi_tpu.config import load_config
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.eval.harness import render_split
    from nvfi_tpu.eval.metrics import psnr
    from nvfi_tpu.eval.velocity_eval import advection_error, velocity_epe
    from nvfi_tpu.train import checkpoint as ck

    config_path = args.config
    if config_path is None:
        dumped = os.path.join(args.scene_dir, "config.yaml")
        config_path = dumped if os.path.exists(dumped) else "configs/synth/bat.yaml"
        print(f"[eval_all] using config {config_path}")
    cfg = load_config(config_path)
    path = ck.find_checkpoint(args.scene_dir, args.checkpoint)
    assert path, f"no checkpoint under {args.scene_dir}"
    params, meta, _, _, extra = ck.load(path)
    params = jax.tree.map(jnp.asarray, params)
    print(f"[eval_all] {path} grid={meta.grid_size} K={meta.num_keyframes} "
          f"step={extra.get('global_step')}")

    dataset = make_synthetic_scene(
        n_train=args.frames, n_val=4, n_test=8, H=args.res, W=args.res,
        tmax_frac=float(cfg.nvfi.tmax),
        white_background=bool(cfg.dataset.white_background),
        objects=str(cfg.dataset.get("synthetic_objects", "bat")),
        heldout_test=(args.protocol == "heldout"),
    )
    objects = dataset[7]["objects"]

    preds, errors = render_split(
        params, meta, dataset[:7], "test",
        white_bg=bool(cfg.dataset.white_background), alpha_grid=args.alpha_grid,
    )
    times = dataset[2]["test"]
    tmax = float(cfg.nvfi.tmax)
    interp, extrap = [], []
    for i, t in enumerate(times):
        p = psnr(preds[i], dataset[0]["test"][i])
        (interp if t <= tmax else extrap).append(p)
        print(f"[view {i}] t={t:.3f} psnr={p:.2f}")
    print(f"[test] aggregate: {errors}")
    print(f"[test] interpolation (t<=tmax) PSNR: {np.mean(interp):.2f}  "
          f"extrapolation (t>tmax) PSNR: {np.mean(extrap):.2f}")

    for t in (0.2, 0.5, 0.7):
        print(f"[velocity t={t}]", velocity_epe(params, meta, objects, t))
    print("[advection 0->0.5]", advection_error(params, meta, objects, 0.0, 0.5))


if __name__ == "__main__":
    main()
