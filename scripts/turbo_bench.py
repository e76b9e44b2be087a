#!/usr/bin/env python
"""Measure the opt-in turbo mode on a TRAINED checkpoint (honest setting:
the alpha mask of a converged scene, not a fresh init).

Times, on the real chip:
  1. train step, dense parity path        (reference semantics)
  2. train step, turbo: alpha-pruned sampling + block-sparse budget
  3. eval image render, dense vs block-sparse (both alpha-pruned, as the
     reference's eval is)
and reports the dropped-block counters that certify exactness.

  python scripts/turbo_bench.py --scene_dir logs/synth/bat30k_r2 [--budget 0.35]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from dataclasses import replace


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--checkpoint", type=int, default=-1)
    ap.add_argument("--budget", type=float, default=0.0,
                    help="block budget; 0 = calibrate with the production "
                         "numpy probe (train/turbo.py)")
    ap.add_argument("--n_rays", type=int, default=8192)
    ap.add_argument("--config", default="configs/synth/bat.yaml")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nvfi_tpu.config import load_config
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.train import checkpoint as ck
    from nvfi_tpu.train.trainer import Trainer
    from nvfi_tpu.fields import kplane
    from nvfi_tpu.render.renderer import render_image
    from nvfi_tpu.render import rays as rays_mod

    path = ck.find_checkpoint(args.scene_dir, args.checkpoint)
    assert path, f"no checkpoint under {args.scene_dir}"
    params, meta, _, alpha_state, extra = ck.load(path)
    params = jax.tree.map(jnp.asarray, params)
    print(f"[turbo] ckpt {path} grid={meta.grid_size} step={extra.get('global_step')}",
          flush=True)

    cfg = load_config(args.config)
    cfg.renderer.n_rays = args.n_rays
    cfg.renderer.batch_size = 262144
    cfg.nvfi.compute_dtype = "bfloat16"
    cfg.nvfi.N_voxel_init = int(cfg.nvfi.N_voxel_final)
    cfg.nvfi.upsamp_list = []
    dataset = make_synthetic_scene(n_train=16, n_val=1, n_test=1, H=256, W=256,
                                   n_times=16)
    ds7 = dataset[:7]

    if alpha_state is None:
        print("[turbo] building alpha mask (dense 60-t sweep)...", flush=True)
        alpha_state, _ = kplane.update_alpha_mask(
            params, replace(meta, compute_dtype="bfloat16"),
            tuple(min(g, 200) for g in meta.grid_size))
    occ = float(jnp.mean(alpha_state["volume"]))
    print(f"[turbo] occupancy fraction = {occ:.4f}", flush=True)

    shade = 0.25
    if args.budget <= 0.0:
        from nvfi_tpu.train import turbo as turbo_mod

        poses = np.stack([np.asarray(p, np.float32) for p in ds7[1]["train"]])
        args.budget, shade = turbo_mod.measure_block_budget(
            replace(meta, compute_dtype="bfloat16"), alpha_state, poses,
            256, 256, ds7[6][2], args.n_rays, with_shade=True,
        )
        print(f"[turbo] probe-calibrated block_budget = {args.budget:.3f} "
              f"shade_fraction = {shade:.3f}", flush=True)

    def time_trainer(turbo: bool):
        tr = Trainer(cfg, ds7, mode="static_dynamic")
        # adopt the trained state at the bench model scale; deep-copy because
        # the jitted step donates its params argument (the first timed run
        # would delete the shared checkpoint arrays)
        tr.params = jax.tree.map(jnp.array, params)
        tr.meta = replace(
            meta, compute_dtype="bfloat16",
            train_occupancy_prune=turbo,
            block_budget=args.budget if turbo else 1.0,
            shade_fraction=shade if turbo else meta.shade_fraction,
        )
        tr.alpha_state = alpha_state if turbo else None
        tr._step_cache = {}
        m = tr.train(iters=3)
        float(m["loss"])  # sync
        t0 = time.time()
        m = tr.train(iters=tr.global_step + 10)
        float(m["loss"])
        dt = (time.time() - t0) / 10
        rays = 2 * args.n_rays / dt
        print(f"[turbo] train {'TURBO' if turbo else 'dense'}: "
              f"{dt * 1e3:.1f} ms/step -> {rays:,.0f} rays/s "
              f"dropped={float(m.get('dropped_blocks', 0.0)):.0f}", flush=True)
        return rays

    r_dense = time_trainer(False)
    r_turbo = time_trainer(True)

    # eval render timing
    H = W = 256
    cam = rays_mod.Camera(dataset[1]["test"][0], H, W, ds7[6][2],
                          near=meta.near_far[0], far=meta.near_far[1])
    for label, m in [
        ("dense", replace(meta, compute_dtype="bfloat16")),
        ("sparse", replace(meta, compute_dtype="bfloat16", block_budget=args.budget)),
    ]:
        t0 = time.time()
        out = render_image(params, m, 0.4, cam.rays_o.reshape(H, W, 3),
                           cam.rays_d.reshape(H, W, 3), white_bg=True,
                           alpha_state=alpha_state, chunk=8192)
        dt = time.time() - t0  # includes compile on first call per meta
        t0 = time.time()
        out = render_image(params, m, 0.5, cam.rays_o.reshape(H, W, 3),
                           cam.rays_d.reshape(H, W, 3), white_bg=True,
                           alpha_state=alpha_state, chunk=8192)
        dt = time.time() - t0
        print(f"[turbo] eval render {label}: {dt:.2f} s/image "
              f"({H * W / dt:,.0f} rays/s)", flush=True)

    print(f"[turbo] speedup train {r_turbo / r_dense:.2f}x at budget {args.budget}",
          flush=True)


if __name__ == "__main__":
    main()
