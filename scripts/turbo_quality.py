#!/usr/bin/env python
"""Turbo quality parity: continue a trained checkpoint N iters dense vs N
iters turbo (alpha-pruned + block-sparse) and compare test-split PSNR.

The north star permits throughput claims only "at matched PSNR"; this is the
matched-quality evidence for the turbo mode on a converged scene.

  python scripts/turbo_quality.py --scene_dir logs/synth/bat30k_r2 \
      [--iters 800] [--budget 0.35]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--budget", type=float, default=0.35)
    ap.add_argument("--shade_frac", type=float, default=0.08,
                    help="turbo-leg top-K shade budget (converged scenes have "
                         "~1-2%% of samples above the weight threshold)")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--config", default="configs/synth/bat.yaml")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nvfi_tpu.config import load_config
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.eval.harness import render_split
    from nvfi_tpu.fields import kplane
    from nvfi_tpu.train import checkpoint as ck
    from nvfi_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    # NOTE: production turbo uses the default estimator-preserving PDE
    # prefilter (pde_prefilter), NOT pde_mask_filter — the round-2 "fastest
    # variant" flag predates the round-3 stratified/prefilter PDE rewrite and
    # measures as a large slowdown on top of it (logs/turbo_quality_shade125.log:
    # turbo leg 1247 ms/step vs production 0.35 s/it at the same budgets).
    cfg.nvfi.compute_dtype = "bfloat16"
    cfg.renderer.batch_size = 262144
    cfg.experiment.validate_every = 10**9
    cfg.experiment.save_every = 10**9

    dataset = make_synthetic_scene(
        n_train=128, n_val=4, n_test=8, H=args.res, W=args.res,
        tmax_frac=float(cfg.nvfi.tmax),
        white_background=bool(cfg.dataset.white_background),
    )

    path = ck.find_checkpoint(args.scene_dir, -1)
    assert path, args.scene_dir
    base_params, base_meta, base_opt, _, extra = ck.load(path)
    start = int(extra.get("global_step", 0))
    print(f"[tq] ckpt {path} step={start} grid={base_meta.grid_size}", flush=True)

    print("[tq] building alpha mask...", flush=True)
    mask_meta = replace(base_meta, compute_dtype="bfloat16")
    alpha_state, _ = kplane.update_alpha_mask(
        jax.tree.map(jnp.asarray, base_params), mask_meta,
        tuple(min(g, 200) for g in base_meta.grid_size))
    print(f"[tq] occupancy {float(jnp.mean(alpha_state['volume'])):.4f}", flush=True)

    results = {}
    for label, turbo in (("dense", False), ("turbo", True)):
        tr = Trainer(cfg, dataset[:7], mode="static_dynamic")
        # deep copies: the jitted step donates params/opt_state (jnp.asarray
        # would alias the shared checkpoint arrays and the dense leg would
        # delete them)
        tr.params = jax.tree.map(jnp.array, base_params)
        tr.meta = replace(
            base_meta, compute_dtype="bfloat16",
            train_occupancy_prune=turbo,
            block_budget=args.budget if turbo else 1.0,
            shade_fraction=args.shade_frac if turbo else base_meta.shade_fraction,
        )
        tr.alpha_state = alpha_state if turbo else None
        if base_opt is not None:
            tr.opt_state = jax.tree.map(jnp.array, base_opt)
        tr.global_step = start
        tr.n_voxel_list, tr.keyframe_list = [], []
        tr._step_cache = {}

        m = tr.train(iters=start + 3)  # warmup/compile
        float(m["loss"])
        t0 = time.time()
        m = tr.train(iters=start + args.iters)
        float(m["loss"])
        dt = (time.time() - t0) / max(args.iters - 3, 1)
        dropped = float(m.get("dropped_blocks", 0.0))

        preds, errors = render_split(
            tr.params, replace(tr.meta, train_occupancy_prune=False),
            dataset[:7], "test",
            white_bg=bool(cfg.dataset.white_background), alpha_grid=128,
        )
        results[label] = (dt, errors, dropped)
        print(f"[tq] {label}: {dt*1e3:.0f} ms/step "
              f"rays/s={2*int(cfg.renderer.n_rays)/dt:,.0f} "
              f"dropped={dropped:.0f} test={errors}", flush=True)

    d, t = results["dense"], results["turbo"]
    print(f"[tq] SUMMARY: speedup {d[0]/t[0]:.2f}x | "
          f"psnr dense {d[1]['psnr']:.2f} vs turbo {t[1]['psnr']:.2f} "
          f"(delta {t[1]['psnr']-d[1]['psnr']:+.2f} dB)", flush=True)


if __name__ == "__main__":
    main()
