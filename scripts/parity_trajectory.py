#!/usr/bin/env python
"""Numerical parity trajectory: PyTorch reference vs nvfi_tpu, matched config.

Trains BOTH implementations on the SAME exported synthetic dataset at the same
model scale (init 64^3 grid, K=16, 2048+2048 rays/iter, PDE 16384 pts, no
upsampling) on this host's CPU, and tables train-batch PSNR at matched
iteration counts — the substantiation for the "matched PSNR" north star
(VERDICT.md item 4; anchor /root/reference/train_nvfi.py:208-272).

The reference runs fp32 on CPU (its AMP autocast is CUDA-only), so nvfi_tpu
runs compute_dtype float32 here too.

Usage:
  python scripts/parity_trajectory.py --phase ref   --iters 300   # torch, slow
  python scripts/parity_trajectory.py --phase ours  --iters 300
  python scripts/parity_trajectory.py --phase table
Artifacts land in logs/parity/.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "logs", "parity")
DATA = os.path.join(OUT, "data")

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from measure_reference import (  # noqa: E402
    STUB_LPIPS, STUB_TORCHVISION_INIT, STUB_TORCHVISION_TRANSFORMS, STUB_WANDB,
)

N_RAYS = 2048
PDE_PTS = 16384
N_VOXEL = 262_144
PRINT_EVERY = 5


def ensure_data():
    os.makedirs(OUT, exist_ok=True)
    if not os.path.exists(os.path.join(DATA, "transforms_train.json")):
        from nvfi_tpu.data import write_blender_dataset

        write_blender_dataset(DATA, H=128, W=128, n_train=16, n_val=2, n_test=2)


def ref_cfg(iters: int) -> str:
    return f"""
wandb: {{project: parity, name: ref, notes: ''}}
pbar: {{progress_refresh_rate: 50}}
experiment:
  randomseed: 233
  device: cpu
  logdir: {OUT}/ref_logs/
  lr_grid: 0.02
  lr_vel: 1.0E-3
  lr_net: 1.0E-3
  lr_decay_iters: -1
  lr_decay_target_ratio: 0.1
  lr_upsample_reset: 1
  gradual_iters: -1
  switch_iters: -1
  train_iters: {iters}
  freeze_vel_iters: 0
  print_every: {PRINT_EVERY}
  validate_every: 1000000
  save_every: 1000000
  L1_weight_inital: 8.0E-4
  L1_weight_reset: 4.0E-4
  TV_weight_density: 1.0
  TV_weight_app: 1.0
  TV_vel_reg_weight: 1.0
  vel_reg_weight: 1
  vel_reg_n_pts: {PDE_PTS}
dataset:
  type: blender
  basedir: {DATA}
  half_res: False
  test_skip: 1
  near: 2.0
  far: 6.0
  white_background: True
renderer:
  n_rays: {N_RAYS}
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
  N_voxel_init: {N_VOXEL}
  N_voxel_final: {N_VOXEL}
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


def run_ref(iters: int):
    ensure_data()
    cfg_path = os.path.join(OUT, "ref.yaml")
    with open(cfg_path, "w") as f:
        f.write(ref_cfg(iters))
    stubs = os.path.join(OUT, "stubs")
    os.makedirs(os.path.join(stubs, "torchvision"), exist_ok=True)
    for name, content in [
        ("wandb.py", STUB_WANDB), ("lpips.py", STUB_LPIPS),
        ("torchvision/__init__.py", STUB_TORCHVISION_INIT),
        ("torchvision/transforms.py", STUB_TORCHVISION_TRANSFORMS),
    ]:
        with open(os.path.join(stubs, name), "w") as f:
            f.write(content)
    env = dict(os.environ)
    env["PYTHONPATH"] = stubs
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["OMP_NUM_THREADS"] = "1"

    t0 = time.time()
    traj = []
    with open(os.path.join(OUT, "ref_raw.log"), "w") as logf:
        proc = subprocess.Popen(
            ["nice", "-n", "19", sys.executable, "-u", "train_nvfi.py",
             "--config", cfg_path, "--static_dynamic"],
            cwd="/root/reference", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        pat = re.compile(r"\[TRAIN\] Iter: (\d+) Loss: ([\d.eE+-]+) PSNR: ([\d.]+) +PSNR_t: ([\d.]+)")
        for line in proc.stdout:
            logf.write(line)
            logf.flush()
            m = pat.search(line)
            if m:
                traj.append({
                    "it": int(m.group(1)), "loss": float(m.group(2)),
                    "psnr_0": float(m.group(3)), "psnr_t": float(m.group(4)),
                    "elapsed": time.time() - t0,
                })
                print(f"[ref] {traj[-1]}", flush=True)
                with open(os.path.join(OUT, "ref_traj.json"), "w") as f:
                    json.dump(traj, f)
        proc.wait()
    print(f"[ref] done rc={proc.returncode} iters={len(traj) * PRINT_EVERY}")


def run_ours(iters: int, tpu: bool = False):
    ensure_data()
    if not tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax

        jax.config.update("jax_platforms", "cpu")

    from nvfi_tpu.config import load_config
    from nvfi_tpu.data import load_blender_data
    from nvfi_tpu.train.trainer import Trainer

    cfg_path = os.path.join(OUT, "ref.yaml")
    if not os.path.exists(cfg_path):
        with open(cfg_path, "w") as f:
            f.write(ref_cfg(iters))
    cfg = load_config(cfg_path, ["experiment.print_every", str(PRINT_EVERY)])
    dataset = load_blender_data(
        basedir=DATA, half_res=False, testskip=1, white_background=True,
    )
    tr = Trainer(cfg, dataset, mode="static_dynamic")
    traj = []

    out_name = "ours_tpu_traj.json" if tpu else "ours_traj.json"

    def log(m):
        row = {"it": m["it"], "loss": m["loss"], "psnr_0": m["psnr_0"],
               "psnr_t": m["psnr_t"], "elapsed": m["elapsed"]}
        traj.append(row)
        print(f"[ours] {row}", flush=True)
        with open(os.path.join(OUT, out_name), "w") as f:
            json.dump(traj, f)

    tr.train(iters=iters, log_fn=log)
    print(f"[ours] done iters={iters}")


def table():
    with open(os.path.join(OUT, "ref_traj.json")) as f:
        ref = {r["it"]: r for r in json.load(f)}
    src = ("ours_tpu_traj.json"
           if os.path.exists(os.path.join(OUT, "ours_tpu_traj.json"))
           else "ours_traj.json")
    with open(os.path.join(OUT, src)) as f:
        ours = {r["it"]: r for r in json.load(f)}
    its = sorted(set(ref) & set(ours))
    print(f"{'iter':>6} | {'ref psnr0':>9} {'ours psnr0':>10} | "
          f"{'ref psnr_t':>10} {'ours psnr_t':>11}")
    rows = []
    for it in its:
        r, o = ref[it], ours[it]
        print(f"{it:>6} | {r['psnr_0']:>9.2f} {o['psnr_0']:>10.2f} | "
              f"{r['psnr_t']:>10.2f} {o['psnr_t']:>11.2f}")
        rows.append((it, r["psnr_0"], o["psnr_0"], r["psnr_t"], o["psnr_t"]))
    with open(os.path.join(OUT, "table.md"), "w") as f:
        f.write("| iter | ref PSNR_0 | ours PSNR_0 | ref PSNR_t | ours PSNR_t |\n")
        f.write("|---|---|---|---|---|\n")
        for row in rows:
            f.write("| " + " | ".join(
                str(row[0:1][0]) if i == 0 else f"{v:.2f}"
                for i, v in enumerate(row)) + " |\n")
    print(f"wrote {os.path.join(OUT, 'table.md')}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--phase", choices=["ref", "ours", "ours_tpu", "table"],
                   required=True)
    p.add_argument("--iters", type=int, default=300)
    a = p.parse_args()
    {"ref": lambda: run_ref(a.iters), "ours": lambda: run_ours(a.iters),
     "ours_tpu": lambda: run_ours(a.iters, tpu=True),
     "table": table}[a.phase]()
