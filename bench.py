#!/usr/bin/env python
"""Training-throughput benchmark: rays/sec/chip on the flagship model.

Runs the full jitted train step (two 'bat'-scale render batches + L1/TV/PDE
regularizers + Adam) at the reference's final-stage model size (grid ~200^3,
K=16, 24/48 components, MLP_PE shader — config/InDoorObj/bat.yaml) and
reports steady-state rays/sec.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R}

vs_baseline compares against the PyTorch reference's measured throughput when
a measurement is recorded in BASELINE.md (reference publishes no numbers —
SURVEY.md §6); until then the recorded torch-CPU proxy measurement is used.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Reference throughput to beat.  The reference repo publishes no numbers and
# this image has no CUDA GPU, so the recorded baseline is the PyTorch
# reference's train step measured on this host's CPU (see BASELINE.md); the
# BASELINE.json target is >=10x a reference *GPU*; a V100-class GPU runs the
# reference at roughly 10-20k rays/s for this model size (2048-ray steps at
# ~0.1-0.2 s/it), so we conservatively compare against 20_000 rays/s.
REFERENCE_RAYS_PER_SEC = 20_000.0


def main():
    import jax
    import jax.numpy as jnp
    from nvfi_tpu.config import load_config
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.train.trainer import Trainer, n_to_reso

    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cfg = load_config("configs/synth/bat.yaml")
    cfg.renderer.n_rays = n_rays
    cfg.renderer.batch_size = 262144
    cfg.nvfi.compute_dtype = "bfloat16"
    # final-stage model size: jump straight to N_voxel_final, no upsampling
    cfg.nvfi.N_voxel_init = int(cfg.nvfi.N_voxel_final)
    cfg.nvfi.upsamp_list = []
    cfg.experiment.train_iters = 10**9

    H = W = 256
    dataset = make_synthetic_scene(n_train=16, n_val=1, n_test=1, H=H, W=W,
                                   n_times=16)[:7]
    trainer = Trainer(cfg, dataset, mode="static_dynamic")
    print(f"[bench] device={jax.devices()[0]} grid={trainer.meta.grid_size} "
          f"K={trainer.meta.num_keyframes} n_samples={trainer.meta.n_samples} "
          f"n_rays={n_rays} pde_pts={cfg.experiment.vel_reg_n_pts}",
          file=sys.stderr, flush=True)

    # warmup (compile + first steps); the device->host float() is the only
    # reliable sync on this backend (block_until_ready returns early through
    # the tunnel)
    t0 = time.time()
    m = trainer.train(iters=3)
    float(m["loss"])
    print(f"[bench] warmup {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    n_steps = 20
    t0 = time.time()
    m = trainer.train(iters=trainer.global_step + n_steps)
    float(m["loss"])  # forces the whole sequential step chain
    dt = (time.time() - t0) / n_steps

    rays_per_step = 2 * n_rays  # random-time batch + keyframe batch
    rays_per_sec = rays_per_step / dt
    print(f"[bench] {dt*1e3:.1f} ms/step -> {rays_per_sec:,.0f} rays/s",
          file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
