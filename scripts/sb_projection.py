#!/usr/bin/env python
"""CPU-side sample_block sweep projection (no TPU needed).

The turbo block budget is calibrated by a pure-numpy host probe
(nvfi_tpu/train/turbo.py:measure_block_budget), so the gathered-sample count
the block-sparse path will issue at a given ``sample_block`` is computable
exactly, on CPU, from the committed bench occupancy asset — the same asset
and probe protocol bench.py uses.  This projects the next block-granularity
points (SB 8/4) before spending a TPU slot on them: the gather term scales
with budget x padded-sample-count, while the top_k term scales with the block
count (ns_pad/SB per ray), so the projection brackets the win.

Usage:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/sb_projection.py
Output: one JSON line per SB in {64,32,16,8,4}.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dataclasses import replace

    import bench
    from nvfi_tpu.config import load_config
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.train.trainer import Trainer
    from nvfi_tpu.train import turbo as turbo_mod

    n_rays = 8192
    cfg = load_config("configs/synth/bat.yaml", None)
    cfg.renderer.n_rays = n_rays
    cfg.renderer.batch_size = 262144
    cfg.nvfi.N_voxel_init = int(cfg.nvfi.N_voxel_final)
    cfg.nvfi.upsamp_list = []

    asset = bench.load_alpha_asset()
    assert asset is not None, "assets/bench_alpha.npz missing"
    alpha_state, model_aabb, _ = asset
    cfg.nvfi.bbox_x = [float(model_aabb[0][0]), float(model_aabb[1][0])]
    cfg.nvfi.bbox_y = [float(model_aabb[0][1]), float(model_aabb[1][1])]
    cfg.nvfi.bbox_z = [float(model_aabb[0][2]), float(model_aabb[1][2])]

    H = W = 256
    dataset = make_synthetic_scene(n_train=16, n_val=1, n_test=1, H=H, W=W,
                                   n_times=16)[:7]
    trainer = Trainer(cfg, dataset, mode="static_dynamic")
    poses = np.stack([np.asarray(p, np.float32) for p in dataset[1]["train"]])
    focal = dataset[6][2]

    ns = trainer.meta.n_samples
    for sb in (64, 32, 16, 8, 4):
        meta = replace(trainer.meta, sample_block=sb)
        budget, shade = turbo_mod.measure_block_budget(
            meta, alpha_state, poses, H, W, focal, n_rays, with_shade=True)
        ns_pad = -(-ns // sb) * sb
        nb = ns_pad // sb
        # the runtime rounds the block count to multiples of 8 with a floor
        B = min(n_rays * nb,
                max(8, (int(budget * n_rays * nb) + 7) // 8 * 8))
        gathered_per_ray = B * sb / n_rays
        print(json.dumps({
            "sample_block": sb,
            "probed_budget": round(float(budget), 4),
            "probed_shade": round(float(shade), 4),
            "n_samples": ns,
            "ns_pad": ns_pad,
            "gathered_samples_per_ray": round(gathered_per_ray, 1),
            "topk_scores_per_ray": nb,
        }), flush=True)


if __name__ == "__main__":
    main()
