#!/usr/bin/env python
"""Train the unsupervised 3D instance-segmentation MaskField.

CLI mirrors reference train_segm.py:61-71:

  python train_segm.py --config <yaml> [--checkpoint N] [--iters N] [--logdir D]

Loads a frozen NVFi checkpoint (trained by train_nvfi.py) and distills its
motion field into a per-point K-way MaskField.
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=int, default=-1)
    parser.add_argument("--iters", type=int, default=0)
    parser.add_argument("--logdir", type=str, default="")
    parser.add_argument("--point_budget", type=int, default=8192)
    parser.add_argument("--scene_dir", type=str, default="",
                        help="override the NVFi checkpoint directory")
    args = parser.parse_args()

    from nvfi_tpu.config import load_config
    from nvfi_tpu.train import checkpoint as ckpt_mod
    from nvfi_tpu.train.segm import SegmTrainer

    cfg = load_config(args.config)
    scene_logdir = args.scene_dir or os.path.join(
        str(cfg.experiment.logdir), str(cfg.wandb.project), str(cfg.wandb.name)
    )
    path = ckpt_mod.find_checkpoint(scene_logdir, args.checkpoint)
    assert path, f"no NVFi checkpoint under {scene_logdir}"
    import jax
    import jax.numpy as jnp

    params, meta, _, _, _ = ckpt_mod.load(path)
    params = jax.tree.map(jnp.asarray, params)
    print(f"[segm] scene ckpt {path}, grid {meta.grid_size}, K {meta.num_keyframes}")

    logdir = args.logdir or os.path.join(
        "logs_segm", f"{cfg.wandb.name}_k={cfg.segmentation.n_object}"
    )
    os.makedirs(logdir, exist_ok=True)

    trainer = SegmTrainer(cfg, params, meta, point_budget=args.point_budget)
    trainer.train(
        logdir=logdir,
        log_fn=lambda m: print(
            f"[segm] it={m['it']} dyn={m['dynamic']:.4f} smooth={m['smooth']:.4f} "
            f"ent={m['entropy']:.4f}", flush=True,
        ),
        iters=args.iters or None,
    )
    trainer.save(os.path.join(logdir, "mask_final"))
    print(f"[segm] saved {logdir}/mask_final")


if __name__ == "__main__":
    main()
