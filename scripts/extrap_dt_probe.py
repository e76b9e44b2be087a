#!/usr/bin/env python
"""Eval-time integration-accuracy probe for the extrapolation gap (NEXT.md §6).

Separates two hypotheses for the extrap-PSNR deficit WITHOUT retraining:
if it is RK2 integration error over the long (t - tmax) offset, refining the
advection step at eval (meta.dt_scale < 1) improves extrap PSNR on an
existing checkpoint; if the learned velocity field itself is wrong past tmax
(method-level), dt_scale changes nothing.  Either outcome is a measured arm.

  python scripts/extrap_dt_probe.py --scene_dir logs/synth/bat30k_s125 \
      [--res 128] [--frames 128] [--scales 1.0,0.5,0.25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--config", default="configs/synth/bat.yaml")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--scales", default="1.0,0.5,0.25")
    ap.add_argument("--out", default="logs/extrap_dt_probe.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nvfi_tpu.config import load_config
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.eval.harness import render_split
    from nvfi_tpu.eval.metrics import psnr
    from nvfi_tpu.fields import kplane
    from nvfi_tpu.train import checkpoint as ckpt_mod

    cfg = load_config(args.config)
    path = ckpt_mod.find_checkpoint(args.scene_dir)
    assert path, f"no checkpoint under {args.scene_dir}"
    params, meta, *_ = ckpt_mod.load(path)
    params = jax.tree.map(jnp.asarray, params)
    meta = kplane.eval_exact_meta(meta)

    dataset = make_synthetic_scene(
        n_train=args.frames, n_val=2, n_test=8, H=args.res, W=args.res,
        tmax_frac=float(cfg.nvfi.tmax),
        white_background=bool(cfg.dataset.white_background),
        objects=str(cfg.dataset.get("synthetic_objects", "bat")),
    )[:7]
    times = np.asarray(dataset[2]["test"], np.float32)
    tmax = float(meta.tmax)

    results = {}
    for s in (float(x) for x in args.scales.split(",")):
        m = replace(meta, dt_scale=s)
        print(f"[probe] dt_scale={s}: snap_steps={m.snap_steps} "
              f"render_adv_steps={m.render_adv_steps}", flush=True)
        preds, _ = render_split(params, m, dataset, "test",
                                white_bg=bool(cfg.dataset.white_background),
                                alpha_grid=128)
        per = [float(psnr(preds[i], np.asarray(dataset[0]["test"][i])))
               for i in range(len(times))]
        interp = float(np.mean([p for p, t in zip(per, times) if t <= tmax]))
        extrap = float(np.mean([p for p, t in zip(per, times) if t > tmax]))
        results[f"dt_scale={s}"] = {"interp_psnr": interp, "extrap_psnr": extrap}
        print(f"[probe] dt_scale={s}: interp={interp:.2f} extrap={extrap:.2f}",
              flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
