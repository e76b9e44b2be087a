#!/usr/bin/env python
"""Extrapolation-gap ablation (VERDICT r2 weak #3 / next-step #3).

Hypotheses from NEXT.md: (a) the PDE weight decaying to 0.1x by end of
schedule starves the velocity field late in training; (b) the
occupied-budget Jacobian subsample biases the physics loss.  Probe both at a
small, fast scale (64^3 held, K=16, 2048+2048 rays, 4000 iters — the parity
model scale) with three arms:

  A baseline           vel_reg decayed (reference semantics), budget 4096
  B no-decay           vel_reg held constant, budget 4096
  C full-budget        vel_reg decayed, budget 16384 (no subsample)

Each arm reports interp/extrap test PSNR + velocity EPE vs the analytic
rigid field.  Run on TPU (one arm at a time in one process):

  python scripts/extrap_ablate.py [--iters 4000] [--arms A,B,C]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = {
    "A": {},
    "B": {"experiment.vel_reg_no_decay": True},
    "C": {"experiment.vel_occupied_budget": 16384},
    # round 4 (VERDICT r3 item 9): arms B/C were null, so probe velocity-field
    # CAPACITY — double the width of both 6-layer vel MLPs (reference holds
    # them at 128, models/velocity_field.py:60-61)
    "D": {"nvfi.vel_hidden": 256},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--arms", default="A,B,C")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--out", default="logs/extrap_ablate.json")
    args = ap.parse_args()

    import numpy as np

    from nvfi_tpu.config import load_config
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.eval.harness import render_split
    from nvfi_tpu.eval.metrics import psnr
    from nvfi_tpu.eval.velocity_eval import advection_error, velocity_epe
    from nvfi_tpu.train.trainer import Trainer

    dataset = make_synthetic_scene(n_train=64, n_val=2, n_test=8,
                                   H=args.res, W=args.res)
    objects = dataset[7]["objects"]
    tmax = 0.75

    results = {}
    for arm in args.arms.split(","):
        overrides = []
        for k, v in ARMS[arm].items():
            overrides += [k, str(v)]
        cfg = load_config("configs/synth/bat.yaml", overrides + [
            "experiment.train_iters", str(args.iters),
            "experiment.vel_reg_n_pts", "16384",
            "experiment.save_every", "1000000000",
            "experiment.validate_every", "1000000000",
            "nvfi.N_voxel_final", "262144",       # hold 64^3: isolate velocity
            "nvfi.upsamp_list", "[1000000]",
            "nvfi.compute_dtype", "bfloat16",
        ])
        if "experiment.vel_occupied_budget" not in ARMS[arm]:
            cfg.experiment.vel_occupied_budget = 4096
        tr = Trainer(cfg, dataset[:7], mode="static_dynamic")
        logs = []
        tr.train(iters=args.iters,
                 log_fn=lambda m: logs.append(m) or (
                     print(f"[{arm}] it={m['it']} psnr0={m['psnr_0']:.2f} "
                           f"psnr_t={m['psnr_t']:.2f} "
                           f"pde={m.get('vel_pde', 0.0):.4f}", flush=True)
                     if m["it"] % 500 == 0 else None))

        preds, errors = render_split(
            tr.params, tr.meta, dataset[:7], "test", white_bg=True,
            alpha_grid=64,
        )
        times = np.asarray(dataset[2]["test"], np.float32)
        per = [float(psnr(preds[i], np.asarray(dataset[0]["test"][i])))
               for i in range(len(times))]
        interp = float(np.mean([p for p, t in zip(per, times) if t <= tmax]))
        extrap = float(np.mean([p for p, t in zip(per, times) if t > tmax]))
        epe = {f"t{t}": velocity_epe(tr.params, tr.meta, objects, t)
               for t in (0.2, 0.5, 0.7)}
        adv = advection_error(tr.params, tr.meta, objects, 0.0, 0.5)
        results[arm] = {
            "interp_psnr": interp, "extrap_psnr": extrap,
            "velocity_epe": {k: (v if isinstance(v, float) else
                                 {kk: float(vv) for kk, vv in v.items()})
                             for k, v in epe.items()},
            "advection_error": (adv if isinstance(adv, float) else
                                {k: float(v) for k, v in adv.items()}),
            "final_pde": float(logs[-1].get("vel_pde", 0.0)),
        }
        print(f"[{arm}] interp={interp:.2f} extrap={extrap:.2f} "
              f"epe={results[arm]['velocity_epe']}", flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
