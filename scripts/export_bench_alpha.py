#!/usr/bin/env python
"""Export the occupancy state of a trained run as the committed bench asset.

  python scripts/export_bench_alpha.py --scene_dir logs/synth/bat30k_turbo \
      [--out assets/bench_alpha.npz]

Reads the newest checkpoint; uses its stored training alpha mask (present for
turbo runs with update_AlphaMask_list) or builds one with the dense 60-t sweep
(TPU) otherwise.  The volume is bit-packed (~1 MB at 200^3) so the REAL
occupancy pattern of a converged scene can ship in-repo for bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--checkpoint", type=int, default=-1)
    ap.add_argument("--out", default="assets/bench_alpha.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nvfi_tpu.train import checkpoint as ck
    from nvfi_tpu.fields import kplane

    path = ck.find_checkpoint(args.scene_dir, args.checkpoint)
    assert path, f"no checkpoint under {args.scene_dir}"
    params, meta, _, alpha_state, extra = ck.load(path)
    print(f"[export] {path} grid={meta.grid_size} aabb={meta.aabb}")

    if alpha_state is None:
        print("[export] no stored mask; dense 60-t sweep ...")
        params = jax.tree.map(jnp.asarray, params)
        alpha_state, _ = kplane.update_alpha_mask(
            params, meta, tuple(min(g, 200) for g in meta.grid_size))

    vol = np.asarray(alpha_state["volume"]) > 0.5
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(
        args.out,
        packed=np.packbits(vol.reshape(-1)),
        shape=np.asarray(vol.shape, np.int64),
        alpha_aabb=np.asarray(alpha_state["aabb"], np.float64),
        model_aabb=np.asarray(meta.aabb_np, np.float64),
        grid_size=np.asarray(meta.grid_size, np.int64),
    )
    print(f"[export] wrote {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.2f} MB, "
          f"occupancy {vol.mean():.4f})")


if __name__ == "__main__":
    main()
