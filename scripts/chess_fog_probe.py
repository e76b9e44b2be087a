#!/usr/bin/env python
"""CPU probe: quantify ghost-density ("fog") in a trained chessboard scene.

Round-5 velocity-null diagnosis, hypothesis 3 (after shade truncation and
vel-regularization were cleared by the TPU arms): the synthetic chessboard is
a BLACK-background scene observed by outside-in orbiting cameras, so empty
space that renders black is photometrically indistinguishable from background
— the density grid can fill the volume with dark fog that exactly fits the
training views (train PSNR 33-58) while destroying novel views (test interp
PSNR ~18 in EVERY arm) and starving the velocity field (fog has no coherent
motion).  The real InDoorSeg scenes do not have this ambiguity: they are
closed rooms where every ray terminates on geometry
(/root/reference/datasets/load_blender_dynamic.py renders with bkgd handling;
config/InDoorSeg/*.yaml white_bkgd False because the room fills the frame).

This probe loads a checkpoint, evaluates dense alpha on a grid, and reports
occupancy inside vs OUTSIDE the ground-truth spheres.  GT sphere volume is
~1.1% of the bbox; fog shows up as outside-GT occupancy far above 0.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

from nvfi_tpu.train import checkpoint as ck
from nvfi_tpu.fields import kplane
from nvfi_tpu.data.synthetic import SCENE_OBJECTS


def main():
    scene_dir = sys.argv[1] if len(sys.argv) > 1 else "logs/synth/chessboard_r4c"
    objset = sys.argv[2] if len(sys.argv) > 2 else "chessboard"
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 48

    path = ck.find_checkpoint(scene_dir)
    params, meta, _, _, extra = ck.load(path)
    params = kplane.cast_compute(params, meta)
    print(f"checkpoint {path} step={extra.get('global_step')} grid={meta.grid_size}")

    alpha, xyz = kplane.compute_dense_alpha(params, meta, (res, res, res))
    alpha = np.asarray(alpha).reshape(-1)
    xyz = np.asarray(xyz).reshape(-1, 3)

    objects = SCENE_OBJECTS[objset]()
    # GT occupancy = SWEPT volume over the same 60-time sweep the alpha grid
    # maxes over (a mover's whole path is legitimately occupied)
    inside = np.zeros(len(xyz), bool)
    for t in np.linspace(0.0, 59.0 / 60.0, 60):
        for obj in objects:
            if getattr(obj, "hollow", False):
                d = np.linalg.norm(xyz - obj.center(float(t)), axis=-1)
                inside |= np.abs(d - obj.r) <= obj.SHELL + 0.1
            else:
                inside |= np.linalg.norm(xyz - obj.center(float(t)), axis=-1) <= obj.r * 1.25
    thr = meta.alpha_mask_thres
    occ = alpha > thr
    n = len(xyz)
    print(f"voxels={n}  GT-inside frac={inside.mean():.4f}")
    print(f"alpha>{thr:g}: total={occ.mean():.4f}  inside-GT={occ[inside].mean():.4f}  "
          f"OUTSIDE-GT={occ[~inside].mean():.4f}")
    for q in (0.5, 0.9, 0.99):
        print(f"  outside-GT alpha p{int(q*100)}={np.quantile(alpha[~inside], q):.5f}"
              f"   inside-GT alpha p{int(q*100)}={np.quantile(alpha[inside], q):.5f}")
    # fog mass ratio: how much of the total alpha mass lives outside GT?
    tot = alpha.sum()
    print(f"alpha mass outside-GT / total = {alpha[~inside].sum() / max(tot, 1e-9):.4f}")

    # For closed-room scenes, split by observability: interior cameras never
    # see past the room shell, so density beyond it is unconstrained (not
    # fog).  True ghost fog = alpha outside GT but INSIDE the observable
    # room volume.
    rooms = [o for o in objects if getattr(o, "hollow", False)]
    if rooms:
        room = rooms[0]
        observable = np.linalg.norm(xyz - room.c0, axis=-1) <= room.r + room.SHELL
        fog = observable & ~inside
        print(f"observable frac={observable.mean():.4f}  "
              f"fog voxels (observable & outside-GT) alpha>{thr:g}: {occ[fog].mean():.4f}")
        print(f"alpha mass in observable fog / total = "
              f"{alpha[fog].sum() / max(tot, 1e-9):.4f}")


if __name__ == "__main__":
    main()
