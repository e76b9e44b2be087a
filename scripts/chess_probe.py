#!/usr/bin/env python
"""Post-mortem probe of the r4c chessboard checkpoint's velocity field (CPU).

VERDICT r4 weak-item 1: relative EPE ~ 1.0 after the scaled 2000-iter run —
indistinguishable from predicting zero motion.  Before burning TPU arms,
establish WHAT the field actually predicts:

  * are the velocity MLP params still ~at init (no gradient ever flowed)?
  * is the raw (ungated) field ~zero at the movers, or is the sur gate
    zeroing a non-trivial prediction (normalization/gating bug)?
  * what does the field predict at the mover centers vs ground truth?
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np

from nvfi_tpu.train import checkpoint as ck
from nvfi_tpu.fields import kplane, velocity as vel_mod
from nvfi_tpu.data.synthetic import chessboard_objects, scene_velocity

path = ck.find_checkpoint(sys.argv[1] if len(sys.argv) > 1 else "logs/synth/chessboard_r4c")
params, meta, _, _, extra = ck.load(path)
print(f"checkpoint {path} step={extra.get('global_step')} gate={meta.vel_gate}")

# 1. param drift from init scale
fresh = vel_mod.init_velocity_params(jax.random.PRNGKey(0), meta.vel_hidden)
for net in ("weight_net", "a_weight_net"):
    for i, (wc, wf) in enumerate(zip(params["vel"][net], fresh[net])):
        nc, nf = float(jnp.linalg.norm(wc["w"])), float(jnp.linalg.norm(wf["w"]))
        print(f"  vel.{net}[{i}].w |ckpt|={nc:.4f} |init|={nf:.4f} ratio={nc/max(nf,1e-9):.3f}")

objects = chessboard_objects()
scale = meta.aabb_size / 2.0
for t in (0.1, 0.3, 0.5, 0.7):
    rows = []
    for oi, obj in enumerate(objects):
        c = obj.center(t).astype(np.float32)
        v_true = obj.velocity(c[None], t)[0]
        xyz_n = kplane.normalize_coord(meta, c[None])
        tt = jnp.full((1, 1), t, jnp.float32)
        v_raw = np.asarray(vel_mod.get_vel(params["vel"], jnp.concatenate([jnp.asarray(xyz_n), tt], -1)))[0] * scale
        v_gated = np.asarray(vel_mod.gated_velocity(params["vel"], meta.vel_gate, jnp.asarray(xyz_n), tt))[0] * scale
        rows.append((oi, v_true, v_raw, v_gated))
    print(f"t={t}")
    for oi, v_true, v_raw, v_gated in rows:
        print(f"  obj{oi}: |v_true|={np.linalg.norm(v_true):.3f} "
              f"|v_raw|={np.linalg.norm(v_raw):.3f} |v_gated|={np.linalg.norm(v_gated):.3f} "
              f"v_true={np.round(v_true,2)} v_raw={np.round(v_raw,2)}")

# 3. field statistics over the sur box at t=0.3
rng = np.random.RandomState(0)
pts = rng.uniform(-1.6, 1.6, (4096, 3)).astype(np.float32)
xyz_n = kplane.normalize_coord(meta, pts)
tt = jnp.full((4096, 1), 0.3, jnp.float32)
v = np.asarray(vel_mod.gated_velocity(params["vel"], meta.vel_gate, jnp.asarray(xyz_n), tt)) * scale
vt = scene_velocity(objects, pts, 0.3)
print(f"volume t=0.3: |v_pred| mean={np.linalg.norm(v,axis=-1).mean():.4f} "
      f"max={np.linalg.norm(v,axis=-1).max():.4f}; |v_true| mean={np.linalg.norm(vt,axis=-1).mean():.4f}")
