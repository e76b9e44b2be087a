"""Multi-scene parallel training over the virtual 8-device mesh."""

import numpy as np
import jax

from nvfi_tpu.data import make_synthetic_scene
from nvfi_tpu.data.synthetic import RigidSphere
from nvfi_tpu.parallel import make_mesh
from nvfi_tpu.parallel.multi_scene import MultiSceneTrainer, unstack_scenes

from test_train_e2e import small_cfg


def test_multi_scene_trains_four_scenes_sharded():
    scenes = []
    for i in range(4):
        objs = [
            RigidSphere(center=(0.8, 0, 0.2 * i), radius=0.4,
                        color=(0.9 - 0.2 * i, 0.3, 0.2 + 0.2 * i),
                        omega=(0, 0, 1.0 + i)),
            RigidSphere(center=(-0.7, -0.5, 0), radius=0.4,
                        color=(0.2, 0.5, 0.9), v_lin=(0.5 + 0.2 * i, 0.3, 0)),
        ]
        scenes.append(
            make_synthetic_scene(n_train=6, n_val=1, n_test=1, H=24, W=24,
                                 objects=objs, seed=i)
        )

    cfg = small_cfg(**{
        "renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
        "nvfi.max_n_samples": 24, "experiment.print_every": 5,
    })
    mesh = make_mesh(4)
    tr = MultiSceneTrainer(cfg, scenes, mesh=mesh)
    logs = []
    tr.train(iters=12, log_fn=logs.append)
    losses0 = logs[0]["loss"]
    lossesN = logs[-1]["loss"]
    assert losses0.shape == (4,)
    assert np.isfinite(lossesN).all()
    # every scene's loss decreased
    assert (lossesN < losses0).all(), (losses0, lossesN)
    # scenes trained DIFFERENT parameters (independent content)
    per_scene = unstack_scenes(tr.params, 4)
    a = np.asarray(jax.tree.leaves(per_scene[0])[0])
    b = np.asarray(jax.tree.leaves(per_scene[1])[0])
    assert np.abs(a - b).max() > 1e-4
