"""Round-5 regression tests.

1. Exact-by-default shading policy (VERDICT r4 item 3): a config that does
   not opt into a shade cap gets shade_fraction 1.0 (no truncation); only the
   quality-certified bat config carries the 0.25 cap.
2. Sur-gate world box: kplane.shrink re-normalizes the gate bounds against
   the new aabb (the reference computes bounds once from the initial aabb,
   models/velocity_field.py:44, and never shrinks sur scenes — our sur-family
   throughput mode does).
3. Checkpoint meta roundtrips the world box (with pre-round-5 compat).
"""

import os

import numpy as np
import jax
import pytest

from nvfi_tpu.config import load_config
from nvfi_tpu.fields import kplane
from nvfi_tpu.fields.velocity import VelGate
from nvfi_tpu.train import checkpoint as ck


def _sur_meta(aabb=((-2.02,) * 3, (2.02,) * 3), sur=1.6):
    cfg = {
        "sur_x": [-sur, sur], "sur_y": [-sur, sur], "sur_z": [-sur, sur],
        "num_keyframes": 4, "tmax": 0.75,
        "density_n_comp": [8], "appearance_n_comp": [8], "app_dim": 8,
        "density_shift": -10.0, "distance_scale": 25.0,
        "alphaMask_thres": 1e-4, "rayMarch_weight_thres": 1e-4,
        "fea2denseAct": "softplus", "densityMode": "Density",
        "shadingMode": "MLP_PE", "pos_pe": 6, "view_pe": 6, "fea_pe": 6,
        "featureC": 32, "step_ratio": 0.5, "max_n_samples": 96,
        "use_vel": True,
    }
    from nvfi_tpu.config import CfgNode

    return kplane.meta_from_cfg(CfgNode(cfg), np.asarray(aabb), (16, 16, 16),
                                (2.0, 6.0))


def test_shade_exact_by_default():
    """Configs without an explicit shade cap run EXACT shading (1.0): the
    truncating 0.25 cap is per-config opt-in carried only by configs with
    from-scratch quality certification."""
    meta = _sur_meta()  # no shade_fraction key in the cfg
    assert meta.shade_fraction == 1.0
    # dataclass default agrees (meta built directly, e.g. in tests/benches)
    assert kplane.KPlaneMeta(
        grid_size=(8,) * 3, num_keyframes=2, tmax=0.75,
        aabb=((-2.0,) * 3, (2.0,) * 3), near_far=(2.0, 6.0),
        density_n_comp=4, app_n_comp=4, app_dim=4,
        density_shift=-10.0, distance_scale=25.0,
        alpha_mask_thres=1e-4, raymarch_weight_thres=1e-4,
    ).shade_fraction == 1.0


def test_certified_bat_config_opts_into_the_cap():
    cfg = load_config("configs/synth/bat.yaml")
    assert float(cfg.nvfi.shade_fraction) == 0.25
    # the sur-family scene config does NOT opt in -> exact
    chess = load_config("configs/synth/chessboard.yaml")
    assert "shade_fraction" not in chess.nvfi


def test_sur_gate_carries_world_box():
    meta = _sur_meta()
    g = meta.vel_gate
    assert g.mode == "sur" and g.world == ((-1.6,) * 3, (1.6,) * 3)
    np.testing.assert_allclose(
        np.asarray(g.bounds), [[-1.6 / 2.02] * 3, [1.6 / 2.02] * 3], rtol=1e-12
    )


def test_shrink_renormalizes_sur_bounds():
    meta = _sur_meta()
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    new_aabb = np.array([[-1.9] * 3, [1.8] * 3])
    p2, m2 = kplane.shrink(params, meta, new_aabb)
    a = np.asarray(m2.aabb)  # post voxel-snap
    expect = (np.array([[-1.6] * 3, [1.6] * 3]) - a[0]) * 2.0 / (a[1] - a[0]) - 1.0
    np.testing.assert_allclose(np.asarray(m2.vel_gate.bounds), expect,
                               atol=1e-12)
    # the world box itself is invariant
    assert m2.vel_gate.world == meta.vel_gate.world
    # the gated region covers the same PHYSICAL points before and after
    from nvfi_tpu.fields import velocity as vel_mod

    pts_world = np.array([[0.0, 0.0, 0.0], [1.55, 0.0, 0.0], [1.7, 0.0, 0.0]],
                         np.float32)
    for m, p in ((meta, params), (m2, p2)):
        xyz = jax.numpy.asarray(kplane.normalize_coord(m, pts_world))
        t = jax.numpy.zeros((3, 1))
        v = np.asarray(vel_mod.gated_velocity(p["vel"], m.vel_gate, xyz, t))
        assert np.any(v[0] != 0) and np.any(v[1] != 0), m.vel_gate
        np.testing.assert_array_equal(v[2], 0.0)  # outside sur: gated


def _save_png(path, rgb):
    from PIL import Image

    Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(path)


def test_multicam_loader_trains_e2e(tmp_path):
    """End-to-end training through load_blender_data_dynamic (multi-camera
    rig layout, reference datasets/load_blender_dynamic.py:71-173): write a
    tiny rig dataset to disk, load it with the dynamic loader, and train —
    PSNR must rise (VERDICT r4 missing item 5: the loader was unit-tested
    but never driven)."""
    import json

    from nvfi_tpu.data.blender import load_blender_data_dynamic, _spherical_pose
    from nvfi_tpu.data.synthetic import default_objects, render_frame
    from nvfi_tpu.train.trainer import Trainer
    from tests.test_train_e2e import small_cfg

    H = W = 32
    focal = 0.5 * W / np.tan(0.5 * 0.6911112)
    objects = default_objects()
    cam_thetas = (-60.0, 30.0, 120.0)
    times = (0.0, 0.15, 0.35, 0.6, 0.75)
    for split, skip in (("train", 1), ("val", 5), ("test", 5)):
        data = []
        os.makedirs(tmp_path / split, exist_ok=True)
        for ci, th in enumerate(cam_thetas):
            pose = _spherical_pose(th, -30.0, 4.0)
            frames = []
            for ti, t in enumerate(times[::skip]):
                rel = f"{split}/c{ci}_t{ti}"
                rgb, _ = render_frame(objects, pose, H, W, focal, t)
                _save_png(str(tmp_path / (rel + ".png")), rgb)
                frames.append({"file_path": rel, "time": float(t)})
            data.append({"transform_matrix": np.asarray(pose).tolist(),
                         "frames": frames})
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.6911112, "data": data}, f)

    dataset = load_blender_data_dynamic(str(tmp_path))
    assert dataset[3]["train"] == len(cam_thetas) * len(times)
    cfg = small_cfg(**{"renderer.n_rays": 128, "experiment.vel_reg_n_pts": 128,
                       "nvfi.max_n_samples": 32})
    tr = Trainer(cfg, dataset, mode="static_dynamic")
    logs = []
    tr.train(iters=160, log_fn=logs.append)
    first, last = logs[0]["psnr_0"], logs[-1]["psnr_0"]
    assert last > first + 3, f"PSNR did not improve: {first} -> {last}"
    assert np.isfinite(logs[-1]["loss"])


def test_ndc_training_e2e():
    """End-to-end training with renderer.ndc (NDC ray projection +
    sample_ray_ndc linear-depth sampling — reference camera.py:135-157 /
    tensorf_base.py:270-282, a latent path there: no shipped config enables
    it).  Forward-facing rig, model box = NDC cube, loss must fall."""
    from nvfi_tpu.data.synthetic import RigidSphere, render_frame
    from nvfi_tpu.train.trainer import Trainer
    from tests.test_train_e2e import small_cfg

    H = W = 32
    focal = 0.5 * W / np.tan(0.5 * 0.6911112)
    objects = [
        RigidSphere(center=(0.0, 0.0, -3.5), radius=0.8, color=(0.9, 0.3, 0.2),
                    v_lin=(0.5, 0.0, 0.0)),
        RigidSphere(center=(1.0, 0.5, -4.5), radius=0.7, color=(0.2, 0.5, 0.9)),
    ]
    times = (0.0, 0.25, 0.5, 0.75)
    offsets = (-0.3, 0.0, 0.3)
    imgs, poses, tlist = [], [], []
    for dx in offsets:
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = dx
        for t in times:
            rgb, _ = render_frame(objects, pose, H, W, focal, t)
            imgs.append(rgb)
            poses.append(pose)
            tlist.append(float(t))
    split = {"train": np.stack(imgs)}
    dataset = ({"train": np.stack(imgs)}, {"train": poses}, {"train": tlist},
               {"train": len(imgs)}, None, None, (H, W, focal))

    cfg = small_cfg(**{
        "renderer.n_rays": 128, "renderer.ndc": True,
        "experiment.vel_reg_n_pts": 128,
        # model lives in the NDC cube; samples linear over NDC depth [0, 1]
        "nvfi.bbox_x": [-1, 1], "nvfi.bbox_y": [-1, 1], "nvfi.bbox_z": [-1, 1],
        "dataset.near": 0.0, "dataset.far": 1.0,
        "nvfi.max_n_samples": 48, "nvfi.num_keyframes": 2,
        "nvfi.num_keyframes_end": 2,
    })
    tr = Trainer(cfg, dataset, mode="static_dynamic")
    assert tr.meta.ray_sampling == "ndc"
    logs = []
    tr.train(iters=80, log_fn=logs.append)
    first, last = logs[0]["psnr_0"], logs[-1]["psnr_0"]
    assert last > first + 3, f"NDC PSNR did not improve: {first} -> {last}"
    assert np.isfinite(logs[-1]["loss"])


def test_checkpoint_roundtrips_gate_world(tmp_path):
    meta = _sur_meta()
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    ck.save(str(tmp_path / "m"), params, meta, extra={})
    _, m2, _, _, _ = ck.load(str(tmp_path / "m"))
    assert m2.vel_gate == meta.vel_gate
    # pre-round-5 sidecar (no 'world' key) still loads, with an inert gate
    import json

    with open(tmp_path / "m.json") as f:
        sidecar = json.load(f)
    del sidecar["meta"]["vel_gate"]["world"]
    with open(tmp_path / "m2.json", "w") as f:
        json.dump(sidecar, f)
    import shutil

    shutil.copy(tmp_path / "m.npz", tmp_path / "m2.npz")
    _, m3, _, _, _ = ck.load(str(tmp_path / "m2"))
    assert m3.vel_gate.world == () and m3.vel_gate.bounds == meta.vel_gate.bounds


# ---------------------------------------------------------------------------
# Indoor room stand-in for the sur-gated family (round-5 fog fix)
# ---------------------------------------------------------------------------

def test_indoor_scenes_have_full_ray_coverage():
    """The sur-gated family stand-ins are closed rooms observed from inside
    (reference datasets/load_blender_dynamic.py: in-room cameras, the black
    background is never visible).  Round-5 diagnosis showed the previous
    open-space black-bg variant lets 89% of the alpha mass collapse into
    ghost fog (scripts/chess_fog_probe.py) — every ray must terminate on
    geometry, so GT coverage must be 100% in every split."""
    from nvfi_tpu.data.synthetic import make_synthetic_scene

    for name in ("chessboard", "carousel"):
        d = make_synthetic_scene(n_train=3, n_val=1, n_test=2, H=24, W=24,
                                 objects=name, white_background=False)
        segm = d[7]["segm"]
        for split in ("train", "test"):
            assert (segm[split] > 0).all(), (name, split)


def test_hollow_room_does_not_mask_mover_velocity():
    """scene_velocity treats a hollow shell as material ONLY on its band:
    the enclosing room must never zero out the velocity of the movers it
    contains, while shell points themselves are static GT."""
    from nvfi_tpu.data.synthetic import chessboard_objects, scene_velocity

    objs = chessboard_objects()
    assert any(o.hollow for o in objs)
    pts = np.array([[0.9, 0.0, 0.0],    # orbiter center: moving
                    [0.0, 0.0, 1.9],    # room shell: static material
                    [0.0, 0.0, 1.2]],   # air inside the room: empty
                   np.float32)
    v = scene_velocity(objs, pts, 0.0)
    assert np.linalg.norm(v[0]) > 1.0
    np.testing.assert_array_equal(v[1], 0.0)
    np.testing.assert_array_equal(v[2], 0.0)
    room = next(o for o in objs if o.hollow)
    assert bool(room.contains(pts[1:2], 0.0)[0])
    assert not bool(room.contains(pts[2:3], 0.0)[0])


def test_render_frame_inside_hollow_sphere():
    """Ray tracing from inside a hollow sphere takes the far root and shades
    with the inward-facing normal — no pixel escapes to the background."""
    from nvfi_tpu.data.synthetic import RigidSphere, render_frame
    from nvfi_tpu.data.blender import _spherical_pose

    room = RigidSphere(center=(0, 0, 0), radius=2.0, color=(0.5, 0.5, 0.5),
                       hollow=True)
    pose = _spherical_pose(30.0, -30.0, 1.0)  # camera INSIDE the sphere
    rgb, segm = render_frame([room], pose, 16, 16, 12.0, 0.0,
                             white_background=False)
    assert (segm == 1).all()
    assert rgb.min() > 0.05  # shaded wall everywhere, never black bg


def test_indoor_scenes_use_fixed_multicamera_rig():
    """The sur-gated family trains from a FIXED multi-camera rig: the
    reference's InDoorSeg loader gives each camera exactly one pose
    (datasets/load_blender_dynamic.py meta['data'][cam]['transform_matrix'])
    and a frame at every timestep, so dynamic geometry is multi-view
    constrained per timestep.  The round-5 diagnosis battery showed the
    monocular moving-camera split (one random pose per timestep) ghost-fits
    at interior-camera coverage and starves the velocity PDE regardless of
    training knobs (BASELINE.md).  Pin: every train timestep is observed
    from n_cams distinct poses, and each camera's pose is time-invariant."""
    from nvfi_tpu.data.synthetic import SCENE_CAMERA, make_synthetic_scene

    for name in ("chessboard", "carousel"):
        n_cams = SCENE_CAMERA[name]["n_cams"]
        assert n_cams >= 4  # the reference ships 4 in-room cameras
        d = make_synthetic_scene(n_train=5, n_val=1, n_test=2, H=16, W=16,
                                 objects=name, white_background=False)
        poses = np.stack([np.asarray(p) for p in d[1]["train"]])
        times = np.asarray(d[2]["train"])
        assert len(times) == 5 * n_cams
        uniq_poses = np.unique(poses.round(5).reshape(len(poses), -1), axis=0)
        assert len(uniq_poses) == n_cams
        for t in np.unique(times):
            sel = poses[times == t]
            assert len(sel) == n_cams
            assert len(np.unique(sel.round(5).reshape(len(sel), -1), axis=0)) == n_cams
        # init split = all cameras at t=0
        assert d[3]["init"] == n_cams

    # open scenes keep the monocular orbit (one pose per timestep)
    d = make_synthetic_scene(n_train=5, n_val=1, n_test=2, H=16, W=16,
                             objects="bat")
    assert len(d[2]["train"]) == 5


def test_heldout_test_protocol_uses_fixed_cameras():
    """The reference's TEST split is also per-fixed-camera: transforms_test
    .json keys frames by camera with one transform_matrix each
    (datasets/load_blender_dynamic.py:89-100) — a handful of static held-out
    viewpoints recording the full time range, not a free orbit.  Pin the
    opt-in heldout_test protocol: fixed rig scenes get exactly two held-out
    poses, each time-invariant, disjoint from the train rig, times spanning
    [0, 1]; open scenes and the default keep the orbit split."""
    from nvfi_tpu.data.synthetic import make_synthetic_scene

    d = make_synthetic_scene(n_train=3, n_val=1, n_test=6, H=16, W=16,
                             objects="chessboard_slow", white_background=False,
                             heldout_test=True)
    test_poses = np.stack([np.asarray(p) for p in d[1]["test"]])
    uniq = np.unique(test_poses.round(5).reshape(len(test_poses), -1), axis=0)
    assert len(uniq) == 2
    train_poses = np.stack([np.asarray(p) for p in d[1]["train"]])
    train_uniq = np.unique(train_poses.round(5).reshape(len(train_poses), -1), axis=0)
    for row in uniq:
        assert not any(np.allclose(row, tr) for tr in train_uniq)
    times = np.asarray(d[2]["test"])
    assert times[0] == 0.0 and times[-1] == 1.0
    # extrapolation split still populated (t > tmax=0.75)
    assert (times > 0.75).any()
    # every held-out camera keeps the movers in frame (a held-out view that
    # stares at a static wall would measure nothing about the dynamics)
    segm = d[7]["segm"]["test"]
    from nvfi_tpu.data.synthetic import chessboard_slow_objects
    objs = chessboard_slow_objects()
    mover_ids = [i + 1 for i, o in enumerate(objs) if not o.hollow
                 and (np.linalg.norm(o.omega) + np.linalg.norm(o.v_lin)) > 0]
    for cam in range(2):
        assert np.isin(segm[cam::2], mover_ids).sum() > 0

    # default stays the orbit split (in-flight evals unaffected), and open
    # scenes ignore the flag (no fixed rig to hold out from)
    d_orbit = make_synthetic_scene(n_train=3, n_val=1, n_test=6, H=16, W=16,
                                   objects="chessboard_slow",
                                   white_background=False)
    orbit_poses = np.stack([np.asarray(p) for p in d_orbit[1]["test"]])
    assert len(np.unique(orbit_poses.round(5).reshape(6, -1), axis=0)) == 6
    d_open = make_synthetic_scene(n_train=3, n_val=1, n_test=6, H=16, W=16,
                                  objects="bat", heldout_test=True)
    open_poses = np.stack([np.asarray(p) for p in d_open[1]["test"]])
    assert len(np.unique(open_poses.round(5).reshape(6, -1), axis=0)) == 6


def test_sur_movers_speed_calibrated_to_keyframe_spacing():
    """The _slow sur-family variants keep every mover's between-keyframe
    displacement inside the advection gradient basin: with K=4 over
    tmax=0.75 (reference config/InDoorSeg/chessboard.yaml:137-141), samples
    snap across offsets up to 0.125 time units; the round-5 battery showed
    displacement beyond ~1/4 of the piece radius leaves velocity at a
    time-symmetric saddle (BASELINE.md).  Pin: displacement per max offset
    <= 0.25 * radius for every mover, and the exact velocity field of the
    slow variant is exactly SUR_SPEED_CALIBRATION x the tex variant's at
    t=0 (where trajectories coincide)."""
    from nvfi_tpu.data.synthetic import (
        SUR_SPEED_CALIBRATION, chessboard_slow_objects, chessboard_tex_objects,
        carousel_slow_objects, scene_velocity)

    max_offset = 0.75 / (4 - 1) / 2.0  # = 0.125
    for objs in (chessboard_slow_objects(), carousel_slow_objects()):
        for obj in objs:
            if obj.hollow:
                continue
            # speed bound over the sphere: |omega| * (r + |c-pivot|) + |v_lin|
            arm = np.linalg.norm(obj.c0 - obj.pivot) + obj.r
            speed = np.linalg.norm(obj.omega) * arm + np.linalg.norm(obj.v_lin)
            if speed == 0.0:
                continue
            assert speed * max_offset <= 0.25 * obj.r + 1e-6, (
                f"mover at {obj.c0} displaces {speed * max_offset:.3f} per max "
                f"keyframe offset (radius {obj.r})")

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, size=(256, 3)).astype(np.float32)
    v_tex = scene_velocity(chessboard_tex_objects(), pts, 0.0)
    v_slow = scene_velocity(chessboard_slow_objects(), pts, 0.0)
    np.testing.assert_allclose(v_slow, SUR_SPEED_CALIBRATION * v_tex,
                               rtol=1e-6, atol=1e-7)


def test_sur_gated_turbo_engages_through_alpha_event(tmp_path):
    """Sur-family throughput mode (VERDICT r4 weak #4 / next #6): the
    reference's InDoorSeg configs never build an alpha mask
    (update_AlphaMask_list: [] — /root/reference/config/InDoorSeg/chessboard.yaml),
    so turbo can never engage there and those scenes train ~2.3x slower than
    the InDoorObj family.  Our opt-in (configs/synth/chessboard_slow_turbo.yaml)
    adds the event to a SUR-GATED scene; this pins the full path on CPU:
    the alpha event fires, the shrink renormalizes the sur world box (mode
    survives), occupancy-pruned sampling engages with a probed budget, the
    step stays exact (dropped_blocks == 0), and training keeps learning."""
    from test_train_e2e import small_cfg, tiny_scene  # noqa: F401 (fixture)
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.train.trainer import Trainer

    scene = make_synthetic_scene(n_train=6, n_val=1, n_test=1, H=32, W=32)
    cfg = small_cfg(**{
        "renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
        "nvfi.max_n_samples": 24, "nvfi.update_AlphaMask_list": [2],
        "nvfi.turbo": True,
        "nvfi.sur_x": [-1.6, 1.6], "nvfi.sur_y": [-1.6, 1.6],
        "nvfi.sur_z": [-1.6, 1.6],
    })
    tr = Trainer(cfg, scene, mode="static_dynamic")
    assert tr.meta.vel_gate.mode == "sur"
    assert not tr.meta.train_occupancy_prune
    m = tr.train(iters=5)
    # the event fired: turbo engaged with a probed (exact) budget...
    assert tr.alpha_state is not None
    assert tr.meta.train_occupancy_prune
    assert 0.0 < tr.meta.block_budget <= 1.0
    if tr.meta.block_budget < 1.0:
        assert float(m["dropped_blocks"]) == 0.0
    # ...and the sur gate survived the shrink with a live world box
    assert tr.meta.vel_gate.mode == "sur"
    assert tr.meta.vel_gate.world, "shrink must carry the world sur box"
    assert np.isfinite(float(m["loss"]))
