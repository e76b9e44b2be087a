"""Reference-YAML compatibility: all 10 shipped reference scene configs load
unmodified through load_config -> TrainHP.from_cfg -> meta_from_cfg (including
the InDoorSeg ``sur_x/y/z`` -> VelocityAABBSur gate path,
/root/reference/config/InDoorSeg/chessboard.yaml:99-103), and a downsized
merge_from_list copy drives one real CPU train step.
"""

import glob
import os

import numpy as np
import pytest

REF_CFG_DIR = "/root/reference/config"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# the reference's 10 configs + our shipped mirrors of them
ALL_CONFIGS = sorted(
    glob.glob(os.path.join(REF_CFG_DIR, "*", "*.yaml"))
    + glob.glob(os.path.join(REPO, "configs", "indoor_*", "*.yaml"))
)

pytestmark = pytest.mark.skipif(
    not ALL_CONFIGS, reason="reference configs not present in this image"
)


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: "/".join(p.split("/")[-3:]))
def test_reference_config_builds_model(path):
    from nvfi_tpu.config import load_config
    from nvfi_tpu.fields import kplane
    from nvfi_tpu.train.trainer import TrainHP, n_to_reso

    cfg = load_config(path)
    hp = TrainHP.from_cfg(cfg)
    assert hp.train_iters in (30000, 50000)
    assert hp.n_rays == int(cfg.renderer.n_rays)

    aabb = np.stack(
        [np.asarray(cfg.nvfi.bbox_x), np.asarray(cfg.nvfi.bbox_y),
         np.asarray(cfg.nvfi.bbox_z)], axis=-1,
    )
    res0 = n_to_reso(int(cfg.nvfi.N_voxel_init), aabb)
    meta = kplane.meta_from_cfg(
        cfg.nvfi, aabb, res0, (float(cfg.dataset.near), float(cfg.dataset.far))
    )
    assert meta.num_keyframes == int(cfg.nvfi.num_keyframes)
    # darkroom.yaml ships the bitrotted value "0.75 4" (stray token,
    # /root/reference/config/InDoorSeg/darkroom.yaml:141) — lenient coercion
    # takes the first token
    want_tmax = float(str(cfg.nvfi.tmax).split()[0])
    assert meta.tmax == pytest.approx(want_tmax)

    if "sur_x" in cfg.nvfi:
        # InDoorSeg: surround-gated velocity (VelocityAABBSur), bounds
        # normalized into [-1,1] grid coords exactly as the reference does
        # (velocity_field.py:36-51, tensorf_keyframe.py:100-107)
        assert meta.vel_gate.mode == "sur"
        lo, hi = np.asarray(meta.vel_gate.bounds)
        sur = np.stack([cfg.nvfi.sur_x, cfg.nvfi.sur_y, cfg.nvfi.sur_z], axis=-1)
        want = (sur - aabb[0]) * 2.0 / (aabb[1] - aabb[0]) - 1.0
        np.testing.assert_allclose(lo, want[0], rtol=1e-6)
        np.testing.assert_allclose(hi, want[1], rtol=1e-6)
        assert np.all(lo >= -1.0 - 1e-6) and np.all(hi <= 1.0 + 1e-6)
    else:
        assert meta.vel_gate.mode == "aabb"


@pytest.mark.parametrize(
    "path",
    [os.path.join(REF_CFG_DIR, "InDoorObj", "bat.yaml"),
     os.path.join(REF_CFG_DIR, "InDoorSeg", "chessboard.yaml")],
    ids=["InDoorObj/bat", "InDoorSeg/chessboard"],
)
def test_reference_config_one_train_step(path):
    """One real train step from a reference YAML, downsized via the config
    system's own merge_from_list (the reference CLI-override mechanism)."""
    from nvfi_tpu.config import load_config
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.train.trainer import Trainer

    cfg = load_config(path, overrides=[
        "renderer.n_rays", "64",
        "experiment.vel_reg_n_pts", "64",
        "nvfi.max_n_samples", "24",
        "nvfi.N_voxel_init", "4096",
        "nvfi.N_voxel_final", "4096",
        "experiment.train_iters", "2",
    ])
    cfg.nvfi.upsamp_list = []
    cfg.nvfi.update_AlphaMask_list = []
    scene = make_synthetic_scene(
        n_train=4, n_val=1, n_test=1, H=16, W=16,
        white_background=bool(cfg.dataset.white_background),
    )
    tr = Trainer(cfg, scene, mode="static_dynamic")
    metrics = tr.train(iters=2)
    assert np.isfinite(float(metrics["loss"]))
