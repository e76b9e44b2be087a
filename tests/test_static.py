"""Static TensoRF VM/CP: rendering shapes + single-frame overfit (BASELINE config 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvfi_tpu.config import CfgNode
from nvfi_tpu.data import make_synthetic_scene
from nvfi_tpu.fields import tensorf_vm


def static_cfg(model="TensorVMSplit"):
    return CfgNode({
        "experiment": {
            "randomseed": 0, "lr_grid": 0.02, "lr_net": 1e-3,
            "lr_decay_iters": -1, "lr_decay_target_ratio": 0.1,
            "lr_upsample_reset": 1, "train_iters": 150,
            "L1_weight_inital": 8e-4, "L1_weight_reset": 4e-4,
            "TV_weight_density": 0.0, "TV_weight_app": 0.0,
            "vel_reg_weight": 0.0, "vel_reg_n_pts": 64,
            "save_every": 10**9, "print_every": 20, "validate_every": 10**9,
        },
        "dataset": {"near": 2.0, "far": 6.0, "white_background": True},
        "renderer": {"n_rays": 256},
        "nvfi": {
            "bbox_x": [-2, 2], "bbox_y": [-2, 2], "bbox_z": [-2, 2],
            "model_name": model,
            "N_voxel_init": 16384, "N_voxel_final": 16384,
            "upsamp_list": [], "update_AlphaMask_list": [],
            "density_n_comp": [8, 8, 8], "appearance_n_comp": [8, 8, 8],
            "app_dim": 8, "densityMode": "Density", "shadingMode": "MLP_PE",
            "alphaMask_thres": 1e-4, "rayMarch_weight_thres": 1e-4,
            "density_shift": -10, "distance_scale": 25,
            "pos_pe": 6, "view_pe": 6, "fea_pe": 6, "featureC": 32,
            "step_ratio": 0.5, "fea2denseAct": "softplus",
            "max_n_samples": 48, "num_keyframes": 1, "num_keyframes_end": 1,
            "tmax": 0.0, "use_vel": False,
        },
    })


@pytest.mark.parametrize("decomp", ["VM", "CP"])
def test_static_render_shapes(decomp):
    meta = tensorf_vm.StaticMeta(
        grid_size=(16, 16, 16), aabb=((-2.0,) * 3, (2.0,) * 3), near_far=(2.0, 6.0),
        density_n_comp=4, app_n_comp=4, app_dim=4, density_shift=-10.0,
        distance_scale=25.0, alpha_mask_thres=1e-4, raymarch_weight_thres=1e-4,
        decomposition=decomp, feature_c=32, max_n_samples=32,
    )
    params = tensorf_vm.init_params(jax.random.PRNGKey(0), meta)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (8, 1))
    rays_d = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (8, 2)) * 0.1, -jnp.ones((8, 1))], -1
    )
    out = tensorf_vm.render_rays(
        params, meta, rays_o, rays_d, key=jax.random.PRNGKey(2),
        training=False, white_bg=True,
    )
    assert out["rgb"].shape == (8, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    p2, m2 = tensorf_vm.upsample(params, meta, (24, 20, 28))
    assert m2.grid_size == (24, 20, 28)
    if decomp == "VM":
        assert p2["density_plane"][0].shape == (20, 24, 4)
    assert p2["density_line"][0].shape == (28, 4)  # vec_mode[0] = z axis


def test_static_vm_overfits_single_frame():
    from nvfi_tpu.train.static import StaticTrainer

    data = make_synthetic_scene(n_train=6, n_val=1, n_test=1, H=32, W=32)
    tr = StaticTrainer(static_cfg(), data)
    logs = []
    tr.train(iters=120, log_fn=logs.append)
    assert logs[-1]["psnr_0"] > logs[0]["psnr_0"] + 4


def test_static_alphamask_shrink_stage():
    """Alpha-mask + shrink stage event on the static VM path: the aabb
    tightens around the object and training continues finite (reference
    TensorBase.updateAlphaMask/shrink, tensorf_base.py:356-405,926-968)."""
    from nvfi_tpu.train.static import StaticTrainer

    data = make_synthetic_scene(n_train=6, n_val=1, n_test=1, H=32, W=32)
    cfg = static_cfg()
    cfg.nvfi.update_AlphaMask_list = [4]
    tr = StaticTrainer(cfg, data)
    old_vol = float(np.prod(tr.meta.aabb_size))
    logs = []
    tr.train(iters=8, log_fn=logs.append)
    assert tr.alpha_state is not None
    assert tr.alpha_state["volume"].ndim == 3
    new_vol = float(np.prod(tr.meta.aabb_size))
    assert new_vol <= old_vol + 1e-6
    assert np.isfinite(logs[-1]["loss"])
