"""End-to-end training tests on the analytic synthetic scene (CPU).

Matches BASELINE.json config 1 in spirit: a CPU-runnable slice that overfits a
small scene and shows PSNR climbing.  Kept intentionally tiny — the 1-core CI
box pays ~1-2 s/step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvfi_tpu.config import CfgNode
from nvfi_tpu.data import make_synthetic_scene


def small_cfg(**overrides):
    cfg = {
        "experiment": {
            "randomseed": 0, "lr_grid": 0.02, "lr_net": 1e-3,
            "lr_decay_iters": -1, "lr_decay_target_ratio": 0.1,
            "lr_upsample_reset": 1, "train_iters": 200,
            "L1_weight_inital": 8e-4, "L1_weight_reset": 4e-4,
            "TV_weight_density": 1.0, "TV_weight_app": 1.0,
            "vel_reg_weight": 1.0, "vel_reg_n_pts": 256,
            "save_every": 10**9, "print_every": 20, "validate_every": 10**9,
        },
        "dataset": {"near": 2.0, "far": 6.0, "white_background": True},
        "renderer": {"n_rays": 256},
        "nvfi": {
            "bbox_x": [-2, 2], "bbox_y": [-2, 2], "bbox_z": [-2, 2],
            "model_name": "TensorVMKeyframeTimeKplane",
            "N_voxel_init": 16384, "N_voxel_final": 16384,
            "upsamp_list": [], "update_AlphaMask_list": [],
            "density_n_comp": [8, 8, 8], "appearance_n_comp": [8, 8, 8],
            "app_dim": 8, "densityMode": "Density", "shadingMode": "MLP_PE",
            "alphaMask_thres": 1e-4, "rayMarch_weight_thres": 1e-4,
            "density_shift": -10, "distance_scale": 25,
            "pos_pe": 6, "view_pe": 6, "fea_pe": 6, "featureC": 32,
            "step_ratio": 0.5, "fea2denseAct": "softplus",
            "max_n_samples": 48, "num_keyframes": 4, "num_keyframes_end": 4,
            "tmax": 0.75, "use_vel": True,
        },
    }
    c = CfgNode(cfg)
    for k, v in overrides.items():
        node = c
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return c


@pytest.fixture(scope="module")
def tiny_scene():
    return make_synthetic_scene(n_train=10, n_val=2, n_test=2, H=32, W=32)


def test_static_dynamic_training_learns(tiny_scene):
    from nvfi_tpu.train.trainer import Trainer

    cfg = small_cfg()
    tr = Trainer(cfg, tiny_scene, mode="static_dynamic")
    logs = []
    tr.train(iters=120, log_fn=logs.append)
    first = logs[0]["psnr_0"]
    last = logs[-1]["psnr_0"]
    assert last > first + 4, f"PSNR did not improve: {first} -> {last}"
    assert np.isfinite(logs[-1]["loss"])


def test_sharded_step_runs_and_is_finite(tiny_scene):
    """Data-parallel step over the virtual 8-device mesh."""
    from nvfi_tpu.parallel import make_mesh
    from nvfi_tpu.train.trainer import Trainer

    mesh = make_mesh(8)
    cfg = small_cfg(**{"renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
                       "nvfi.max_n_samples": 24})
    tr = Trainer(cfg, tiny_scene, mode="static_dynamic", mesh=mesh)
    metrics = tr.train(iters=2)
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_matches_unsharded(tiny_scene):
    """One sharded step must equal the single-device step numerically
    (same seeds => same pixel batch => same grads up to reduction order)."""
    from nvfi_tpu.parallel import make_mesh
    from nvfi_tpu.train.trainer import Trainer

    kw = {"renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
          "nvfi.max_n_samples": 24}
    tr_a = Trainer(small_cfg(**kw), tiny_scene, mode="static_dynamic")
    tr_b = Trainer(small_cfg(**kw), tiny_scene, mode="static_dynamic",
                   mesh=make_mesh(8))
    m_a = tr_a.train(iters=3)
    m_b = tr_b.train(iters=3)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(tr_a.params), jax.tree.leaves(tr_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5)


def test_segm_training_separates_motion_clusters(tiny_scene):
    """MaskField distillation on an analytic two-motion scene: after a few
    iterations points with different rigid motions should land in different
    argmax slots more often than chance."""
    from nvfi_tpu.train.trainer import Trainer
    from nvfi_tpu.train.segm import SegmTrainer
    from nvfi_tpu.fields import mask_field

    cfg = small_cfg(**{"renderer.n_rays": 256})
    cfg["segmentation"] = CfgNode({
        "n_object": 4, "n_iters": 30, "smooth_iter": 20, "lrate": 0.005,
        "lrate_decay": 1.0, "lrate_decay_step": 1000, "save_freq": 10**9,
        "loss_smooth_w": 0.1, "alpha_scale": 10, "n_sample_res": 16,
        "min_t": 0.5,
    })
    # train the scene briefly so density/velocity are non-degenerate
    tr = Trainer(cfg, tiny_scene, mode="static_dynamic")
    tr.train(iters=60)

    seg = SegmTrainer(cfg, tr.params, tr.meta, point_budget=512)
    metrics = seg.train(iters=12)
    assert np.isfinite(float(metrics["loss"]))
    # forward pass produces a valid distribution
    out = mask_field.apply(seg.mask_params, jnp.zeros((5, 3)))
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)


def test_lr_upsample_reset_and_vel_lr_decay(tiny_scene):
    """lr_upsample_reset semantics (reference train_nvfi.py:344-352): with the
    flag, grid/net lrs restart their decay after an upsample; without it they
    continue the global decay.  The velocity group always follows the global
    decay at lr_vel.  The first Adam step after the stage rebuild has
    |update| ~= lr_scale * lr elementwise (mhat/sqrt(vhat) ~= sign(g)), so the
    update magnitudes measure the lr directly."""
    from nvfi_tpu.train.trainer import Trainer

    kw = {
        "renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
        "nvfi.max_n_samples": 24, "nvfi.upsamp_list": [2],
        "experiment.lr_decay_target_ratio": 0.01, "experiment.train_iters": 10,
        "experiment.lr_vel": 1e-3,
    }
    lr_factor = 0.01 ** (1 / 10)

    def first_post_upsample_update(reset):
        cfg = small_cfg(**kw)
        cfg.experiment.lr_upsample_reset = reset
        tr = Trainer(cfg, tiny_scene, mode="static_dynamic")
        tr.train(iters=3)  # steps 0,1,2; upsample event fires after step 2
        before = jax.tree.map(np.asarray, tr.params)
        tr.train(iters=4)  # step 3: first step of the new stage
        d_net = np.median(np.abs(np.asarray(tr.params["shader"][0]["w"])
                                 - before["shader"][0]["w"]))
        d_vel = np.median(np.abs(
            np.asarray(tr.params["vel"]["weight_net"][0]["w"])
            - before["vel"]["weight_net"][0]["w"]))
        return d_net, d_vel

    d_net_reset, _ = first_post_upsample_update(1)
    d_net_cont, _ = first_post_upsample_update(0)

    # both runs share seeds => identical grads at step 3, so the update ratio
    # is exactly the lr-scale ratio: reset ~ 1, continued ~ lr_factor^3
    ratio = d_net_cont / d_net_reset
    assert abs(ratio - lr_factor**3) < 0.1, (ratio, lr_factor**3)

    # the velocity group's decay position is unit-tested directly (its grads
    # are near Adam eps this early, so a behavioral magnitude test is noisy)
    from nvfi_tpu.train.trainer import decay_scales

    base, vel = decay_scales(lr_factor, True, 0.0, 3.0)
    assert base == pytest.approx(1.0) and vel == pytest.approx(lr_factor**3)
    base, vel = decay_scales(lr_factor, False, 0.0, 3.0)
    assert base == pytest.approx(lr_factor**3) and vel == pytest.approx(lr_factor**3)


def test_l1_weight_reset_switches_at_first_alphamask(tiny_scene):
    """L1_weight_reset replaces the L1 weight at the first alpha-mask event and
    decays from there (reference train_nvfi.py:338-340)."""
    from nvfi_tpu.train.trainer import Trainer

    cfg = small_cfg(**{
        "renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
        "nvfi.max_n_samples": 24, "nvfi.update_AlphaMask_list": [1],
    })
    tr = Trainer(cfg, tiny_scene, mode="static_dynamic")
    assert tr.l1_base == pytest.approx(8e-4)
    m = tr.train(iters=3)
    assert tr.l1_base == pytest.approx(4e-4)
    assert tr.l1_step0 == 2
    assert np.isfinite(float(m["loss"]))


def test_turbo_occupancy_pruned_training(tiny_scene):
    """Opt-in turbo: after the alpha-mask event, training prunes masked
    samples (train_occupancy_prune) under the block-sparse budget and keeps
    learning; dropped_blocks metric is reported."""
    from nvfi_tpu.train.trainer import Trainer

    cfg = small_cfg(**{
        "renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
        "nvfi.max_n_samples": 24, "nvfi.update_AlphaMask_list": [2],
        "nvfi.train_occupancy_prune": True, "nvfi.block_budget": 0.9,
    })
    tr = Trainer(cfg, tiny_scene, mode="static_dynamic")
    assert tr.meta.train_occupancy_prune
    m = tr.train(iters=5)
    assert tr.alpha_state is not None
    assert "dropped_blocks" in m
    assert np.isfinite(float(m["loss"]))


def test_turbo_engages_at_alpha_event_with_probed_budget(tiny_scene):
    """nvfi.turbo: training runs dense until the first alpha-mask stage
    event, then flips to occupancy-pruned sampling with a block budget
    calibrated by the numpy probe — and drops zero active blocks."""
    from nvfi_tpu.train.trainer import Trainer

    cfg = small_cfg(**{
        "renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
        "nvfi.max_n_samples": 24, "nvfi.update_AlphaMask_list": [2],
        "nvfi.turbo": True,
    })
    tr = Trainer(cfg, tiny_scene, mode="static_dynamic")
    # dense parity path before the event
    assert not tr.meta.train_occupancy_prune
    assert tr.meta.block_budget == 1.0
    m = tr.train(iters=6)
    assert tr.alpha_state is not None
    assert tr.meta.train_occupancy_prune
    assert 0.0 < tr.meta.block_budget <= 1.0
    assert np.isfinite(float(m["loss"]))
    if tr.meta.block_budget < 1.0:
        assert float(m["dropped_blocks"]) == 0.0


def test_vel_mode_trains_only_velocity(tiny_scene):
    """mode='vel' (broken in the reference: train_nvfi.py:89 references a
    nonexistent nvfi.velocity_field — SURVEY §2.3): the velocity-only mode
    must update params['vel'] and NOTHING else (grids, decoders, shader all
    frozen via zeroed per-group lrs)."""
    from nvfi_tpu.train.trainer import Trainer

    cfg = small_cfg(**{"renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
                       "nvfi.max_n_samples": 24})
    tr = Trainer(cfg, tiny_scene, mode="vel")
    before = jax.tree.map(np.asarray, tr.params)
    m = tr.train(iters=3)
    assert np.isfinite(float(m["loss"]))
    after = jax.tree.map(np.asarray, tr.params)

    def max_delta(sub_b, sub_a):
        return max(
            float(np.max(np.abs(b - a)))
            for b, a in zip(jax.tree.leaves(sub_b), jax.tree.leaves(sub_a))
        )

    assert max_delta(before["vel"], after["vel"]) > 0.0, "velocity net frozen"
    for k in before:
        if k == "vel":
            continue
        assert max_delta(before[k], after[k]) == 0.0, f"{k} changed in vel mode"


def test_shard_map_step_trains(tiny_scene):
    """Explicit-collective variant: shard_map over the 8-device mesh with
    per-device ray sub-batches and pmean'd gradients learns like the
    automatic-SPMD step."""
    from nvfi_tpu.parallel import make_mesh
    from nvfi_tpu.train.trainer import Trainer

    cfg = small_cfg(**{"renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
                       "nvfi.max_n_samples": 24})
    tr = Trainer(cfg, tiny_scene, mode="static_dynamic", mesh=make_mesh(8),
                 spmd="shard_map")
    logs = []
    tr.train(iters=120, log_fn=logs.append)
    assert np.isfinite(logs[-1]["loss"])
    # same improvement bar as the automatic-SPMD learns-test at this budget
    assert logs[-1]["psnr_0"] > logs[0]["psnr_0"] + 3, (
        logs[0]["psnr_0"], logs[-1]["psnr_0"])


def test_checkpoint_resume_across_stage_boundary(tiny_scene, tmp_path):
    """Regression: a checkpoint saved AT a stage-event iteration holds the
    post-event state and must resume at it+1 — resuming used to re-fire the
    upsample on an already-consumed schedule (IndexError)."""
    from nvfi_tpu.train.trainer import Trainer

    kw = {"renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
          "nvfi.max_n_samples": 24, "nvfi.upsamp_list": [2],
          "experiment.save_every": 2, "nvfi.N_voxel_final": 32768}
    cfg = small_cfg(**kw)
    tr = Trainer(cfg, tiny_scene, mode="static_dynamic", logdir=str(tmp_path))
    tr.train(iters=3)  # save fires at it=2, right after the upsample event
    assert (tmp_path / "model_00002.npz").exists()
    assert tr.n_voxel_list == []

    tr2 = Trainer(cfg, tiny_scene, mode="static_dynamic", logdir=str(tmp_path))
    from nvfi_tpu.train import checkpoint as ck
    tr2.restore(ck.find_checkpoint(str(tmp_path), -1))
    assert tr2.global_step == 3  # it+1: does not re-enter the event iteration
    assert tr2.n_voxel_list == []
    m = tr2.train(iters=5)  # would IndexError before the fix
    assert np.isfinite(float(m["loss"]))
    assert tr2.meta.grid_size == tr.meta.grid_size


def test_turbo_reprobe_caps_shade_at_config(tiny_scene):
    """The turbo budget re-probe returns a PROVABLE per-ray shade bound, but
    on high-occupancy masks that bound approaches dense shading (measured
    0.82 on bat at final scale).  The policy caps it at the config's
    shade_fraction — the truncating configuration that carries the 30k-run
    quality evidence — while keeping any probed bound that comes in lower."""
    from dataclasses import replace
    from nvfi_tpu.train.trainer import Trainer

    # the 0.25 cap is an explicit opt-in since round 5 (exact by default)
    cfg = small_cfg(**{"nvfi.turbo": True, "nvfi.shade_fraction": 0.25})
    tr = Trainer(cfg, tiny_scene, mode="static_dynamic")
    # before the first alpha event turbo runs dense (budgets un-probed)
    assert tr.meta.block_budget == 1.0
    assert not tr.meta.train_occupancy_prune

    # an all-occupied mask makes the probed shade bound ~1.0 (near-dense)
    tr.alpha_state = {
        "volume": jnp.ones((16, 16, 16), jnp.float32),
        "aabb": jnp.asarray([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]],
                            jnp.float32),
    }
    tr.meta = replace(tr.meta, train_occupancy_prune=True)
    tr._reprobe_turbo("test")
    assert tr.meta.shade_fraction == pytest.approx(0.25)  # capped at config
    assert 0.0 < tr.meta.block_budget <= 1.0


def test_render_split_resets_training_turbo_budgets(tiny_scene):
    """Eval renders from a turbo checkpoint's meta must be exact: the
    training-probed block/shade budgets are calibrated for train rays and can
    truncate full-frame eval views (observed on the 30k turbo scene), and
    render_split raises on any drop — so it must strip them first."""
    from dataclasses import replace
    from nvfi_tpu.eval.harness import render_split
    from nvfi_tpu.train.trainer import Trainer

    cfg = small_cfg()
    tr = Trainer(cfg, tiny_scene, mode="static_dynamic")
    tr.train(iters=2)
    # absurdly small budgets: would certainly truncate (and so raise) if used
    meta_turbo = replace(tr.meta, train_occupancy_prune=True,
                         block_budget=0.05, shade_fraction=0.02)
    preds, errors = render_split(tr.params, meta_turbo, tiny_scene[:7], "val",
                                 white_bg=True, alpha_grid=16)
    assert np.isfinite(preds).all()
    assert np.isfinite(errors["psnr"])


def test_shade_follow_probe_uncaps_the_stage_shade(tiny_scene, monkeypatch):
    """nvfi.shade_follow_probe: _reprobe_turbo adopts the probe's exact shade
    bound even above the config cap (zero shade truncation by construction);
    default policy caps at the config fraction.  Probe monkeypatched so the
    policy branch is what's under test."""
    from nvfi_tpu.train.trainer import Trainer
    from nvfi_tpu.train import turbo as turbo_mod

    def fake_probe(*a, **kw):
        return 0.5, 0.9  # budget, probed shade (above the 0.25 cap)

    for follow, expect in [(False, 0.25), (True, 0.9)]:
        cfg = small_cfg(**{
            "renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
            "nvfi.max_n_samples": 24, "nvfi.turbo": True,
            "nvfi.shade_fraction": 0.25,
            "nvfi.shade_follow_probe": follow,
        })
        tr = Trainer(cfg, tiny_scene, mode="static_dynamic")
        from dataclasses import replace as _rep
        tr.meta = _rep(tr.meta, train_occupancy_prune=True)
        tr.alpha_state = {"volume": jnp.ones((4, 4, 4)),
                          "aabb": jnp.asarray([[-1.0] * 3, [1.0] * 3])}
        monkeypatch.setattr(turbo_mod, "measure_block_budget", fake_probe)
        tr._reprobe_turbo("test")
        assert tr.meta.shade_fraction == expect, (follow, tr.meta.shade_fraction)
        assert tr.meta.block_budget == 0.5
