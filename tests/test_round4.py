"""Round-4 regression tests: shade-row reuse (single fused quad gather feeds
both passes), configurable sample-block granularity, and the probe/render
agreement at SB=32.

VERDICT r3 item 2: "merge density+app channels into one quad-row table so the
shade pass slices already-gathered rows instead of issuing its own gathers,
then shrink the sample-block granularity".  The channel merge has existed
since round 2 (kplane.init_params); what round 4 adds is the shade pass
CONSUMING the density pass's gathers (``KPlaneMeta.shade_reuse``) and the
``sample_block`` knob.  Both must be bit-equivalent to the round-3 paths —
pinned here, values and gradients.
"""

from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvfi_tpu.fields import kplane
from nvfi_tpu.train import turbo


def make_meta(**kw):
    d = dict(
        grid_size=(24, 24, 24), num_keyframes=4, tmax=0.75,
        aabb=((-2.0,) * 3, (2.0,) * 3), near_far=(2.0, 6.0),
        density_n_comp=8, app_n_comp=8, app_dim=8,
        density_shift=-10.0, distance_scale=25.0,
        alpha_mask_thres=1e-4, raymarch_weight_thres=1e-4,
        feature_c=32, max_n_samples=192, use_vel=True,
    )
    d.update(kw)
    return kplane.KPlaneMeta(**d)


def make_rays(n=32, seed=3, z0=4.0):
    rng = np.random.RandomState(seed)
    ro = jnp.asarray(np.tile([[0.0, 0.0, z0]], (n, 1)).astype(np.float32))
    d = np.concatenate([rng.randn(n, 2) * 0.3, -np.ones((n, 1))], -1)
    rd = jnp.asarray(d.astype(np.float32))
    t = jnp.asarray(rng.rand(n).astype(np.float32) * 0.75)
    return ro, rd, t


def sphere_alpha(meta, g=17, r2=0.35):
    lin = np.linspace(-1, 1, g)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = jnp.asarray(((xx**2 + yy**2 + zz**2) < r2).astype(np.float32))
    return {"volume": vol, "aabb": jnp.asarray(meta.aabb_np),
            "dilated": kplane.corner_dilate(vol)}


# ---------------------------------------------------------------------------
# Shade-row reuse == re-gather path (values AND gradients)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("case", ["topk", "dense_shade", "block_sparse", "turbo"])
def test_shade_reuse_matches_regather(case):
    """The reuse path consumes app features saved by the density pass; the
    re-gather path (round 3) re-gathers the app channels at the selected
    samples.  Same rows, same product, same decode => identical results."""
    kw = dict(density_shift=0.0)  # sizable sigma at init => nonempty app_mask
    alpha_state = None
    training = False
    if case == "dense_shade":
        kw["shade_fraction"] = 1.0
    elif case == "block_sparse":
        # budget 0.5 may drop blocks; BOTH paths drop the same ones, so the
        # comparison stays exact
        kw["block_budget"] = 0.5
    elif case == "turbo":
        kw.update(block_budget=0.6, train_occupancy_prune=True)
        training = True

    meta_re = make_meta(shade_reuse=True, **kw)
    meta_rg = make_meta(shade_reuse=False, **kw)
    if case == "turbo":
        alpha_state = sphere_alpha(meta_re)
    params = kplane.init_params(jax.random.PRNGKey(0), meta_re)
    ro, rd, t = make_rays(n=32)
    key = jax.random.PRNGKey(7)

    out_re = kplane.render_rays(params, meta_re, t, ro, rd, key=key,
                                training=training, white_bg=True,
                                alpha_state=alpha_state)
    out_rg = kplane.render_rays(params, meta_rg, t, ro, rd, key=key,
                                training=training, white_bg=True,
                                alpha_state=alpha_state)
    for k in ("rgb", "depth", "acc"):
        np.testing.assert_allclose(np.asarray(out_re[k]), np.asarray(out_rg[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    assert float(out_re["dropped_blocks"]) == float(out_rg["dropped_blocks"])

    def loss(p, m):
        out = kplane.render_rays(p, m, t, ro, rd, key=key, training=True,
                                 white_bg=True, alpha_state=alpha_state)
        return jnp.sum(out["rgb"] ** 2)

    g_re = jax.grad(loss)(params, meta_re)
    g_rg = jax.grad(loss)(params, meta_rg)
    for a, b in zip(jax.tree.leaves(g_re), jax.tree.leaves(g_rg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_shade_reuse_bf16_close_to_regather_bf16():
    """Mixed-precision: the reuse path stores app rows in the compute dtype;
    both paths run the product chain in bf16, so they agree to bf16 noise."""
    meta_re = make_meta(shade_reuse=True, density_shift=0.0, compute_dtype="bfloat16")
    meta_rg = make_meta(shade_reuse=False, density_shift=0.0, compute_dtype="bfloat16")
    params = kplane.init_params(jax.random.PRNGKey(0), meta_re)
    ro, rd, t = make_rays(n=16)
    key = jax.random.PRNGKey(7)
    out_re = kplane.render_rays(params, meta_re, t, ro, rd, key=key,
                                training=False, white_bg=True)
    out_rg = kplane.render_rays(params, meta_rg, t, ro, rd, key=key,
                                training=False, white_bg=True)
    np.testing.assert_allclose(np.asarray(out_re["rgb"]), np.asarray(out_rg["rgb"]),
                               rtol=0.02, atol=0.02)


# ---------------------------------------------------------------------------
# sample_block=32: probe calibrates at the finer granularity, render is exact
# ---------------------------------------------------------------------------

def test_sample_block_32_turbo_exact():
    """At SB=32 the calibrated budget must still drop zero active blocks, and
    the sparse render must equal the dense occupancy-pruned render exactly."""
    meta = make_meta(use_vel=False, train_occupancy_prune=True, sample_block=32,
                     density_shift=0.0)
    alpha_state = sphere_alpha(meta)

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.5
    H = W = 32
    focal = 35.0
    budget, shade = turbo.measure_block_budget(
        meta, alpha_state, pose[None], H, W, focal, n_rays=128, n_batches=6,
        with_shade=True,
    )
    assert 0.0 < budget <= 1.0
    sparse_meta = replace(meta, block_budget=min(budget, 0.95))
    dense_meta = replace(meta, block_budget=1.0)
    params = kplane.init_params(jax.random.PRNGKey(0), meta)

    from nvfi_tpu.render.rays import ray_bundle

    ro, rd = ray_bundle(pose, H, W, focal)
    rng = np.random.RandomState(5)
    for i in range(3):
        pix = rng.randint(0, H * W, 128)
        args = dict(
            t=jnp.zeros((128,)),
            rays_o=jnp.asarray(ro.reshape(-1, 3)[pix]),
            rays_d=jnp.asarray(rd.reshape(-1, 3)[pix]),
            key=jax.random.PRNGKey(i), training=True, white_bg=True,
            alpha_state=alpha_state,
        )
        out_s = kplane.render_rays(params, sparse_meta, **args)
        out_d = kplane.render_rays(params, dense_meta, **args)
        assert float(out_s["dropped_blocks"]) == 0.0
        np.testing.assert_allclose(np.asarray(out_s["rgb"]),
                                   np.asarray(out_d["rgb"]),
                                   rtol=1e-5, atol=1e-6)


def test_probe_uses_meta_sample_block():
    """The probe's active-block fraction must be measured at the meta's OWN
    block granularity: finer blocks track the occupied chord tighter, so the
    SB=16 fraction can only be <= the SB=64 fraction (+jitter noise)."""
    meta64 = make_meta(use_vel=False, train_occupancy_prune=True)
    meta16 = replace(meta64, sample_block=16)
    alpha_state = sphere_alpha(meta64, r2=0.1)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.5
    b64 = turbo.measure_block_budget(
        meta64, alpha_state, pose[None], 32, 32, 35.0, n_rays=256, n_batches=4)
    b16 = turbo.measure_block_budget(
        meta16, alpha_state, pose[None], 32, 32, 35.0, n_rays=256, n_batches=4)
    assert b16 <= b64 + 0.05


# ---------------------------------------------------------------------------
# Tensor parallelism on the 'model' mesh axis (VERDICT r3 item 7)
# ---------------------------------------------------------------------------

def test_model_axis_tp_matches_unsharded():
    """Channel-sharding the plane tables over a ('data','model') = (4,2) mesh
    must reproduce the unsharded training trajectory (same seeds => same
    batches; XLA inserts the channel-reduction collectives)."""
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.parallel import make_mesh
    from nvfi_tpu.train.trainer import Trainer
    from test_train_e2e import small_cfg

    scene = make_synthetic_scene(n_train=4, n_val=1, n_test=1, H=16, W=16)
    cfg = small_cfg(**{"renderer.n_rays": 64, "experiment.vel_reg_n_pts": 64,
                       "nvfi.max_n_samples": 16})

    tr_ref = Trainer(cfg, scene, mode="static_dynamic")
    m_ref = tr_ref.train(iters=3)

    mesh = make_mesh(8, model_axis=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    tr_tp = Trainer(cfg, scene, mode="static_dynamic", mesh=mesh)
    # the plane tables are actually channel-sharded
    spec = tr_tp.params["planes_space"][0].sharding.spec
    assert "model" in str(spec), spec
    m_tp = tr_tp.train(iters=3)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(tr_tp.params), jax.tree.leaves(tr_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_shard_map_rejects_model_axis():
    from nvfi_tpu.data import make_synthetic_scene
    from nvfi_tpu.parallel import make_mesh
    from nvfi_tpu.train.trainer import Trainer
    from test_train_e2e import small_cfg

    scene = make_synthetic_scene(n_train=2, n_val=1, n_test=1, H=8, W=8)
    cfg = small_cfg(**{"renderer.n_rays": 16, "experiment.vel_reg_n_pts": 16,
                       "nvfi.max_n_samples": 8})
    mesh = make_mesh(8, model_axis=2)
    with pytest.raises(AssertionError):
        Trainer(cfg, scene, mode="static_dynamic", mesh=mesh, spmd="shard_map")


# ---------------------------------------------------------------------------
# Velocity-MLP width knob (extrapolation capacity arm, NEXT.md §6)
# ---------------------------------------------------------------------------

def test_vel_hidden_widens_and_roundtrips(tmp_path):
    """vel_hidden=256 widens both velocity nets; rendering and the checkpoint
    meta roundtrip keep working (old checkpoints default back to 128)."""
    from nvfi_tpu.train import checkpoint

    meta = make_meta(vel_hidden=256)
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    assert params["vel"]["weight_net"][0]["w"].shape[-1] == 256
    ro, rd, t = make_rays(n=8)
    out = kplane.render_rays(params, meta, t, ro, rd,
                             key=jax.random.PRNGKey(1), training=False,
                             white_bg=True)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    p = str(tmp_path / "model")
    checkpoint.save(p, params, meta)
    _, meta2, *_ = checkpoint.load(p)
    assert meta2.vel_hidden == 256
    legacy = {k: v for k, v in checkpoint.meta_to_json(meta).items()
              if k != "vel_hidden"}
    assert checkpoint.meta_from_json(legacy).vel_hidden == 128


def test_cfgnode_deprecated_and_renamed_keys():
    """Reference utils/cfgnode.py:270-319 semantics: deprecated keys warn and
    are IGNORED on merge (file and list); renamed keys raise with the new
    name.  Registries live outside the config content (dump unaffected)."""
    import warnings

    from nvfi_tpu.config import CfgNode

    cfg = CfgNode({"nvfi": {"shade_fraction": 0.25}, "experiment": {"lr": 1.0}})
    cfg.register_deprecated_key("nvfi.old_knob")
    cfg.register_renamed_key("experiment.lr_old", "experiment.lr",
                             message="renamed in round 2")

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg.merge_from_list(["nvfi.old_knob", "3", "nvfi.shade_fraction", "0.5"])
    assert any("deprecated" in str(x.message) for x in w)
    assert "old_knob" not in cfg.nvfi and cfg.nvfi.shade_fraction == 0.5

    with pytest.raises(KeyError, match="renamed to experiment.lr"):
        cfg.merge_from_list(["experiment.lr_old", "2.0"])

    other = CfgNode({"nvfi": {"old_knob": 7, "shade_fraction": 0.125}})
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("ignore")
        cfg.merge_from_other_cfg(other)
    assert "old_knob" not in cfg.nvfi  # nested deprecated key ignored
    assert cfg.nvfi.shade_fraction == 0.125
    assert "_deprecated" not in cfg.dump()  # registry not config content


def test_dt_scale_refines_steps_and_preserves_renders():
    """dt_scale < 1 refines every static RK2 step count consistently; at a
    near-zero velocity field (random init) the refined integrator must agree
    with the coarse one to integration noise."""
    meta1 = make_meta()
    meta_h = replace(meta1, dt_scale=0.5)
    assert meta_h.snap_steps == 2 * meta1.snap_steps
    assert abs(meta_h.dt_max - 0.5 * meta1.dt_max) < 1e-12
    for t in (0.3, 0.75, 0.9, 1.0):
        s1 = kplane.render_steps_for_time(meta1, t)
        sh = kplane.render_steps_for_time(meta_h, t)
        assert sh >= 2 * s1 - 1, (t, s1, sh)

    params = kplane.init_params(jax.random.PRNGKey(0), meta1)
    ro, rd, t = make_rays(n=16)
    t = t * 0.0 + 0.95  # extrapolation times (the probe's regime)
    o1 = kplane.render_rays(params, meta1, t, ro, rd,
                            key=jax.random.PRNGKey(2), training=False,
                            white_bg=True)
    oh = kplane.render_rays(params, meta_h, t, ro, rd,
                            key=jax.random.PRNGKey(2), training=False,
                            white_bg=True)
    np.testing.assert_allclose(np.asarray(o1["rgb"]), np.asarray(oh["rgb"]),
                               atol=5e-3)


# ---------------------------------------------------------------------------
# Chessboard ('sur'-gated family) synthetic preset sanity
# ---------------------------------------------------------------------------

def test_chessboard_preset_respects_surround_box():
    """The sur gate zeroes velocity outside sur_x/y/z (+-1.6); a physically
    consistent scene therefore needs every MOVING object inside the box for
    all t in [0,1], and the static wall outside it stays representable."""
    from nvfi_tpu.data.synthetic import chessboard_objects

    objs = chessboard_objects()
    sur = 1.6
    moving = [o for o in objs if np.any(o.omega) or np.any(o.v_lin)]
    static = [o for o in objs if not (np.any(o.omega) or np.any(o.v_lin))]
    assert len(moving) >= 2 and len(static) >= 2
    for o in moving:
        for t in np.linspace(0, 1, 21):
            c = o.center(t)
            assert (np.abs(c) + o.r < sur).all(), (o.color, t, c)
    # at least one static object sits OUTSIDE the surround box
    assert any((np.abs(o.c0) + o.r > sur).any() for o in static)


# ---------------------------------------------------------------------------
# Device-side exactness counters (advisor r3 medium finding)
# ---------------------------------------------------------------------------

def test_counters_running_max_in_jit_and_check():
    """Pin the counter mechanism that certifies turbo exactness on UNLOGGED
    steps: update_counters folds a per-step running max inside jit (keys the
    step's metrics omit are carried through), and Trainer._check_counters
    surfaces dropped_blocks > 0 loudly, reports dropped_shade at stage
    resets, and restarts the running max only on reset=True."""
    import io
    from contextlib import redirect_stdout
    from types import SimpleNamespace

    from nvfi_tpu.train.trainer import Trainer, init_counters, update_counters

    @jax.jit
    def fold(counters, db, ds):
        return update_counters(
            counters, {"dropped_blocks": db, "dropped_shade": ds})

    c = init_counters()
    assert float(c["dropped_blocks"]) == 0.0 and float(c["dropped_shade"]) == 0.0
    for db, ds in [(0.0, 7.0), (3.0, 2.0), (1.0, 5.0)]:
        c = fold(c, jnp.asarray(db), jnp.asarray(ds))
    assert float(c["dropped_blocks"]) == 3.0   # max, not sum/last
    assert float(c["dropped_shade"]) == 7.0
    # a step whose metrics dict omits a counter key leaves it untouched
    c = update_counters(c, {"dropped_shade": jnp.asarray(9.0)})
    assert float(c["dropped_blocks"]) == 3.0
    assert float(c["dropped_shade"]) == 9.0

    stub = SimpleNamespace(
        counters=c, meta=SimpleNamespace(block_budget=0.2, shade_fraction=0.25))
    buf = io.StringIO()
    with redirect_stdout(buf):
        out = Trainer._check_counters(stub, "unit", reset=False)
    assert out == {"max_dropped_blocks": 3.0, "max_dropped_shade": 9.0}
    assert "EXACTNESS VIOLATION" in buf.getvalue()          # blocks > 0 is loud
    assert float(stub.counters["dropped_blocks"]) == 3.0    # no reset requested

    buf = io.StringIO()
    with redirect_stdout(buf):
        out = Trainer._check_counters(stub, "stage", reset=True)
    assert "stage truncation" in buf.getvalue()             # shade report at stages
    assert float(stub.counters["dropped_blocks"]) == 0.0    # running max restarted
    assert float(stub.counters["dropped_shade"]) == 0.0

    # zero counters: silent, nothing reported even at a reset
    buf = io.StringIO()
    with redirect_stdout(buf):
        out = Trainer._check_counters(stub, "clean", reset=True)
    assert buf.getvalue() == ""
    assert out == {"max_dropped_blocks": 0.0, "max_dropped_shade": 0.0}


# ---------------------------------------------------------------------------
# shade_cap_policy: the config cap vs the probe-follow (exact) policy
# ---------------------------------------------------------------------------

def test_shade_cap_policy():
    """Default policy caps the probed shade bound at the config fraction
    (the quality-evidenced truncating configuration); shade_follow_probe
    uses the probe's provably-exact bound even above the cap.  Either way a
    probe UNDER the cap wins (smaller provably-exact budget)."""
    assert turbo.shade_cap_policy(0.82, 0.25, follow_probe=False) == 0.25
    assert turbo.shade_cap_policy(0.82, 0.25, follow_probe=True) == 0.82
    assert turbo.shade_cap_policy(0.10, 0.25, follow_probe=False) == 0.10
    assert turbo.shade_cap_policy(0.10, 0.25, follow_probe=True) == 0.10
