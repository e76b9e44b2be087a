"""Staged training driver: reconstruction + extrapolation (train_nvfi parity).

Re-designs reference train_nvfi.py:21-369 as a stage loop around a single
fully-jitted train step:

* The coarse-to-fine schedule (exp-spaced voxel counts + keyframe counts over
  ``upsamp_list``, reference :99-112) partitions training into *stages* with
  static shapes; each stage jits once and the optimizer is re-initialized at
  stage boundaries exactly as the reference rebuilds Adam (reference
  :343-357).
* Per-step work — pick pixels from the chosen frame, generate rays from the
  pose (in-jit, from a (F,4,4) pose buffer — no host ray precompute), render
  the random-time batch and the keyframe batch, add L1/TV/PDE regularizers
  with their exponentially-decayed weights (reference :208-239), Adam update
  with per-group exponentially-decayed lrs (reference :248-249) — all happens
  in ONE jit region on device.
* Optional data parallelism: a ``jax.sharding.Mesh`` shards the sampled ray
  batch over chips via sharding constraints; params stay replicated and XLA
  inserts the gradient all-reduce over ICI (SURVEY.md §2.2).

Modes match the reference CLI: 'static' (t=0 frames only), 'static_dynamic'
(joint, the README-recommended flow), 'vel' (velocity-only; fixed here —
broken in the reference, SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
import os
import sys
import time
from dataclasses import dataclass, replace as _dc_replace

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import kplane
from ..physics.pde import vel_pde_loss
from ..eval.metrics import mse2psnr
from . import optim, checkpoint, turbo as turbo_mod


def n_to_reso(n_voxels: int, aabb: np.ndarray) -> list:
    """Voxel-count -> per-axis resolution (reference utils/tensorf_utils.py:53-57)."""
    xyz_min, xyz_max = np.asarray(aabb, dtype=np.float64)
    voxel_size = ((xyz_max - xyz_min).prod() / n_voxels) ** (1 / 3)
    return [int(v) for v in ((xyz_max - xyz_min) / voxel_size)]


def exp_schedule(v0: int, v1: int, n: int) -> list:
    """Exp-spaced schedule, dropping the initial value (reference train_nvfi.py:99-112)."""
    return [int(round(v)) for v in np.exp(np.linspace(np.log(v0), np.log(v1), n + 1))][1:]


@dataclass
class TrainHP:
    """Hyperparameters lifted from the reference cfg.experiment block."""

    lr_grid: float = 0.02
    lr_net: float = 1e-3
    lr_vel: float = 1e-3
    lr_decay_target_ratio: float = 0.1
    lr_decay_iters: int = -1
    lr_upsample_reset: bool = True
    train_iters: int = 30000
    n_rays: int = 2048
    point_batch: int = 131072  # reference renderer.batch_size: ray chunks are
    # sized so chunk_rays * n_samples ~ point_batch, bounding backward HBM
    L1_weight_initial: float = 8e-4
    L1_weight_reset: float = 4e-4
    TV_weight_density: float = 1.0
    TV_weight_app: float = 1.0
    vel_reg_weight: float = 1.0
    vel_reg_no_decay: bool = False  # ablation knob: hold the PDE weight
    # constant instead of the reference's per-iter exponential decay to 0.1x
    # (train_nvfi.py:231) — probes whether the decayed physics loss explains
    # the late-training extrapolation gap (VERDICT r2 weak #3 / NEXT.md)
    vel_reg_n_pts: int = 262144
    vel_occupied_budget: int = 32768  # second-order Jacobian point budget
    # (uniform subsample of occupied candidates; see physics/pde.py)
    pde_mask_filter: bool = False  # turbo-only: filter PDE points by the
    # alpha volume (1 lookup) instead of the reference's advected-density
    # filter (11 RK2 sweeps at 262k pts, ~100 ms/step at bat scale).
    # Measured trade-off on the converged bat scene: ~-0.4 dB test PSNR after
    # a 600-iter continuation (the time-maxed mask keeps a superset of
    # points, diluting the PDE loss) — default OFF; see logs/turbo_quality*.log
    # OBSOLETE since the stratified/prefilter PDE rewrite: it now also
    # MEASURES SLOWER (bypasses the occupancy-routed prefilter; the turbo leg
    # of turbo_quality ran 5x slower with it, logs/turbo_quality_shade125*.log)
    # — kept only so old configs load; superseded by pde_prefilter.
    pde_prefilter: bool = True  # turbo-only, estimator-preserving: the alpha
    # volume ROUTES the Jacobian budget (cheap pre-screen), and the
    # reference's exact advect+density filter runs on just the selected
    # budget points (physics/pde.py vel_pde_loss prefilter_state)
    upsamp_list: tuple = (2000, 4000, 6000, 8000, 10000)
    update_alphamask_list: tuple = ()
    n_voxel_init: int = 262144
    n_voxel_final: int = 8000000
    num_keyframes_end: int = 16
    white_bg: bool = True
    multi_frame: bool = False  # sample each ray from a random frame instead of
    # one camera per step (the reference's latent BatchedRays idea,
    # models/camera.py:7-31); decorrelates batches — off by default for parity
    ndc: bool = False  # renderer.ndc: project training rays into NDC before
    # sampling (reference camera.py:135-157 + tensorf sample_ray_ndc).  The
    # projection near plane is ``ndc_near`` (NeRF-standard 1.0) — the
    # reference reuses cfg.dataset.near for BOTH the projection plane and the
    # sampling range, which only coheres when near is the physical plane and
    # the sampling range covers NDC depth; it ships no NDC config, so the
    # split knob documents the working protocol.
    ndc_near: float = 1.0
    save_every: int = 5000
    print_every: int = 500
    validate_every: int = 1000

    @property
    def lr_factor(self) -> float:
        iters = self.lr_decay_iters if self.lr_decay_iters > 0 else self.train_iters
        return self.lr_decay_target_ratio ** (1.0 / iters)

    @classmethod
    def from_cfg(cls, cfg) -> "TrainHP":
        e = cfg.experiment
        return cls(
            lr_grid=float(e.lr_grid),
            lr_net=float(e.lr_net),
            lr_vel=float(e.get("lr_vel", e.lr_net)),
            lr_decay_target_ratio=float(e.lr_decay_target_ratio),
            lr_decay_iters=int(e.lr_decay_iters),
            lr_upsample_reset=bool(e.lr_upsample_reset),
            train_iters=int(e.train_iters),
            n_rays=int(cfg.renderer.n_rays),
            point_batch=int(cfg.renderer.get("batch_size", 131072)),
            # [sic] reference spelling; factory.yaml omits the key entirely
            # (the reference crashes on it, train_nvfi.py:129) -> default 0
            L1_weight_initial=float(e.get("L1_weight_inital", 0.0)),
            L1_weight_reset=float(e.get("L1_weight_reset", 0.0)),
            TV_weight_density=float(e.TV_weight_density),
            TV_weight_app=float(e.TV_weight_app),
            vel_reg_weight=float(e.vel_reg_weight),
            vel_reg_no_decay=bool(e.get("vel_reg_no_decay", False)),
            vel_reg_n_pts=int(e.vel_reg_n_pts),
            vel_occupied_budget=int(e.get("vel_occupied_budget", 32768)),
            pde_mask_filter=bool(e.get("pde_mask_filter", False)),
            pde_prefilter=bool(e.get("pde_prefilter", True)),
            upsamp_list=tuple(cfg.nvfi.upsamp_list),
            update_alphamask_list=tuple(cfg.nvfi.update_AlphaMask_list),
            n_voxel_init=int(cfg.nvfi.N_voxel_init),
            n_voxel_final=int(cfg.nvfi.N_voxel_final),
            num_keyframes_end=int(cfg.nvfi.num_keyframes_end),
            white_bg=bool(cfg.dataset.white_background),
            multi_frame=bool(e.get("multi_frame_batch", False)),
            ndc=bool(cfg.renderer.get("ndc", False)),
            ndc_near=float(cfg.renderer.get("ndc_near", 1.0)),
            save_every=int(e.save_every),
            print_every=int(e.print_every),
            validate_every=int(e.validate_every),
        )


def decay_scales(lr_factor: float, upsample_reset: bool, opt_step, global_step):
    """Learning-rate decay positions (reference train_nvfi.py:248-249,344-352).

    Returns (grid/net scale, velocity scale).  With ``lr_upsample_reset`` the
    grid/net groups restart their exponential decay at each stage (``opt_step``
    counts from the stage start, and the optimizer is rebuilt there); without
    it they follow the global decay.  The velocity group ALWAYS follows the
    global decay — the reference rebuilds its group at
    ``lr_vel * target_ratio^(epoch/train_iters)`` regardless of the flag.
    """
    base = lr_factor ** (opt_step if upsample_reset else global_step)
    return base, lr_factor ** global_step


def _rays_from_pose(pose, H, W, focal, ii, jj):
    """In-jit pinhole rays at pixel (ii, jj) — OpenGL convention, matching
    host-side rays.ray_bundle (reference models/camera.py:112-138)."""
    x = (jj.astype(jnp.float32) - W * 0.5) / focal
    y = -(ii.astype(jnp.float32) - H * 0.5) / focal
    dirs = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    ray_d = jnp.einsum("nj,ij->ni", dirs, pose[:3, :3])
    ray_o = jnp.broadcast_to(pose[:3, 3], ray_d.shape)
    return ray_o, ray_d


def make_loss_fn(meta: kplane.KPlaneMeta, hp: TrainHP, mode: str, H: int, W: int,
                 focal: float, vel_pts: int | None = None,
                 use_alpha: bool = False, constrain=None):
    """Build the pure per-iteration loss function (renders + regularizers).

    Shared by the automatic-SPMD step (sharding constraints) and the explicit
    shard_map step (which calls it per shard with hp.n_rays already divided).
    """
    n_rays = hp.n_rays
    n_pde = vel_pts if vel_pts is not None else hp.vel_reg_n_pts
    lr_factor = hp.lr_factor
    use_pde = meta.use_vel and mode in ("static_dynamic", "dynamic", "vel") and hp.vel_reg_weight > 0
    if constrain is None:
        def constrain(x):
            return x

    # ray chunking: bound backward-pass activation memory to ~point_batch
    # sample points per chunk (the reference's renderer.batch_size point
    # batchify, reborn as a rematerialized lax.scan).  Under the block-sparse
    # budget only ~budget of each chunk's samples reach the expensive
    # gather/advection activations, so chunks can grow at the same activation
    # memory.  Capped at 2x: the r3 ablation (logs/r3_ablate.log) measured
    # chunk cost LINEAR in rays at 256->512 and superlinear at 1024 (dense) —
    # there is no fixed per-chunk cost to amortize, only HBM-pressure risk.
    n_samples = meta.n_samples
    point_batch = hp.point_batch
    if 0.0 < meta.block_budget < 1.0:
        point_batch = int(point_batch * min(2.0, 1.0 / max(meta.block_budget, 0.25)))
    ray_chunk = max(1, point_batch // max(n_samples, 1))
    while n_rays % ray_chunk:
        ray_chunk -= 1
    n_chunks = n_rays // ray_chunk

    def _maybe_ndc(ray_o, ray_d):
        if meta.ray_sampling != "ndc":
            return ray_o, ray_d
        from ..render.rays import ndc_rays

        return ndc_rays(H, W, focal, hp.ndc_near, ray_o, ray_d, xp=jnp)

    def render_batch(params, key, pose, image, t, alpha_state, advect=True):
        k_pix, k_render = jax.random.split(key)
        pix = jax.random.choice(k_pix, H * W, (n_rays,), replace=False)
        ii, jj = pix // W, pix % W
        ray_o, ray_d = _maybe_ndc(*_rays_from_pose(pose, H, W, focal, ii, jj))
        ray_o, ray_d = constrain(ray_o), constrain(ray_d)
        target = constrain(image[ii, jj])
        return _chunked_mse(params, ray_o, ray_d, target, t, k_render, advect, alpha_state)

    def render_batch_multi(params, key, pool, poses, images, times, alpha_state, advect=True):
        """Epoch-style batch: each ray drawn from a random frame in ``pool``."""
        k_f, k_pix, k_render = jax.random.split(key, 3)
        f = pool[jax.random.randint(k_f, (n_rays,), 0, pool.shape[0])]
        pix = jax.random.randint(k_pix, (n_rays,), 0, H * W)
        ii, jj = pix // W, pix % W
        pose = poses[f]  # (n_rays, 4, 4)
        x = (jj.astype(jnp.float32) - W * 0.5) / focal
        y = -(ii.astype(jnp.float32) - H * 0.5) / focal
        dirs = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
        ray_d = jnp.einsum("nj,nij->ni", dirs, pose[:, :3, :3])
        ray_o = pose[:, :3, 3]
        ray_o, ray_d = _maybe_ndc(ray_o, ray_d)
        ray_o, ray_d = constrain(ray_o), constrain(ray_d)
        target = constrain(images[f, ii, jj])
        tvec = times[f]
        return _chunked_mse(params, ray_o, ray_d, target, tvec, k_render, advect, alpha_state)

    def _chunked_mse(params, ray_o, ray_d, target, t, k_render, advect, alpha_state):
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (n_rays,))

        def chunk_loss(params, ro, rd, tgt, tc, kr):
            out = kplane.render_rays(
                params, meta, tc, ro, rd, key=kr,
                training=True, white_bg=hp.white_bg, advect=advect,
                alpha_state=alpha_state if use_alpha else None,
            )
            return (jnp.sum((out["rgb"] - tgt) ** 2),
                    out["dropped_blocks"], out["dropped_shade"])

        # (sse, dropped_active_blocks, dropped_shade_samples)

        if n_chunks == 1:
            sse, dropped, dshade = chunk_loss(params, ray_o, ray_d, target, t, k_render)
        else:
            chunk_keys = jax.random.split(k_render, n_chunks)

            def body(acc, inp):
                ro, rd, tgt, tc, kr = inp
                s, d, ds = chunk_loss(params, ro, rd, tgt, tc, kr)
                return (acc[0] + s, acc[1] + d, acc[2] + ds), None

            (sse, dropped, dshade), _ = jax.lax.scan(
                body,
                (jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
                (
                    ray_o.reshape(n_chunks, ray_chunk, 3),
                    ray_d.reshape(n_chunks, ray_chunk, 3),
                    target.reshape(n_chunks, ray_chunk, 3),
                    t.reshape(n_chunks, ray_chunk),
                    chunk_keys,
                ),
            )
        return sse / (n_rays * 3), dropped, dshade

    def loss_fn(params, key, frame_idx, key_frame_idx, global_step, poses, images,
                times, pool_all, pool_key, l1_base, l1_step0, alpha_state):
        keys = jax.random.split(key, 4)
        gs = global_step.astype(jnp.float32)
        reg_scale = lr_factor ** (gs + 1.0)

        loss = 0.0
        rgb_loss_t = jnp.zeros(())
        rgb_loss_0 = jnp.zeros(())
        dropped = jnp.zeros(())
        dshade = jnp.zeros(())

        if mode in ("static_dynamic", "dynamic", "vel"):
            if hp.multi_frame:
                rgb_loss_t, d, ds = render_batch_multi(
                    params, keys[0], pool_all, poses, images, times, alpha_state
                )
            else:
                rgb_loss_t, d, ds = render_batch(
                    params, keys[0], poses[frame_idx], images[frame_idx],
                    times[frame_idx], alpha_state
                )
            loss = loss + rgb_loss_t
            dropped = dropped + d
            dshade = dshade + ds
        if mode in ("static", "static_dynamic"):
            # keyframe batch: times are exact keyframes, so advection is a
            # statically-known no-op — skip the two velocity-MLP sweeps
            if hp.multi_frame:
                rgb_loss_0, d, ds = render_batch_multi(
                    params, keys[1], pool_key, poses, images, times, alpha_state,
                    advect=False
                )
            else:
                rgb_loss_0, d, ds = render_batch(
                    params, keys[1], poses[key_frame_idx], images[key_frame_idx],
                    times[key_frame_idx], alpha_state, advect=False
                )
            loss = loss + rgb_loss_0
            dropped = dropped + d
            dshade = dshade + ds

        metrics = {"rgb_loss_t": rgb_loss_t, "rgb_loss_0": rgb_loss_0}
        if 0.0 < meta.block_budget < 1.0:
            # active sample-blocks clipped by the block budget (must stay 0
            # for the run to be math-identical to the dense path)
            metrics["dropped_blocks"] = jax.lax.stop_gradient(dropped)
        if 0.0 < meta.shade_fraction < 1.0:
            # above-threshold samples truncated by the per-ray shade top-K.
            # Nonzero EARLY in training, when compositing weights are still
            # diffuse and thousands of samples sit barely above the 1e-4
            # march threshold; decays to 0 as weights concentrate (visible in
            # the training logs).  The same truncation existed silently in
            # the reference-era global top-K — the counter makes it honest.
            metrics["dropped_shade"] = jax.lax.stop_gradient(dshade)

        if mode in ("static", "static_dynamic"):
            if hp.L1_weight_initial > 0 or (
                hp.L1_weight_reset > 0 and hp.update_alphamask_list
            ):
                # weight decays per-iter like the lr (reference :211) and is
                # replaced by L1_weight_reset at the first alpha-mask update
                # (reference train_nvfi.py:338-340): effective weight
                # l1_base * lr_factor^(gs + 1 - l1_step0), with (l1_base,
                # l1_step0) switched by the Trainer at the stage event.
                l1 = kplane.density_l1(params, meta)
                l1_w = l1_base * lr_factor ** (gs + 1.0 - l1_step0)
                loss = loss + l1_w * l1
                metrics["l1"] = l1
            if hp.TV_weight_density > 0:
                tv_d = kplane.tv_loss_density(params, meta)
                loss = loss + hp.TV_weight_density * reg_scale * tv_d
                metrics["tv_density"] = tv_d
            if hp.TV_weight_app > 0:
                tv_a = kplane.tv_loss_app(params, meta)
                loss = loss + hp.TV_weight_app * reg_scale * tv_a
                metrics["tv_app"] = tv_a

        if use_pde:
            budget = min(hp.vel_occupied_budget, n_pde)
            pde = vel_pde_loss(
                params, meta, keys[2], n_pde, occupied_budget=budget,
                alpha_state=alpha_state if (use_alpha and hp.pde_mask_filter) else None,
                prefilter_state=alpha_state if (
                    use_alpha and hp.pde_prefilter and not hp.pde_mask_filter
                ) else None,
            )
            pde_scale = 1.0 if hp.vel_reg_no_decay else reg_scale
            loss = loss + hp.vel_reg_weight * pde_scale * pde
            metrics["vel_pde"] = pde

        if meta.use_vel and mode in ("static_dynamic", "dynamic", "vel"):
            # live velocity-health probe (round-5 diagnosis: the r4c
            # chessboard run trained to psnr_t 36 with a velocity field
            # indistinguishable from init — this surfaces a dead field
            # DURING training instead of at eval).  Mean gated |v| in
            # normalized units over uniform (x, t); the analytic scenes have
            # mover speeds ~0.9 normalized, so a healthy field reads O(0.1+),
            # a dead one ~0.
            kv1, kv2 = jax.random.split(keys[3])
            vx = jax.random.uniform(kv1, (2048, 3), minval=-1.0, maxval=1.0)
            vt = jax.random.uniform(kv2, (2048, 1))
            from ..fields import velocity as _vel_mod

            vmag = jnp.linalg.norm(
                _vel_mod.gated_velocity(params["vel"], meta.vel_gate, vx, vt),
                axis=-1,
            )
            metrics["vel_mag"] = jax.lax.stop_gradient(jnp.mean(vmag))

        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


def init_counters():
    """Fresh device-side exactness counters: running max over steps of the
    per-step dropped_blocks / dropped_shade metrics (zeros when the step has
    no sparse budgets)."""
    return {
        "dropped_blocks": jnp.zeros(()),
        "dropped_shade": jnp.zeros(()),
    }


def update_counters(counters, metrics):
    """Fold one step's dropped counters into the running max (in-jit; the
    metrics dict statically omits counters the config doesn't enable)."""
    return {
        k: jnp.maximum(counters[k], metrics[k]) if k in metrics else counters[k]
        for k in counters
    }


def _optimizer_update(params, grads, opt_state, hp: TrainHP, mode: str, global_step):
    """Per-group Adam update with the reference's decay semantics (shared by
    both SPMD step variants)."""
    lr_tree = optim.make_lr_tree(params, hp.lr_grid, hp.lr_net, hp.lr_vel)
    if mode == "vel":
        # velocity-only: zero the lr of everything except the velocity net
        lr_tree = {k: jax.tree.map(lambda _: 0.0, v) if k != "vel" else v
                   for k, v in lr_tree.items()}
    lr_scale, vel_scale = decay_scales(
        hp.lr_factor, hp.lr_upsample_reset,
        opt_state["step"].astype(jnp.float32),
        global_step.astype(jnp.float32),
    )
    if "vel" in lr_tree:
        lr_tree = dict(lr_tree)
        lr_tree["vel"] = jax.tree.map(
            lambda lr: lr * vel_scale / lr_scale, lr_tree["vel"]
        )
    return optim.apply_updates(params, grads, opt_state, lr_tree, lr_scale)


def make_train_step(meta: kplane.KPlaneMeta, hp: TrainHP, mode: str, H: int, W: int,
                    focal: float, mesh=None, vel_pts: int | None = None,
                    use_alpha: bool = False):
    """Build the jitted per-iteration step for one stage (automatic SPMD:
    sharding constraints on the ray batch; XLA inserts the ICI all-reduce).

    The returned function has signature
      (params, opt_state, counters, key, frame_idx, key_frame_idx, global_step,
       poses (F,4,4), images (F,H,W,3), times (F,), pool_all, pool_key,
       l1_base, l1_step0, alpha_state)
      -> (params, opt_state, counters, metrics_dict)

    ``counters`` is the device-side running max of the per-step
    dropped_blocks/dropped_shade exactness counters (see ``init_counters``):
    updating it INSIDE the jitted step means every one of the unlogged steps
    between metric fetches is covered, with zero extra host round trips — the
    Trainer checks it at each metric fetch and stage boundary (advisor
    round-3 finding: the counters used to be observed only on logged steps).
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ray_sharding = NamedSharding(mesh, P("data"))

        def constrain(x):
            return jax.lax.with_sharding_constraint(x, ray_sharding)
    else:
        constrain = None

    loss_fn = make_loss_fn(meta, hp, mode, H, W, focal, vel_pts, use_alpha,
                           constrain)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, opt_state, counters, key, frame_idx, key_frame_idx,
                   global_step, poses, images, times, pool_all, pool_key,
                   l1_base, l1_step0, alpha_state):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, key, frame_idx, key_frame_idx, global_step, poses, images,
            times, pool_all, pool_key, l1_base, l1_step0, alpha_state
        )
        counters = update_counters(counters, metrics)
        params, opt_state = _optimizer_update(
            params, grads, opt_state, hp, mode, global_step
        )
        return params, opt_state, counters, metrics

    return train_step


def make_train_step_shard_map(meta: kplane.KPlaneMeta, hp: TrainHP, mode: str,
                              H: int, W: int, focal: float, mesh,
                              vel_pts: int | None = None,
                              use_alpha: bool = False):
    """Explicit-collective data-parallel step: ``shard_map`` over the 'data'
    mesh axis, one ray/PDE sub-batch per device, gradients reduced with an
    explicit ``jax.lax.pmean`` over ICI (the hand-written counterpart of the
    automatic-SPMD step; SURVEY.md §2.2 / §5.8).

    Each device samples its own pixels (key folded with the device index), so
    the global batch is hp.n_rays rays made of D disjoint device sub-batches —
    the same estimator, not bit-identical batches to the automatic step.
    """
    import dataclasses

    try:
        from jax import shard_map as _new_shard_map  # jax >= 0.8

        def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
            # the stable API renamed check_rep -> check_vma
            return _new_shard_map(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_vma=check_rep)
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    D = int(mesh.devices.size)
    assert hp.n_rays % D == 0, f"n_rays {hp.n_rays} not divisible by {D} devices"
    n_pde_total = vel_pts if vel_pts is not None else hp.vel_reg_n_pts
    shard_hp = dataclasses.replace(
        hp, n_rays=hp.n_rays // D,
        vel_occupied_budget=max(1, hp.vel_occupied_budget // D),
    )
    loss_fn = make_loss_fn(meta, shard_hp, mode, H, W, focal,
                           max(1, n_pde_total // D), use_alpha)

    def shard_body(params, key, frame_idx, key_frame_idx, global_step,
                   poses, images, times, pool_all, pool_key, l1_base, l1_step0,
                   alpha_state):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, key, frame_idx, key_frame_idx, global_step, poses, images,
            times, pool_all, pool_key, l1_base, l1_step0, alpha_state
        )
        grads = jax.lax.pmean(grads, "data")      # ICI all-reduce
        metrics = jax.lax.pmean(metrics, "data")  # global-batch means
        return grads, metrics

    replicated = P()

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, opt_state, counters, key, frame_idx, key_frame_idx,
                   global_step, poses, images, times, pool_all, pool_key,
                   l1_base, l1_step0, alpha_state):
        grads, metrics = shard_map(
            shard_body, mesh=mesh,
            in_specs=(replicated,) * 13, out_specs=replicated,
            check_rep=False,
        )(params, key, frame_idx, key_frame_idx, global_step, poses, images,
          times, pool_all, pool_key, l1_base, l1_step0, alpha_state)
        counters = update_counters(counters, metrics)
        params, opt_state = _optimizer_update(
            params, grads, opt_state, hp, mode, global_step
        )
        return params, opt_state, counters, metrics

    return train_step


class Trainer:
    """Stage loop + host-side schedule bookkeeping (the L6 driver)."""

    def __init__(self, cfg, dataset, mode: str = "static_dynamic", logdir: str | None = None,
                 mesh=None, seed: int | None = None, spmd: str = "auto"):
        """``spmd``: 'auto' (sharding constraints; XLA inserts collectives) or
        'shard_map' (explicit per-device shards + pmean) when ``mesh`` given."""
        self.cfg = cfg
        self.hp = TrainHP.from_cfg(cfg)
        self.mode = mode
        self.mesh = mesh
        self.spmd = spmd
        (self.all_imgs, self.all_poses, self.all_times, self.counts,
         _, _, (self.H, self.W, self.focal)) = dataset[:7]
        self.logdir = logdir
        if logdir:
            os.makedirs(logdir, exist_ok=True)

        aabb = np.stack(
            [np.asarray(cfg.nvfi.bbox_x), np.asarray(cfg.nvfi.bbox_y), np.asarray(cfg.nvfi.bbox_z)],
            axis=-1,
        )
        res0 = n_to_reso(self.hp.n_voxel_init, aabb)
        near_far = (float(cfg.dataset.near), float(cfg.dataset.far))
        self.meta = kplane.meta_from_cfg(cfg.nvfi, aabb, res0, near_far)
        if self.hp.ndc:
            # renderer.ndc: rays are NDC-projected (make_loss_fn) and samples
            # drawn linearly over near_far in NDC depth (kplane.sample_ray_ndc)
            assert self.meta.ray_sampling == "box", (
                "renderer.ndc and nvfi.contract_ray are mutually exclusive"
            )
            self.meta = _dc_replace(self.meta, ray_sampling="ndc")
        # turbo: opt-in TPU throughput mode (nvfi.turbo: true).  Training runs
        # the dense parity path until the FIRST alpha-mask stage event, then
        # engages occupancy-pruned sampling + the block-sparse sample axis
        # with a per-stage budget calibrated by a host-side probe
        # (train/turbo.py) — block exactness certified by a device-side
        # running max of the per-step 'dropped_blocks' counter, checked at
        # every metric fetch and stage boundary (_check_counters); the
        # shade top-K truncation accepted by the config cap is quantified
        # the same way via 'dropped_shade'.
        self.turbo = bool(cfg.nvfi.get("turbo", False))
        self.turbo_budget = float(cfg.nvfi.get("turbo_budget", 0.0))  # 0=probe
        self._shade_cap = float(self.meta.shade_fraction)
        # nvfi.shade_follow_probe: let the per-stage shade fraction follow the
        # probe's provably-exact bound even above the config cap (zero shade
        # truncation, slower early stages) — turbo_mod.shade_cap_policy
        self._shade_follow_probe = bool(cfg.nvfi.get("shade_follow_probe", False))
        if self.turbo:
            self.meta = _dc_replace(
                self.meta, train_occupancy_prune=False, block_budget=1.0
            )
        seed = int(cfg.experiment.randomseed) if seed is None else seed
        self.key = jax.random.PRNGKey(seed)
        self.rng = np.random.RandomState(seed)
        self.key, k_init = jax.random.split(self.key)
        self.params = kplane.init_params(k_init, self.meta)
        if (mesh is not None and "model" in mesh.axis_names
                and mesh.shape["model"] > 1):
            assert spmd == "auto", (
                "the 'model' (tensor-parallel) axis requires spmd='auto' — "
                "the explicit shard_map step reduces over 'data' only"
            )
        self._place_params()
        self.alpha_state = None
        self.counters = init_counters()
        self.global_step = 0
        # L1 weight state: (base, step0) — switched at the first alpha-mask
        # event (reference train_nvfi.py:338-340)
        self.l1_base = self.hp.L1_weight_initial
        self.l1_step0 = 0

        # voxel & keyframe upsample schedules (reference train_nvfi.py:99-112)
        n_up = len(self.hp.upsamp_list)
        self.n_voxel_list = exp_schedule(self.hp.n_voxel_init, self.hp.n_voxel_final, n_up)
        self.keyframe_list = exp_schedule(
            self.meta.num_keyframes, self.hp.num_keyframes_end, n_up
        )

        self.reso_mask = tuple(self.meta.grid_size)
        split = "init" if mode == "static" else "train"
        self.split = split
        self._upload_buffers(split)
        self._check_train_times()

    def _place_params(self):
        """Tensor-parallel placement: channel-shard the plane tables over the
        mesh's 'model' axis (parallel/mesh.shard_scene_params).  No-op on
        1-D data meshes.  Re-applied after every stage transition and on
        restore, since upsample/shrink/load build fresh arrays."""
        if (self.mesh is not None and "model" in self.mesh.axis_names
                and self.mesh.shape["model"] > 1):
            from ..parallel.mesh import shard_scene_params

            self.params = shard_scene_params(self.mesh, self.params)

    def _reprobe_turbo(self, tag: str):
        """Re-calibrate the block/shade budgets for the CURRENT meta/mask.
        Called at alpha events, at upsamples (the sample axis refines), and
        on restore (a resumed run must not inherit stale budgets)."""
        if not (self.turbo and self.meta.train_occupancy_prune
                and self.alpha_state is not None):
            return
        budget, shade = turbo_mod.measure_block_budget(
            self.meta, self.alpha_state,
            np.stack([np.asarray(p, dtype=np.float32)
                      for p in self.all_poses[self.split]]),
            self.H, self.W, self.focal, self.hp.n_rays,
            with_shade=True,
        )
        if self.turbo_budget:
            budget = self.turbo_budget
        # The probed shade fraction PROVABLY covers every above-threshold
        # sample, but the occupied-count bound is loose on scenes whose
        # time-maxed mask sweeps most of the ray (measured 0.82 on bat at
        # final scale, i.e. near-dense shading).  Default policy: cap at the
        # config's shade_fraction — the truncating configuration that carries
        # the 30k-run quality evidence (BASELINE.md), with the per-step
        # dropped_shade counter keeping the truncation honest.  The probe
        # still WINS whenever it comes in under the cap (provably-exact
        # smaller budget); nvfi.shade_follow_probe opts into the uncapped
        # exact bound (turbo_mod.shade_cap_policy).
        shade = turbo_mod.shade_cap_policy(shade, self._shade_cap,
                                           self._shade_follow_probe)
        self.meta = _dc_replace(
            self.meta, block_budget=float(budget), shade_fraction=shade
        )
        self._step_cache = {}
        print(f"[turbo] {tag}: block_budget={self.meta.block_budget:.3f} "
              f"shade_fraction={self.meta.shade_fraction:.3f}", flush=True)

    def _check_counters(self, tag: str, reset: bool = False) -> dict:
        """Fetch the device-side running-max exactness counters and surface
        violations loudly (advisor round-3 medium finding).

        ``dropped_blocks`` > 0 means the block budget zeroed REAL samples on
        some step since the last reset — the run has diverged from the dense
        math; warn unmissably.  ``dropped_shade`` > 0 quantifies the top-K
        truncation accepted by the config shade cap (expected early in
        training while compositing weights are diffuse; reported per stage so
        the accepted truncation is measured, not just sampled on logged
        steps).  Returns {'max_dropped_blocks', 'max_dropped_shade'} floats;
        ``reset=True`` (stage boundaries) restarts the running max.
        """
        db = float(self.counters["dropped_blocks"])
        ds = float(self.counters["dropped_shade"])
        if db > 0:
            print(
                f"[turbo] !!! EXACTNESS VIOLATION at {tag}: the block budget "
                f"({self.meta.block_budget:.3f}) dropped up to {db:.0f} active "
                "sample-blocks in a step since the last stage boundary — the "
                "sparse step diverged from dense math; raise nvfi.turbo_budget "
                "or re-probe", flush=True,
            )
        if reset:
            if ds > 0:
                print(f"[turbo] stage truncation at {tag}: max dropped_shade="
                      f"{ds:.0f} samples/step (accepted by shade cap "
                      f"{self.meta.shade_fraction:.3f})", flush=True)
            self.counters = init_counters()
        return {"max_dropped_blocks": db, "max_dropped_shade": ds}

    def _check_train_times(self):
        """Training advection takes ONE RK2 step (kplane.render_rays) on the
        guarantee |t - snap(t)| <= dt_max after keyframe snapping; verify the
        dataset satisfies it (a train frame past tmax would otherwise get
        silently truncated motion — advisor round-2 finding).  Re-checked at
        every upsample since the keyframe count (and so dt_max) changes."""
        t = np.asarray(self.all_times[self.split], dtype=np.float32)
        if not len(t):
            return
        delta = self.meta.time_scale_factor
        base = np.round(np.clip(t / delta, 0, self.meta.num_keyframes - 1)) * delta
        off = float(np.max(np.abs(t - base)))
        assert off <= self.meta.dt_max + 1e-5, (
            f"max train-time offset {off:.4f} exceeds dt_max "
            f"{self.meta.dt_max:.4f} (a training frame lies past tmax); the "
            "one-step training advection would truncate its motion"
        )

    def _upload_buffers(self, split):
        poses = np.stack([np.asarray(p, dtype=np.float32) for p in self.all_poses[split]])
        self.poses_buf = jnp.asarray(poses)
        self.images_buf = jnp.asarray(np.asarray(self.all_imgs[split], dtype=np.float32))
        self.times_buf = jnp.asarray(np.asarray(self.all_times[split], dtype=np.float32))

    def _get_step_fn(self, vel_pts):
        """Cache the jitted step per (meta, vel_pts) so repeated train() calls
        and stage loops never recompile needlessly."""
        cache = getattr(self, "_step_cache", None)
        if cache is None:
            cache = self._step_cache = {}
        use_alpha = bool(
            self.meta.train_occupancy_prune and self.alpha_state is not None
        )
        key = (self.meta, vel_pts, use_alpha, self.spmd)
        if key not in cache:
            if self.mesh is not None and self.spmd == "shard_map":
                cache[key] = make_train_step_shard_map(
                    self.meta, self.hp, self.mode, self.H, self.W, self.focal,
                    self.mesh, vel_pts, use_alpha=use_alpha,
                )
            else:
                cache[key] = make_train_step(
                    self.meta, self.hp, self.mode, self.H, self.W, self.focal,
                    self.mesh, vel_pts, use_alpha=use_alpha,
                )
        return cache[key]

    def _keyframe_frames(self):
        """Train-frame indices whose time hits a keyframe exactly
        (reference train_nvfi.py:183-194)."""
        t = np.asarray(self.all_times[self.split], dtype=np.float32)
        delta = self.meta.time_scale_factor
        base = np.round(np.clip(t / delta, 0, self.meta.num_keyframes - 1)) * delta
        valid = np.where(np.isclose(t, base))[0]
        return valid if len(valid) else np.arange(len(t))

    def train(self, iters: int | None = None, log_fn=None, vel_pts: int | None = None,
              val_fn=None, progress: bool = False, progress_refresh: int = 10):
        """Run the full staged schedule for ``iters`` steps.

        ``progress``: tqdm progress bar with psnr/loss in the description
        (reference train_nvfi.py:138,267-272; refresh cadence from
        cfg.pbar.progress_refresh_rate).
        """
        hp = self.hp
        iters = hp.train_iters if iters is None else iters
        step_fn = self._get_step_fn(vel_pts)
        opt_state = getattr(self, "opt_state", None)
        if opt_state is None:
            opt_state = optim.init_state(self.params)
        key_frames = self._keyframe_frames()
        n_frames = self.counts[self.split]
        metrics = {}
        t_start = time.time()

        pool_all = jnp.arange(n_frames, dtype=jnp.int32)
        pool_key = jnp.asarray(key_frames, dtype=jnp.int32)
        # liveness heartbeat for the --supervise watchdog: every few steps,
        # force a device->host scalar fetch (the only reliable sync through
        # the axon tunnel) and touch <logdir>/heartbeat — fresh mtime proves
        # steps are COMPLETING on the accelerator, not just being dispatched
        hb_path = os.path.join(self.logdir, "heartbeat") if self.logdir else None
        hb_every = 10
        pbar = None
        if progress:
            import tqdm

            pbar = tqdm.tqdm(total=iters, initial=self.global_step,
                             miniters=progress_refresh, file=sys.stdout)
        for it in range(self.global_step, iters):
            self.key, k_step = jax.random.split(self.key)
            frame_idx = self.rng.randint(n_frames)
            key_idx = int(key_frames[self.rng.randint(len(key_frames))])
            self.params, opt_state, self.counters, metrics = step_fn(
                self.params, opt_state, self.counters, k_step,
                jnp.int32(frame_idx), jnp.int32(key_idx), jnp.int32(it),
                self.poses_buf, self.images_buf, self.times_buf,
                pool_all, pool_key,
                jnp.float32(self.l1_base), jnp.float32(self.l1_step0),
                self.alpha_state if self.alpha_state is not None else jnp.zeros(()),
            )
            # advance BEFORE stage events/saves: a checkpoint written below
            # holds the state after completing iteration `it` (incl. any stage
            # transition at `it`), so resume must continue at it+1 — otherwise
            # the upsample event re-fires on an already-consumed schedule.
            self.global_step = it + 1

            if hb_path is not None and it % hb_every == 0:
                float(metrics["loss"])  # device round trip = proof of progress
                from .supervisor import touch

                touch(hb_path)

            if pbar is not None:
                pbar.update(1)
                if it % progress_refresh == 0:
                    # device->host sync happens here anyway for the metrics
                    pbar.set_description(
                        f"Iter {it:05d}: psnr = "
                        f"{mse2psnr(float(metrics.get('rgb_loss_0', 0.0)) or 1.0):.2f}|"
                        f"{mse2psnr(float(metrics.get('rgb_loss_t', 0.0)) or 1.0):.2f}"
                        f" loss = {float(metrics['loss']):.6f}"
                    )
            if log_fn and (it % hp.print_every == 0 or it == iters - 1):
                m = {k: float(v) for k, v in metrics.items()}
                m["psnr_t"] = mse2psnr(m.get("rgb_loss_t", 0.0) or 1.0)
                m["psnr_0"] = mse2psnr(m.get("rgb_loss_0", 0.0) or 1.0)
                m["it"] = it
                m["elapsed"] = time.time() - t_start
                # running-max exactness counters cover EVERY step since the
                # last reset, not just this logged one (advisor r3 finding)
                m.update(self._check_counters(f"it={it}"))
                log_fn(m)

            # validation hook (reference train_nvfi.py:275-330 renders a val
            # view every validate_every); callback gets (trainer, it)
            if val_fn and hp.validate_every > 0 and it % hp.validate_every == 0 and it:
                val_fn(self, it)

            # -- stage events (reference train_nvfi.py:332-357) ---------------
            if it in hp.update_alphamask_list and self.mode in ("static", "static_dynamic"):
                self._check_counters(f"alpha-stage@{it}", reset=True)
                # the reference re-uses the CURRENT grid resolution for the
                # mask only while its volume is < 256^3, otherwise it carries
                # the previous mask resolution forward (train_nvfi.py:335-336)
                if int(np.prod(self.meta.grid_size)) < 256 ** 3:
                    self.reso_mask = tuple(self.meta.grid_size)
                self.alpha_state, new_aabb = kplane.update_alpha_mask(
                    self.params, self.meta, self.reso_mask
                )
                self.params, self.meta = kplane.shrink(self.params, self.meta, new_aabb)
                self._place_params()
                if it == hp.update_alphamask_list[0]:
                    # switch the L1 weight to its reset value; it continues
                    # decaying from here (reference train_nvfi.py:338-340)
                    self.l1_base = hp.L1_weight_reset
                    self.l1_step0 = it + 1
                if self.turbo:
                    # budgets come from _reprobe_turbo: the probed block
                    # budget is used directly, while the probed (provably
                    # exact) shade fraction is CAPPED at the config value —
                    # accepting a truncation that the dropped_shade running
                    # max quantifies per stage (see _reprobe_turbo's policy
                    # note and _check_counters)
                    self.meta = _dc_replace(self.meta, train_occupancy_prune=True)
                    occ = float(np.asarray(self.alpha_state["volume"]).mean())
                    print(f"[turbo] stage@{it}: occupancy={occ:.3f}", flush=True)
                    self._reprobe_turbo(f"stage@{it}")
                self._step_cache = {}
                step_fn = self._get_step_fn(vel_pts)
                opt_state = optim.init_state(self.params)

            if it in hp.upsamp_list and self.mode in ("static", "static_dynamic"):
                self._check_counters(f"upsample@{it}", reset=True)
                n_vox = self.n_voxel_list.pop(0)
                res_cur = n_to_reso(n_vox, self.meta.aabb_np)
                kf_cur = self.keyframe_list.pop(0)
                self.params, self.meta = kplane.upsample(self.params, self.meta, res_cur, kf_cur)
                self._place_params()
                key_frames = self._keyframe_frames()
                pool_key = jnp.asarray(key_frames, dtype=jnp.int32)
                self._check_train_times()
                # re-probe at the new grid scale: n_samples / block count
                # changed, so the budgets calibrated at the last alpha event
                # are stale (typically too conservative — finer sample axes
                # lower the active-block fraction)
                self._reprobe_turbo(f"upsample@{it}")
                self._step_cache = {}
                step_fn = self._get_step_fn(vel_pts)
                # reference resets Adam state and (by default) the lr decay
                # position at upsample (train_nvfi.py:348-357)
                opt_state = optim.init_state(self.params)

            if self.logdir and ((it != 0 and it % hp.save_every == 0) or it == iters - 1):
                self.save(os.path.join(self.logdir, f"model_{it:05d}"), opt_state)

        if pbar is not None:
            pbar.close()
        self.opt_state = opt_state
        return metrics

    def save(self, path: str, opt_state=None):
        checkpoint.save(
            path, self.params, self.meta, opt_state, self.alpha_state,
            extra={
                "global_step": self.global_step,
                "n_voxel_list": self.n_voxel_list,
                "keyframe_list": self.keyframe_list,
                "mode": self.mode,
                "l1_base": self.l1_base,
                "l1_step0": self.l1_step0,
                "reso_mask": list(self.reso_mask),
            },
        )

    def restore(self, path: str):
        params, meta, opt_state, alpha_state, extra = checkpoint.load(path)
        self.params = jax.tree.map(jnp.asarray, params)
        self._place_params()
        self.meta = meta
        self.alpha_state = (
            jax.tree.map(jnp.asarray, alpha_state) if alpha_state else None
        )
        if opt_state is not None:
            self.opt_state = jax.tree.map(jnp.asarray, opt_state)
        self.global_step = int(extra.get("global_step", 0))
        self.n_voxel_list = list(extra.get("n_voxel_list", []))
        self.keyframe_list = list(extra.get("keyframe_list", []))
        self.l1_base = float(extra.get("l1_base", self.hp.L1_weight_initial))
        self.l1_step0 = int(extra.get("l1_step0", 0))
        self.reso_mask = tuple(
            int(v) for v in extra.get("reso_mask", self.meta.grid_size)
        )
        self._step_cache = {}
        # a resumed turbo run must not inherit stale checkpointed budgets
        self._reprobe_turbo(f"restore@{self.global_step}")
        return opt_state
