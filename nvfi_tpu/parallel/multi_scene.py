"""Multi-scene parallel training: N scenes, one mesh slot each.

The reference trains one scene per process per GPU; a TPU pod makes the whole
benchmark suite one program: per-scene params/optimizer states are stacked on
a leading scene axis, the single-scene train step is ``vmap``-ed over it, and
the scene axis is sharded over the mesh — every chip trains its own scene(s)
with zero cross-chip communication (scenes are independent).

Constraint: scenes must share the SAME static structure (grid size, keyframe
count, aabb, flags) since one jitted program serves all — true for the
reference's InDoorObj suite, whose six scenes share every shape-affecting
config value (config/InDoorObj/*.yaml differ only in dataset paths).

Stage events (round 4, VERDICT r3 item 4): the REAL reference schedule —
alpha-mask + shrink events and voxel/keyframe upsamples
(reference train_nvfi.py:332-357) — runs across the stacked scene axis by a
host-side per-stage re-stack: unstack scenes, apply the pure single-scene
transition to each, re-stack under the new (shared) meta, re-jit.  Shrink
keeps the shared-shape invariant by cropping every scene to the UNION of the
per-scene occupied boxes (the union box is correct for each scene — shrink is
an optimization, not semantics; a per-scene tight crop would give scenes
different static shapes and break the single-program constraint).  The
per-scene alpha volumes are kept (stacked) for eval-time pruning exactly like
the single-scene trainer.

Turbo (nvfi.turbo: true) engages at the first alpha event like the
single-scene Trainer: budgets are probe-calibrated PER SCENE
(train/turbo.measure_block_budget) and the shared static budget is the MAX
over scenes — every scene provably keeps all its active blocks (a scene's
budget never falls below its own probe), at the cost of the sparsity of the
emptiest scene being bounded by the fullest.  The probed shade fraction is
capped at the config value exactly like Trainer._reprobe_turbo.  Per-scene
device-side running-max counters certify exactness (checked at stage
boundaries and train() exit; a nonzero dropped_blocks on ANY scene warns
unmissably).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import kplane
from ..train import optim
from ..train.trainer import TrainHP, init_counters, make_train_step


def stack_scenes(scene_params: list) -> dict:
    """Stack per-scene param pytrees along a new leading scene axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *scene_params)


def unstack_scenes(stacked, n_scenes: int) -> list:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n_scenes)]


class MultiSceneTrainer:
    """vmap-over-scenes wrapper around the single-scene train step."""

    def __init__(self, cfg, datasets: list, mesh: Mesh | None = None,
                 mode: str = "static_dynamic", seed: int = 0, aabbs=None):
        """Args:
          cfg: one reference-schema config shared by all scenes (shapes must
            match; per-scene content differs through ``datasets``).
          datasets: list of loader 7-tuples, one per scene; all frames must
            share (H, W, focal) and frame count.
          aabbs: optional per-scene (2,3) world boxes for heterogeneous suites
            (e.g. InDoorSeg z in [0,6] next to InDoorObj +-2): every scene is
            embedded into one canonical box by TRANSLATING its cameras so the
            scene box is centered at the origin; the canonical box takes the
            per-axis max extent.  Translation keeps near/far and all distances
            exact (unlike scaling), at the cost of some wasted grid for
            smaller scenes.  Use ``scene_offset(i)`` to map back to world.
        """
        self.cfg = cfg
        self.hp = TrainHP.from_cfg(cfg)
        self.mode = mode
        self.mesh = mesh
        self.n_scenes = len(datasets)

        imgs0, poses0, times0, counts0, _, _, (H, W, focal) = datasets[0][:7]
        self.H, self.W, self.focal = H, W, focal
        split = "train"
        self.n_frames = counts0[split]

        self.scene_offsets = np.zeros((self.n_scenes, 3), np.float32)
        if aabbs is not None:
            boxes = np.asarray(aabbs, dtype=np.float64)  # (S, 2, 3)
            assert boxes.shape == (self.n_scenes, 2, 3), boxes.shape
            self.scene_offsets = boxes.mean(axis=1).astype(np.float32)
            half = (boxes[:, 1] - boxes[:, 0]).max(axis=0) / 2.0  # per-axis max
            aabb = np.stack([-half, half])
            datasets = [
                self._translate_dataset(d, self.scene_offsets[i])
                for i, d in enumerate(datasets)
            ]
        else:
            aabb = np.stack(
                [np.asarray(cfg.nvfi.bbox_x), np.asarray(cfg.nvfi.bbox_y),
                 np.asarray(cfg.nvfi.bbox_z)], axis=-1,
            )
        from ..train.trainer import n_to_reso

        res0 = n_to_reso(int(cfg.nvfi.N_voxel_init), aabb)
        near_far = (float(cfg.dataset.near), float(cfg.dataset.far))
        self.meta = kplane.meta_from_cfg(cfg.nvfi, aabb, res0, near_far)

        keys = jax.random.split(jax.random.PRNGKey(seed), self.n_scenes)
        self.params = stack_scenes([kplane.init_params(k, self.meta) for k in keys])
        self.opt_state = {
            "m": jax.tree.map(jnp.zeros_like, self.params),
            "v": jax.tree.map(jnp.zeros_like, self.params),
            "step": jnp.zeros((self.n_scenes,), jnp.int32),
        }

        self.images = jnp.stack(
            [jnp.asarray(np.asarray(d[0][split], np.float32)) for d in datasets]
        )  # (S, F, H, W, 3)
        self.poses = jnp.stack(
            [jnp.asarray(np.stack([np.asarray(p, np.float32) for p in d[1][split]]))
             for d in datasets]
        )  # (S, F, 4, 4)
        self.times = jnp.stack(
            [jnp.asarray(np.asarray(d[2][split], np.float32)) for d in datasets]
        )  # (S, F)

        self._scene_sharding = None
        if mesh is not None:
            self._scene_sharding = scene_sharding = NamedSharding(mesh, P("data"))
            self.params = jax.device_put(self.params, scene_sharding)
            self.opt_state = jax.device_put(self.opt_state, scene_sharding)
            self.images = jax.device_put(self.images, scene_sharding)
            self.poses = jax.device_put(self.poses, scene_sharding)
            self.times = jax.device_put(self.times, scene_sharding)

        self.key = jax.random.PRNGKey(seed + 1)
        self.rng = np.random.RandomState(seed)
        self.global_step = 0
        # per-scene exactness counters (stacked on the scene axis)
        self.counters = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.n_scenes,)), init_counters()
        )
        # stage-schedule state (mirrors the single-scene Trainer)
        from ..train.trainer import exp_schedule

        n_up = len(self.hp.upsamp_list)
        self.n_voxel_list = exp_schedule(
            self.hp.n_voxel_init, self.hp.n_voxel_final, n_up)
        self.keyframe_list = exp_schedule(
            self.meta.num_keyframes, self.hp.num_keyframes_end, n_up)
        self.reso_mask = tuple(self.meta.grid_size)
        self.l1_base = self.hp.L1_weight_initial
        self.l1_step0 = 0
        # per-scene occupancy volumes, stacked (S, D, H, W); None until the
        # first alpha event.  Used for eval-time pruning always; for turbo
        # training-time pruning too once nvfi.turbo engages at the first
        # alpha event (reference semantics without turbo: the mask prunes
        # only eval samples).
        self.alpha_states = None
        self.turbo = bool(cfg.nvfi.get("turbo", False))
        self._shade_cap = float(self.meta.shade_fraction)
        self._build_step()

    def _use_alpha(self) -> bool:
        return bool(self.meta.train_occupancy_prune
                    and self.alpha_states is not None)

    def _build_step(self):
        # single-scene step WITHOUT its own jit/donation — vmap wraps it
        use_alpha = self._use_alpha()
        inner = make_train_step(
            self.meta, self.hp, self.mode, self.H, self.W, self.focal,
            mesh=None, use_alpha=use_alpha,
        )
        # make_train_step returns a jitted fn; vmap of jit is fine in jax

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, opt_state, counters, keys, frame_idx, key_idx,
                 global_step, poses, images, times, pool_all, pool_key,
                 l1_base, l1_step0, alpha_states):
            return jax.vmap(
                inner,
                in_axes=(0, 0, 0, 0, 0, 0, None, 0, 0, 0, None, None, None,
                         None, 0 if use_alpha else None),
            )(params, opt_state, counters, keys, frame_idx, key_idx,
              global_step, poses, images, times, pool_all, pool_key, l1_base,
              l1_step0, alpha_states)

        self._step = step

    def _keyframe_frames(self):
        delta = self.meta.time_scale_factor
        t = np.asarray(self.times[0])
        base = np.round(np.clip(t / delta, 0, self.meta.num_keyframes - 1)) * delta
        key_frames = np.where(np.isclose(t, base))[0]
        return key_frames if len(key_frames) else np.arange(self.n_frames)

    def _restack(self, scene_params: list):
        """Re-stack per-scene pytrees after a stage transition and restore the
        scene-axis sharding + a fresh (per-scene) optimizer state, exactly as
        the reference rebuilds Adam at stage boundaries (train_nvfi.py:353-357)."""
        self.params = stack_scenes(scene_params)
        self.opt_state = {
            "m": jax.tree.map(jnp.zeros_like, self.params),
            "v": jax.tree.map(jnp.zeros_like, self.params),
            "step": jnp.zeros((self.n_scenes,), jnp.int32),
        }
        if self._scene_sharding is not None:
            self.params = jax.device_put(self.params, self._scene_sharding)
            self.opt_state = jax.device_put(self.opt_state, self._scene_sharding)
        self.counters = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.n_scenes,)), init_counters()
        )

    def stage_alpha(self, it: int):
        """Alpha-mask + UNION shrink across the scene axis (reference
        train_nvfi.py:332-341).  Each scene gets its own occupancy volume
        (same resolution => stackable); the shrink aabb is the union of the
        per-scene occupied boxes so every scene keeps the same static shape."""
        if int(np.prod(self.meta.grid_size)) < 256 ** 3:
            self.reso_mask = tuple(self.meta.grid_size)
        scenes = unstack_scenes(self.params, self.n_scenes)
        vols, aabbs = [], []
        for p in scenes:
            ast, new_aabb = kplane.update_alpha_mask(p, self.meta, self.reso_mask)
            vols.append(ast)
            aabbs.append(np.asarray(new_aabb))
        union = np.stack([
            np.min([a[0] for a in aabbs], axis=0),
            np.max([a[1] for a in aabbs], axis=0),
        ])
        shrunk = [kplane.shrink(p, self.meta, union) for p in scenes]
        self.meta = shrunk[0][1]
        self.alpha_states = jax.tree.map(lambda *xs: jnp.stack(xs), *vols)
        if self._scene_sharding is not None:
            self.alpha_states = jax.device_put(
                self.alpha_states, self._scene_sharding)
        self._restack([p for p, _ in shrunk])
        if it == tuple(self.hp.update_alphamask_list)[0]:
            self.l1_base = self.hp.L1_weight_reset
            self.l1_step0 = it + 1
        self._reprobe_turbo(f"alpha@{it}")
        self._build_step()

    def _reprobe_turbo(self, tag: str):
        """Engage/re-calibrate turbo for the CURRENT meta: probe the block
        budget per scene and share the MAX (see module docstring).  Mirrors
        Trainer._reprobe_turbo, including the config shade cap."""
        if not (self.turbo and self.alpha_states is not None):
            return
        from dataclasses import replace

        from ..train import turbo as turbo_mod

        budgets, shades = [], []
        for i in range(self.n_scenes):
            b, s = turbo_mod.measure_block_budget(
                self.meta, self.scene_alpha_state(i),
                np.asarray(self.poses[i], np.float32),
                self.H, self.W, self.focal, self.hp.n_rays, with_shade=True,
            )
            budgets.append(b)
            shades.append(s)
        self.meta = replace(
            self.meta,
            train_occupancy_prune=True,
            block_budget=float(max(budgets)),
            shade_fraction=min(float(max(shades)), self._shade_cap),
        )
        print(f"[turbo] {tag}: shared block_budget="
              f"{self.meta.block_budget:.3f} (per-scene "
              f"{['%.3f' % b for b in budgets]}) shade_fraction="
              f"{self.meta.shade_fraction:.3f}", flush=True)

    def check_counters(self, tag: str) -> dict:
        """Per-scene running-max exactness counters (see trainer
        _check_counters): dropped_blocks > 0 on any scene means its shared
        budget zeroed real samples — warn unmissably."""
        db = np.asarray(self.counters["dropped_blocks"])
        ds = np.asarray(self.counters["dropped_shade"])
        if db.max() > 0:
            print(f"[turbo] !!! EXACTNESS VIOLATION at {tag}: per-scene max "
                  f"dropped_blocks={db.tolist()} — the shared block budget "
                  "zeroed real samples; raise nvfi.turbo_budget or disable "
                  "turbo", flush=True)
        elif ds.max() > 0:
            print(f"[turbo] stage truncation at {tag}: per-scene max "
                  f"dropped_shade={ds.tolist()} (accepted by shade cap "
                  f"{self._shade_cap})", flush=True)
        return {"max_dropped_blocks": db, "max_dropped_shade": ds}

    def stage_upsample(self, it: int):
        """Voxel/keyframe upsample across the scene axis (reference
        train_nvfi.py:343-357)."""
        from ..train.trainer import n_to_reso

        n_vox = self.n_voxel_list.pop(0)
        res_cur = n_to_reso(n_vox, self.meta.aabb_np)
        kf_cur = self.keyframe_list.pop(0)
        scenes = unstack_scenes(self.params, self.n_scenes)
        upsampled = [kplane.upsample(p, self.meta, res_cur, kf_cur) for p in scenes]
        self.meta = upsampled[0][1]
        self._restack([p for p, _ in upsampled])
        if self.meta.train_occupancy_prune:
            self._reprobe_turbo(f"upsample@{it}")  # the sample axis refined
        self._build_step()

    def scene_alpha_state(self, i: int):
        """Per-scene occupancy state for eval-time pruning (None before the
        first alpha event)."""
        if self.alpha_states is None:
            return None
        return jax.tree.map(lambda x: x[i], self.alpha_states)

    def train(self, iters: int, key_frames=None, log_fn=None):
        n = self.n_scenes
        if key_frames is None:
            key_frames = self._keyframe_frames()
        pool_all = jnp.arange(self.n_frames, dtype=jnp.int32)
        pool_key = jnp.asarray(key_frames, dtype=jnp.int32)
        metrics = {}
        for it in range(self.global_step, iters):
            self.key, k = jax.random.split(self.key)
            keys = jax.random.split(k, n)
            f_idx = jnp.asarray(self.rng.randint(self.n_frames, size=n), jnp.int32)
            k_idx = jnp.asarray(
                key_frames[self.rng.randint(len(key_frames), size=n)], jnp.int32
            )
            self.params, self.opt_state, self.counters, metrics = self._step(
                self.params, self.opt_state, self.counters, keys, f_idx, k_idx,
                jnp.int32(it), self.poses, self.images, self.times, pool_all,
                pool_key, jnp.float32(self.l1_base),
                jnp.float32(self.l1_step0),
                self.alpha_states if self._use_alpha() else jnp.zeros(()),
            )
            if log_fn and it % self.hp.print_every == 0:
                m = {k2: np.asarray(v) for k2, v in metrics.items()} | {"it": it}
                for src, dst in (("rgb_loss_0", "psnr_0"), ("rgb_loss_t", "psnr_t")):
                    if src in metrics:
                        mse = np.maximum(np.asarray(metrics[src]), 1e-12)
                        m[dst] = np.where(mse < 1.0 - 1e-9,
                                          -10.0 * np.log10(mse), 0.0)
                log_fn(m)
            self.global_step = it + 1

            # -- stage events (shared schedule; reference train_nvfi.py:332-357)
            if it in self.hp.update_alphamask_list and self.mode in (
                "static", "static_dynamic"):
                if self._use_alpha():
                    self.check_counters(f"pre-alpha@{it}")
                self.stage_alpha(it)
                key_frames = self._keyframe_frames()
                pool_key = jnp.asarray(key_frames, dtype=jnp.int32)
            if it in self.hp.upsamp_list and self.mode in (
                "static", "static_dynamic"):
                if self._use_alpha():
                    self.check_counters(f"pre-upsample@{it}")
                self.stage_upsample(it)
                key_frames = self._keyframe_frames()
                pool_key = jnp.asarray(key_frames, dtype=jnp.int32)
        if self._use_alpha():
            self.check_counters(f"train-end@{self.global_step}")
        return metrics

    @staticmethod
    def _translate_dataset(dataset, offset):
        """Shift every camera of EVERY split by -offset (world -> canonical).

        The offset is a property of the scene, not of a split: translating
        only the train cameras would leave val/test poses in world
        coordinates, silently rendering wrong views against the canonical-
        frame scene params (advisor round-2 finding)."""
        imgs, poses, times, counts = dataset[0], dataset[1], dataset[2], dataset[3]
        new_poses = {}
        for split, plist in poses.items():
            shifted = []
            for p in plist:
                p = np.array(p, np.float32).copy()
                p[:3, 3] -= offset
                shifted.append(p)
            new_poses[split] = shifted
        return (imgs, new_poses, times, counts) + tuple(dataset[4:])

    def scene_offset(self, i: int) -> np.ndarray:
        """Canonical->world translation for scene i (world = canonical + offset)."""
        return self.scene_offsets[i]

    def scene_params(self, i: int):
        return jax.tree.map(lambda x: x[i], self.params)
