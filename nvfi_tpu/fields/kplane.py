"""Keyframe K-plane dynamic radiance field — the core model.

TPU-native re-design of reference models/tensorf_keyframe.py
(``TensorVMKeyframeTimeKplane``).  The factorization is identical — three
*space* planes (xy, xz, yz) times three *space-time* planes (zt, yt, xt)
(reference :39-40,116-186) for density and appearance, with non-keyframe
samples backward-advected to the nearest keyframe time through a learned
velocity field integrated with RK2 (reference :575-611) — but the execution
model is rebuilt for XLA:

* **Pure state.**  Trainable arrays live in a ``params`` pytree; static
  structure (grid sizes, keyframe count, aabb, flags) lives in a hashable
  ``KPlaneMeta`` the jitted step specializes on.  Grid upsampling / shrinking
  become pure ``(params, meta) -> (params, meta)`` stage transitions instead
  of in-place module surgery (reference :327-458).
* **Fixed shapes.**  The reference compacts samples with boolean indexing
  (``xyz_sampled[ray_valid]``, reference :705); here every sample is computed
  and masked with ``where`` — no data-dependent shapes under jit.
* **Bounded advection.**  The reference's data-dependent ``while
  unfinished.any()`` RK2 loop (reference :591-609) is replaced by a static
  step count: after keyframe snapping ``|time_offset| <= dt_max`` so the
  render path needs exactly ONE RK2 step; transfer/segmentation paths use a
  ``lax.scan`` over ``ceil(tmax/dt_max)`` steps with per-point done masking —
  identical math (SURVEY.md §7.1.3).
* **Channels-last planes** so each bilinear gather pulls a contiguous
  C-vector into TPU lanes (see ops/grid_sample.py).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_2d_block as grid_sample_2d
from ..ops.grid_sample import grid_sample_2d_block_multi
from ..ops.grid_sample import grid_sample_3d
from ..ops.compositing import raw2alpha
from ..ops.resize import resize_bilinear_ac, max_pool3d_same
from .mlp import linear_init
from .shaders import DENSITY_DATA_DIM, init_shader, make_shader, make_density_decoder
from . import velocity as vel_mod
from .velocity import VelGate
from . import mask_field as mask_mod

# plane index pairs (reference models/tensorf_keyframe.py:39-40)
MAT_SPACE = ((0, 1), (0, 2), (1, 2))
MAT_TIME = ((2, 3), (1, 3), (0, 3))


# ---------------------------------------------------------------------------
# Static metadata
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class KPlaneMeta:
    """Static (hashable) structure of a keyframe K-plane scene."""

    grid_size: tuple  # (gx, gy, gz)
    num_keyframes: int
    tmax: float
    aabb: tuple  # ((x0,y0,z0),(x1,y1,z1)); static — changes only at stage boundaries
    near_far: tuple
    density_n_comp: int
    app_n_comp: int
    app_dim: int
    density_shift: float
    distance_scale: float
    alpha_mask_thres: float
    raymarch_weight_thres: float
    fea2dense: str = "softplus"
    density_mode: str = "Density"
    shading_mode: str = "MLP_PE"
    pos_pe: int = 6
    view_pe: int = 6
    fea_pe: int = 6
    feature_c: int = 128
    step_ratio: float = 0.5
    max_n_samples: int = 1024
    use_vel: bool = True
    vel_hidden: int = 128  # velocity-MLP width (reference 128); >128 is the
    # extrapolation-gap capacity experiment (NEXT.md §6)
    dt_scale: float = 1.0  # multiplies dt_max (see the property): < 1 = finer
    # RK2 advection, an eval-time probe separating integration error from
    # method-level extrapolation error
    vel_gate: VelGate = field(default_factory=lambda: VelGate("aabb", 0.03))
    mask_dim: int = 0  # >0 when a segmentation MaskField head is attached
    alpha_grid: tuple = ()  # (D,H,W) of the occupancy volume; () = no mask
    train_occupancy_prune: bool = False  # opt-in "turbo": prune TRAINING
    # samples by the alpha mask too (the reference prunes only in eval);
    # changes the training estimator only by dropping provably-empty samples
    compute_dtype: str = "float32"  # 'bfloat16' halves HBM gather traffic; the
    # interpolation/compositing math auto-promotes back to f32 (master weights
    # and Adam state always stay f32)
    ray_sampling: str = "box"  # 'box' | 'ndc' | 'contracted' (reference
    # forward :613-639 chooses between sample_ray / sample_ray_ndc /
    # sample_ray_contracted)
    parity_sampling: bool = False  # reproduce the reference's LITERAL
    # ray-start rule (tensorf_base.py:294-300): `((aabb[0] <= rays_o) &
    # (rays_o <= aabb[1])).any()` — ANY single coordinate of ANY origin
    # inside its per-axis range makes ALL rays start at `near` (true for
    # essentially every real camera pose).  Default False: this repo starts
    # each ray at its aabb entry instead — a deliberate divergence (no
    # samples wasted before the box; the same n_samples covers the chord
    # more densely).  Enable for bit-faithful parity runs.  Pinned by
    # tests/test_sampling.py::test_ray_start_semantics.
    # static top-K shading budget as a fraction of samples per ray.  1.0 =
    # EXACT dense shading — the round-5 default policy: shade truncation is a
    # measured quality risk on uncertified scenes (the 0.125 cap failed its
    # 30k from-scratch certification, and the r4c chessboard run truncated
    # 247k samples/step early under the old 0.25 default — BASELINE.md), so
    # a sub-1.0 cap is an explicit per-config opt-in carried only by configs
    # with from-scratch quality evidence (configs/synth/bat.yaml).
    shade_fraction: float = 1.0
    # of N*S samples; <=0 or >=1 shades densely.  With the reference's
    # rayMarch_weight_thres=1e-4 far fewer than 25% of samples pass the mask,
    # so the selection reproduces the reference's app_mask compaction exactly
    # while skipping ~75% of appearance gathers + shader FLOPs.
    block_budget: float = 1.0  # block-sparse sample axis: the sample axis is
    # tiled into ``sample_block``-sized blocks and only blocks containing
    # in-box (and, when an alpha mask is active, occupied) samples are
    # advected/gathered, under a static budget of block_budget * total blocks.
    # Skipped blocks contribute exactly zero (their samples are invalid =>
    # sigma 0), so with zero dropped active blocks the math is identical to
    # the dense path — renders report 'dropped_blocks' to verify.  >=1.0
    # disables (dense, bit-exact parity path).  The reference pays these
    # samples too (it compacts with boolean indexing, tensorf_base.py:310-314
    # + :705); this is the fixed-shape TPU equivalent at block granularity.
    sample_block: int = 64  # block-sparse granularity (samples per block).
    # Smaller blocks track the occupied chord tighter (lower calibrated
    # block_budget => fewer gather indices) at the cost of more top_k scores;
    # the round-3 attribution (docs/pallas_decision.md §5) identifies this as
    # the remaining path toward the 20k rays/s bar.
    gather_fuse: bool = False  # fuse the 6 per-plane quad-row gathers (3
    # space + 3 time) into ONE gather on a row-concatenated table (and the
    # backward into one scatter-add): docs/pallas_decision.md §5 lever (b),
    # cutting gather *op count* at identical index count and bit-identical
    # math (tests/test_gather_fuse.py).  Measured NEGATIVE on the real chip
    # (16,070 -> 13,502 rays/s at the benched protocol — XLA overlaps the six
    # independent gathers better than one fused gather behind a larger index
    # computation; docs/pallas_decision.md §5 "Path (b) measured").  Stays
    # off; kept as the measured record.
    shade_reuse: bool = True  # shade pass reuses the density pass's quad-row
    # gathers: the density pass gathers the FULL merged channel rows (gather
    # cost is per-index, not per-byte — docs/pallas_decision.md §2) and saves
    # the decoded app features, so the top-K shade pass issues ZERO plane
    # gathers (it row-selects the saved features).  Mathematically identical
    # to the re-gather path (same rows, same product, same decode); pinned by
    # tests/test_round4.py.  False restores the round-3 thin-gather split.

    # -- derived quantities (host-side python, baked into jit) --------------
    @property
    def aabb_np(self) -> np.ndarray:
        return np.asarray(self.aabb, dtype=np.float32)

    @property
    def aabb_size(self) -> np.ndarray:
        a = self.aabb_np
        return a[1] - a[0]

    @property
    def units(self) -> np.ndarray:
        return self.aabb_size / (np.asarray(self.grid_size) - 1)

    @property
    def step_size(self) -> float:
        # reference models/tensorf_base.py:214-227
        return float(np.mean(self.units) * self.step_ratio)

    @property
    def n_samples(self) -> int:
        diag = float(np.linalg.norm(self.aabb_size))
        return min(self.max_n_samples, int(diag / self.step_size) + 1)

    @property
    def time_scale_factor(self) -> float:
        # keyframe spacing Delta (reference models/tensorf_keyframe.py:45)
        return self.tmax / (self.num_keyframes - 1) if self.num_keyframes > 1 else 1.0

    @property
    def dt_max(self) -> float:
        # reference models/tensorf_keyframe.py:577; dt_scale < 1 refines the
        # RK2 advection step (an eval-time integration-accuracy probe for the
        # extrapolation gap, NEXT.md §6 — the step counts below all scale
        # with it, so renders stay exact w.r.t. the finer integrator)
        if self.num_keyframes <= 1:
            return 1.0
        return 0.5 * self.tmax / (self.num_keyframes - 1) * self.dt_scale

    @property
    def snap_steps(self) -> int:
        """Steps covering one post-snap offset (|offset| <= Delta/2): exactly
        1 at dt_scale=1, ceil(1/dt_scale) under a refined integrator."""
        return max(1, int(math.ceil(1.0 / self.dt_scale - 1e-9)))

    @property
    def max_adv_steps(self) -> int:
        """Static RK2 step bound for a full [0, tmax] offset."""
        return max(1, int(math.ceil(self.tmax / self.dt_max - 1e-9)))

    @property
    def transfer_adv_steps(self) -> int:
        """Static RK2 step bound for the transfer path, which advects ALL
        samples from t back to the canonical t=0 frame (reference
        tensorf_keyframe.py:647-649) — test times reach t=1 > tmax, so the
        bound must cover the full [0, 1] offset (the reference's while-loop
        runs ceil(t/dt_max) iterations there; a [0, tmax] bound silently
        truncates the graft's motion past tmax)."""
        return max(1, int(math.ceil(1.0 / self.dt_max - 1e-9)))

    @property
    def render_adv_steps(self) -> int:
        """Static RK2 step bound for EVAL renders at any t in [0, 1].

        During training |offset| <= dt_max after keyframe snapping, so one
        step is exact.  Beyond tmax the snap clamps to the LAST keyframe
        (reference :651-654) and the offset grows to 1 - tmax — the
        reference's data-dependent while loop (:591-609) takes
        ceil((1 - tmax)/dt_max) steps there; a single step silently freezes
        extrapolated geometry near the last keyframe.
        """
        if self.num_keyframes <= 1 or self.tmax <= 0:
            return 1
        return max(1, int(math.ceil((1.0 - self.tmax) / self.dt_max - 1e-9))
                   + self.snap_steps)


def render_steps_for_time(meta: KPlaneMeta, t: float, transfer: bool = False) -> int:
    """Exact static RK2 step count for an eval render at a HOST-known time t.

    The batch-wide bounds (``render_adv_steps`` / ``transfer_adv_steps``)
    cover any t in [0, 1]; when the caller knows the concrete time of the
    image being rendered, most of those scan iterations are dt=0 no-ops —
    e.g. every interpolation-time render (t <= tmax) needs exactly ONE step
    after keyframe snapping.  Extra steps are mathematically no-ops (dt
    clamps to the remaining offset, then to 0), so specializing is exact.
    """
    if not meta.use_vel or meta.num_keyframes <= 1:
        return 1
    if transfer:
        # offset is the full t (advect back to the canonical t=0 frame)
        return max(1, int(math.ceil(float(t) / meta.dt_max - 1e-9)))
    if float(t) <= meta.tmax + 1e-6:
        # |t - snap(t)| <= Delta/2 inside the training window
        return meta.snap_steps
    return max(1, int(math.ceil((float(t) - meta.tmax) / meta.dt_max - 1e-9))
               + meta.snap_steps)


def eval_exact_meta(meta: KPlaneMeta) -> KPlaneMeta:
    """Strip TRAINING-time turbo budgets off a meta for exact eval renders.

    A checkpoint restored from a turbo run carries the budgets the trainer
    probed for its OWN ray distribution (``block_budget`` from train-pose
    probe batches, ``shade_fraction`` capped for throughput) — valid there
    because the per-step dropped counters certify them.  Eval renders draw
    full-frame rays from different poses, where those budgets can truncate
    (observed on the 30k turbo scene's time-sweep rendering); metric renders
    must instead run the dense bit-exact path.  Callers that want sparse eval
    speedups re-enable a budget explicitly and keep the dropped-counter
    guard."""
    return replace(meta, train_occupancy_prune=False, block_budget=1.0,
                   shade_fraction=1.0)


def meta_from_cfg(nvfi_cfg, aabb, grid_size, near_far) -> KPlaneMeta:
    """Build meta from a reference-schema ``cfg.nvfi`` block."""
    if "sur_x" in nvfi_cfg:
        aabb_np = np.asarray(aabb, dtype=np.float64)
        sur = np.stack(
            [np.asarray(nvfi_cfg[k], dtype=np.float64) for k in ("sur_x", "sur_y", "sur_z")],
            axis=-1,
        )  # (2,3)
        bounds = (sur - aabb_np[0]) * 2.0 / (aabb_np[1] - aabb_np[0]) - 1.0
        gate = VelGate("sur", bounds=(tuple(bounds[0].tolist()), tuple(bounds[1].tolist())),
                       world=(tuple(sur[0].tolist()), tuple(sur[1].tolist())))
    else:
        gate = VelGate("aabb", float(nvfi_cfg.get("eps", 0.03)))
    # lenient float: the reference ships a bitrotted value "0.75 4" in
    # config/InDoorSeg/darkroom.yaml:141 (a stray token after an edit) that
    # YAML parses as a string; take the first token like the author intended
    tmax_raw = nvfi_cfg.tmax
    tmax = float(str(tmax_raw).split()[0]) if isinstance(tmax_raw, str) else float(tmax_raw)
    return KPlaneMeta(
        grid_size=tuple(int(g) for g in grid_size),
        num_keyframes=int(nvfi_cfg.num_keyframes),
        tmax=tmax,
        aabb=tuple(tuple(float(v) for v in row) for row in np.asarray(aabb)),
        near_far=tuple(float(v) for v in near_far),
        density_n_comp=int(nvfi_cfg.density_n_comp[0]),
        app_n_comp=int(nvfi_cfg.appearance_n_comp[0]),
        app_dim=int(nvfi_cfg.app_dim),
        density_shift=float(nvfi_cfg.density_shift),
        distance_scale=float(nvfi_cfg.distance_scale),
        alpha_mask_thres=float(nvfi_cfg.alphaMask_thres),
        raymarch_weight_thres=float(nvfi_cfg.rayMarch_weight_thres),
        fea2dense=str(nvfi_cfg.fea2denseAct),
        density_mode=str(nvfi_cfg.densityMode),
        shading_mode=str(nvfi_cfg.shadingMode),
        pos_pe=int(nvfi_cfg.pos_pe),
        view_pe=int(nvfi_cfg.view_pe),
        fea_pe=int(nvfi_cfg.fea_pe),
        feature_c=int(nvfi_cfg.featureC),
        step_ratio=float(nvfi_cfg.step_ratio),
        max_n_samples=int(nvfi_cfg.max_n_samples),
        use_vel=bool(nvfi_cfg.use_vel),
        vel_hidden=int(nvfi_cfg.get("vel_hidden", 128)),
        dt_scale=float(nvfi_cfg.get("dt_scale", 1.0)),
        vel_gate=gate,
        compute_dtype=str(nvfi_cfg.get("compute_dtype", "float32")),
        train_occupancy_prune=bool(nvfi_cfg.get("train_occupancy_prune", False)),
        ray_sampling=(
            "contracted" if nvfi_cfg.get("contract_ray", False) else "box"
        ),
        parity_sampling=bool(nvfi_cfg.get("parity_sampling", False)),
        block_budget=float(nvfi_cfg.get("block_budget", 1.0)),
        # exact-by-default: a truncating shade cap must be opted into by the
        # config (see the KPlaneMeta field note)
        shade_fraction=float(nvfi_cfg.get("shade_fraction", 1.0)),
        sample_block=int(nvfi_cfg.get("sample_block", 64)),
        shade_reuse=bool(nvfi_cfg.get("shade_reuse", True)),
        gather_fuse=bool(nvfi_cfg.get("gather_fuse", False)),
    )


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_params(key, meta: KPlaneMeta) -> dict:
    """Initialize the scene param pytree (reference init_svd_volume :116-186).

    Layout note: density and appearance channels are stored CONCATENATED in
    one plane per orientation (``planes_space[i]`` has Cd + Ca channels,
    density first).  The factorized math is per-channel, so slicing after the
    cross-plane product equals the reference's two separate plane stacks —
    but every sample needs 6 gathers instead of 12, and TPU gather cost is
    index-count-bound, so this halves the hot-loop gather time.
    Initialization of each block matches the reference exactly (density space
    uniform(0.1,0.5) x 0.8 softplus / 0.5 otherwise; app x 0.1; time = ones).
    """
    gs = meta.grid_size
    K = meta.num_keyframes
    keys = jax.random.split(key, 12)

    density_scale = 0.8 if meta.fea2dense == "softplus" else 0.5

    def space_plane(kd, ka, i):
        m0, m1 = MAT_SPACE[i]
        d = density_scale * jax.random.uniform(
            kd, (gs[m1], gs[m0], meta.density_n_comp), jnp.float32, 0.1, 0.5
        )
        a = 0.1 * jax.random.uniform(
            ka, (gs[m1], gs[m0], meta.app_n_comp), jnp.float32, 0.1, 0.5
        )
        return jnp.concatenate([d, a], axis=-1)

    def time_plane(i):
        m0, _ = MAT_TIME[i]
        return jnp.ones((K, gs[m0], meta.density_n_comp + meta.app_n_comp), jnp.float32)

    params = {
        "planes_space": [space_plane(keys[i], keys[3 + i], i) for i in range(3)],
        "planes_time": [time_plane(i) for i in range(3)],
        "basis_mat": linear_init(keys[6], meta.app_n_comp, meta.app_dim, bias=False),
        "basis_mat_density": linear_init(
            keys[7], meta.density_n_comp, DENSITY_DATA_DIM[meta.density_mode], bias=False
        ),
        "shader": init_shader(
            keys[8], meta.shading_mode, meta.app_dim, meta.view_pe, meta.pos_pe,
            meta.fea_pe, meta.feature_c,
        ),
    }
    if meta.use_vel:
        params["vel"] = vel_mod.init_velocity_params(keys[9], meta.vel_hidden)
    return params


# ---------------------------------------------------------------------------
# Coordinate helpers
# ---------------------------------------------------------------------------

def cast_compute(params, meta: KPlaneMeta):
    """Cast f32 MLP/decoder leaves to the compute dtype (no-op for f32 meta).

    Gradients flow through the cast, so the optimizer still sees f32 master
    weights — the standard bf16-compute / f32-state mixed-precision recipe
    (the TPU analogue of the reference's CUDA AMP + GradScaler,
    train_nvfi.py:96,242-245; bf16 needs no loss scaling).

    The PLANES are deliberately left f32: TPU gather cost is per-index (f32
    rows read as fast as bf16) and the gather-VJP scatter-add is faster in f32
    (scripts/perf_micro2.py), so grid_sample downcasts the gathered rows
    instead (grid_sample_2d_block compute_dtype)."""
    if meta.compute_dtype == "float32":
        return params
    dt = jnp.dtype(meta.compute_dtype)
    out = dict(params)
    for k, v in params.items():
        if k in ("planes_space", "planes_time"):
            continue
        out[k] = jax.tree.map(
            lambda x: x.astype(dt) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            v,
        )
    return out


def normalize_coord(meta: KPlaneMeta, xyz):
    a = meta.aabb_np
    inv = 2.0 / (a[1] - a[0])
    return (xyz - a[0]) * inv - 1.0


def denormalize_coord(meta: KPlaneMeta, xyz_norm):
    a = meta.aabb_np
    return (xyz_norm + 1.0) * (a[1] - a[0]) / 2.0 + a[0]


def normalize_time(meta: KPlaneMeta, t):
    # reference models/tensorf_keyframe.py:501-506
    if meta.num_keyframes == 1 or meta.tmax == 0:
        return t * 0.0
    return t * 2.0 / meta.tmax - 1.0


def snap_to_keyframe(meta: KPlaneMeta, t):
    """Round to the nearest keyframe time (reference :651-654).

    jnp.round matches torch.round's half-to-even tie behavior.
    """
    delta = meta.time_scale_factor
    return jnp.round(jnp.clip(t / delta, 0.0, meta.num_keyframes - 1)) * delta


# ---------------------------------------------------------------------------
# Feature evaluation
# ---------------------------------------------------------------------------

def _plane_product(planes_space, planes_time, xyzt, compute_dtype=None,
                   fuse: bool = False):
    """Product of 3 space-plane and 3 time-plane bilinear samples.

    xyzt: (..., 4) with spatial dims normalized to [-1,1] and time already
    through normalize_time.  Returns (..., C) over the merged channel stack
    (in ``compute_dtype`` when given — the tent weighting and the five
    cross-plane products run at reduced precision, mirroring the reference's
    AMP fp16 autocast around this exact chain, train_nvfi.py:144).

    ``fuse`` (meta.gather_fuse): issue the 6 plane lookups as ONE gather on a
    row-concatenated quad table instead of 6 gather ops — bit-identical
    output (tests/test_gather_fuse.py), targets the per-op dispatch floor
    (docs/pallas_decision.md §5 lever (b)).
    """
    coords = []
    for i in range(3):
        m0, m1 = MAT_SPACE[i]
        coords.append(jnp.stack([xyzt[..., m0], xyzt[..., m1]], axis=-1))
    for i in range(3):
        mt0, mt1 = MAT_TIME[i]
        coords.append(jnp.stack([xyzt[..., mt0], xyzt[..., mt1]], axis=-1))

    if fuse:
        s = grid_sample_2d_block_multi(
            list(planes_space) + list(planes_time), coords, compute_dtype
        )
        return ((s[0] * s[1]) * s[2]) * ((s[3] * s[4]) * s[5])

    feat_space = None
    feat_time = None
    for i in range(3):
        s = grid_sample_2d(planes_space[i], coords[i], compute_dtype)
        feat_space = s if feat_space is None else feat_space * s
        tfeat = grid_sample_2d(planes_time[i], coords[3 + i], compute_dtype)
        feat_time = tfeat if feat_time is None else feat_time * tfeat
    return feat_space * feat_time


def _compute_dtype(meta: KPlaneMeta):
    return None if meta.compute_dtype == "float32" else meta.compute_dtype


def _decode_density(params, meta: KPlaneMeta, fused_d):
    if meta.density_mode != "Density":
        return jnp.dot(
            fused_d, params["basis_mat_density"]["w"],
            preferred_element_type=jnp.float32,
        )
    # accumulate the channel sum in f32 even when the product chain ran bf16
    return jnp.sum(fused_d, axis=-1, keepdims=True, dtype=jnp.float32)


def field_features(params, meta: KPlaneMeta, xyzt):
    """Fused density + appearance features from ONE set of 6 plane gathers.

    Returns (density_feature (..., Dd), app_feature (..., app_dim)) —
    identical values to the reference's separate compute_densityfeature /
    compute_appfeature (tensorf_keyframe.py:233-310); the channel merge is
    exact because the cross-plane product is elementwise per channel.
    """
    fused = _plane_product(params["planes_space"], params["planes_time"], xyzt,
                           _compute_dtype(meta), fuse=meta.gather_fuse)
    cd = meta.density_n_comp
    density = _decode_density(params, meta, fused[..., :cd])
    app = fused[..., cd:] @ params["basis_mat"]["w"].astype(fused.dtype)
    return density, app


def density_feature(params, meta: KPlaneMeta, xyzt):
    """(..., 4) -> density feature (reference compute_densityfeature :233-272).

    Slices the density channel block out of the merged planes BEFORE the quad
    gather, so the dense density sweep reads only Cd channels per corner.
    """
    cd = meta.density_n_comp
    fused = _plane_product(
        [p[..., :cd] for p in params["planes_space"]],
        [p[..., :cd] for p in params["planes_time"]],
        xyzt,
        _compute_dtype(meta),
        fuse=meta.gather_fuse,
    )
    return _decode_density(params, meta, fused)


def app_feature(params, meta: KPlaneMeta, xyzt):
    """(..., 4) -> (..., app_dim) (reference compute_appfeature :274-310)."""
    cd = meta.density_n_comp
    fused = _plane_product(
        [p[..., cd:] for p in params["planes_space"]],
        [p[..., cd:] for p in params["planes_time"]],
        xyzt,
        _compute_dtype(meta),
        fuse=meta.gather_fuse,
    )
    return fused @ params["basis_mat"]["w"].astype(fused.dtype)


def feature2density(meta: KPlaneMeta, density_features, aux=None):
    """Decode + activate density (reference :312-325)."""
    decode = make_density_decoder(meta.density_mode)
    x = decode(density_features, aux)
    if meta.fea2dense == "softplus":
        return jax.nn.softplus(x + meta.density_shift)
    if meta.fea2dense == "relu":
        return jax.nn.relu(x)
    if meta.fea2dense == "relu_abs":
        return jnp.abs(x)
    raise ValueError(meta.fea2dense)


# ---------------------------------------------------------------------------
# Velocity advection (RK2, static step count)
# ---------------------------------------------------------------------------

def integrate_pos(params, meta: KPlaneMeta, xyz, t, base_times, n_steps: int | None = None):
    """Backward-advect normalized points from time t to base_times.

    Matches reference integrate_pos (:575-611): per-step
    ``dt = sign(offset) * min(|offset|, dt_max)``, RK2 midpoint evaluation,
    and (for the 'sur' gate) reverting steps that leave the surround bounds.
    The data-dependent while-loop becomes ``n_steps`` fixed iterations; points
    whose offset hits zero keep dt = 0 and stop moving — identical math.
    """
    if not meta.use_vel:
        return xyz
    if n_steps is None:
        n_steps = meta.max_adv_steps
    dt_max = meta.dt_max
    vel_params = params["vel"]
    gate = meta.vel_gate

    def body(carry, _):
        xyz, t_curr, remaining = carry
        dt = jnp.sign(remaining) * jnp.minimum(jnp.abs(remaining), dt_max)
        v1 = vel_mod.gated_velocity(vel_params, gate, xyz, t_curr)
        p_mid = xyz - 0.5 * dt * v1
        t_mid = t_curr - 0.5 * dt
        v2 = vel_mod.gated_velocity(vel_params, gate, p_mid, t_mid)
        xyz_new = xyz - dt * v2
        if gate.mode == "sur":
            lo = jnp.asarray(gate.bounds[0])
            hi = jnp.asarray(gate.bounds[1])
            out = jnp.any((xyz_new < lo) | (xyz_new > hi), axis=-1, keepdims=True)
            xyz_new = jnp.where(out, xyz, xyz_new)
        moved = jnp.abs(remaining) > 0
        xyz = jnp.where(moved, xyz_new, xyz)
        return (xyz, t_curr - dt, remaining - dt), None

    remaining = t - base_times
    if n_steps == 1:
        (xyz, _, _), _ = body((xyz, t, remaining), None)
        return xyz
    (xyz, _, _), _ = jax.lax.scan(body, (xyz, t, remaining), None, length=n_steps)
    return xyz


# ---------------------------------------------------------------------------
# Ray sampling
# ---------------------------------------------------------------------------

def sample_ray_ndc(meta: KPlaneMeta, rays_o, rays_d, n_samples: int, training: bool, key):
    """NDC sampling: linear in z over [near, far] with training jitter
    (reference models/tensorf_base.py:270-282)."""
    near, far = meta.near_far
    interpx = jnp.linspace(near, far, n_samples, dtype=rays_o.dtype)[None, :]
    if training:
        interpx = interpx + jax.random.uniform(
            key, (rays_o.shape[0], n_samples), rays_o.dtype
        ) * ((far - near) / n_samples)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * interpx[..., None]
    a = meta.aabb_np
    valid = jnp.all((pts >= a[0]) & (pts <= a[1]), axis=-1)
    return pts, interpx, valid


def sample_ray_contracted(meta: KPlaneMeta, rays_o, rays_d, n_samples: int,
                          training: bool, key):
    """Unbounded-scene sampling with scene contraction (reference
    models/tensorf_base.py:316-351): half the samples linear in [near, 2],
    half inverse-depth out to far, then points beyond |x|=1 contracted to the
    2-sphere shell ``(2 - 1/|x|) * x/|x|``."""
    near, far = meta.near_far
    inner_n = n_samples - n_samples // 2
    outer_n = n_samples // 2
    k1, k2 = jax.random.split(key) if key is not None else (None, None)

    ix_inner = jnp.linspace(near, 2.0, inner_n + 1, dtype=rays_o.dtype)[None, :]
    if training:
        jitter = jax.random.uniform(k1, (rays_o.shape[0], inner_n + 1), rays_o.dtype)
        jitter = jitter.at[:, -1].set(0.0) * ((2.0 - near) / inner_n)
        ix_inner = ix_inner + jitter
    ix_inner = 0.5 * (ix_inner[:, 1:] + ix_inner[:, :-1])

    rng = jnp.arange(outer_n + 1, dtype=rays_o.dtype)[None, :]
    if training:
        jr = jax.random.uniform(k2, (rays_o.shape[0], outer_n + 1), rays_o.dtype)
        rng = rng + jr.at[:, -1].set(0.0)
    rng = jnp.flip(rng, axis=1)
    rng = 0.5 * (rng[:, 1:] + rng[:, :-1])
    ix_outer = 1.0 / (1.0 / far + (1.0 / 2.0 - 1.0 / far) * rng / outer_n)

    interpx = jnp.concatenate([ix_inner, ix_outer], axis=-1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * interpx[..., None]
    norm = jnp.max(jnp.abs(pts), axis=-1, keepdims=True)
    contracted = (2.0 - 1.0 / jnp.maximum(norm, 1.0)) * pts / jnp.maximum(norm, 1e-9)
    pts = jnp.where(norm > 1.0, contracted, pts)
    valid = jnp.ones(pts.shape[:-1], bool)
    return pts, interpx, valid


def sample_ray(meta: KPlaneMeta, rays_o, rays_d, n_samples: int, training: bool, key):
    """Uniform-in-box stratified sampling (reference models/tensorf_base.py:290-314).

    Returns (pts (N,S,3), z_vals (N,S), valid (N,S)).
    """
    a = meta.aabb_np
    near, far = meta.near_far
    if meta.parity_sampling:
        # the reference's literal elementwise .any() (tensorf_base.py:294):
        # any coordinate of any origin within its per-axis range => ALL rays
        # start at `near`
        inside_any = jnp.any((rays_o >= a[0]) & (rays_o <= a[1]))
    else:
        # batch-wide switch: a fully-inside origin => start at `near`;
        # otherwise each ray starts at its own aabb entry (deliberate
        # divergence, see KPlaneMeta.parity_sampling)
        inside_any = jnp.any(jnp.all((rays_o >= a[0]) & (rays_o <= a[1]), axis=-1))
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (a[1] - rays_o) / vec
    rate_b = (a[0] - rays_o) / vec
    t_min_c = jnp.clip(jnp.max(jnp.minimum(rate_a, rate_b), axis=-1), near, far)
    t_min = jnp.where(inside_any, near, t_min_c)

    rng = jnp.arange(n_samples, dtype=rays_o.dtype)[None, :]
    if training:
        rng = rng + jax.random.uniform(key, (rays_o.shape[0], 1), rays_o.dtype)
    z_vals = t_min[:, None] + rng * meta.step_size
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    valid = jnp.all((pts >= a[0]) & (pts <= a[1]), axis=-1)
    return pts, z_vals, valid


# ---------------------------------------------------------------------------
# Full render
# ---------------------------------------------------------------------------

def render_rays(
    params,
    meta: KPlaneMeta,
    t,
    rays_o,
    rays_d,
    *,
    key,
    training: bool,
    white_bg: bool,
    transfer_vel: bool = False,
    alpha_state: dict | None = None,
    n_samples: int | None = None,
    mask_params=None,
    advect: bool = True,
    adv_steps: int | None = None,
):
    """Render a batch of rays at time(s) t.

    Args:
      t: scalar or (N,) per-ray times.
      rays_o, rays_d: (N, 3) — unnormalized directions, OpenGL convention.
      alpha_state: optional {'volume': (D,H,W), 'aabb': (2,3)} occupancy used
        for eval-only sample pruning (reference :656-661).
      mask_params: optional MaskField params when ``meta.mask_dim > 0``.
      advect: statically disable RK2 advection — valid ONLY when every t in
        the batch is exactly a keyframe time (the advected result would be
        discarded by the is_key mask anyway); saves two velocity-MLP sweeps.
      adv_steps: static RK2 step-count override (see render_steps_for_time);
        callers that know the batch's concrete time pass the exact count
        instead of the conservative full-[0,1] bound.

    Returns dict with rgb (N,3), depth (N,), acc (N,), weight (N,S),
    mask (N, mask_dim or 3).
    """
    if n_samples is None:
        n_samples = meta.n_samples
    SB = meta.sample_block  # sample-block size for the block-sparse sample axis
    sparse = 0.0 < meta.block_budget < 1.0
    if sparse and meta.ray_sampling != "box":
        # ndc/contracted sample positions depend on n_samples (linspace /
        # inner-outer split), so padding the axis to whole blocks would SHIFT
        # every sample — the dense-equivalence guarantee only holds for box
        # sampling's fixed step_size (advisor round-2 finding).
        raise ValueError(
            "block_budget < 1 requires ray_sampling == 'box' "
            f"(got {meta.ray_sampling!r})"
        )
    orig_n_samples = n_samples
    if sparse:
        # round the sample axis up to whole blocks; the padded samples are
        # forced invalid below (and the original last sample keeps its zero
        # dist) so the result is identical to the unpadded dense path
        n_samples = -(-n_samples // SB) * SB
    N = rays_o.shape[0]
    k_strat, k_bg = (jax.random.split(key) if key is not None else (None, None))

    if meta.ray_sampling == "ndc":
        pts, z_vals, valid = sample_ray_ndc(meta, rays_o, rays_d, n_samples, training, k_strat)
    elif meta.ray_sampling == "contracted":
        pts, z_vals, valid = sample_ray_contracted(meta, rays_o, rays_d, n_samples, training, k_strat)
    else:
        pts, z_vals, valid = sample_ray(meta, rays_o, rays_d, n_samples, training, k_strat)
    dists = jnp.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])], axis=-1
    )
    if sparse and n_samples != orig_n_samples:
        s_idx = jnp.arange(n_samples)
        valid = valid & (s_idx < orig_n_samples)[None, :]
        dists = dists * (s_idx < orig_n_samples - 1)[None, :].astype(dists.dtype)
    if meta.ray_sampling in ("ndc", "contracted"):
        # reference scales dists by |d| and normalizes view directions
        # (tensorf_keyframe.py:617-629)
        d_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        dists = dists * d_norm
        rays_d = rays_d / d_norm
    viewdirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

    t = jnp.asarray(t, dtype=pts.dtype)
    t = jnp.broadcast_to(t.reshape(-1, 1, 1) if t.ndim > 0 else t, (N, n_samples, 1))

    xyz = normalize_coord(meta, pts)

    if transfer_vel:
        base_times = jnp.zeros_like(t)
        time_offset = t
    else:
        base_times = snap_to_keyframe(meta, t)
        time_offset = t - base_times

    # occupancy pruning: eval-only in the reference (:656-661); with the
    # opt-in train_occupancy_prune ("turbo") flag it also prunes TRAINING
    # samples — a TPU-native throughput mode justified by matched quality,
    # not a parity default.  Feeds the block-sparse selection below.
    if alpha_state is not None and (not training or meta.train_occupancy_prune):
        if training:
            # turbo: 1-gather dilated test (weak superset of the trilinear
            # test => keeps marginally more samples, i.e. CLOSER to the
            # reference's dense training than trilinear pruning would be)
            valid = valid & sample_occupied(alpha_state, xyz, meta)
        else:
            # eval: the reference's exact trilinear>0 prune (:656-661)
            valid = valid & (sample_alpha(alpha_state, xyz, meta) > 0)

    # Two-pass evaluation (the fixed-shape analogue of the reference's
    # ray_valid / app_mask boolean compaction, tensorf_keyframe.py:656-735):
    #
    #   pass 1 (dense, rematerialized): advect every sample and evaluate the
    #     field.  With ``shade_reuse`` (default) this gathers the FULL merged
    #     quad rows ONCE and saves the decoded app features alongside sigma —
    #     gather cost is per-index, not per-byte (docs/pallas_decision.md §2),
    #     so the wider rows are free and the shade pass below needs no plane
    #     gathers of its own.  Without it, only the thin Cd density channels
    #     are gathered here (round-3 behavior).
    #   pass 2 (sparse): shade only the top-K samples by compositing weight —
    #     K is a static budget; any sample above rayMarch_weight_thres that
    #     falls outside the budget is dropped (with the default 25% budget
    #     that set is empty in practice), and selected samples below the
    #     threshold are zeroed exactly like the reference's app_mask.
    cp = cast_compute(params, meta)
    reuse = meta.shade_reuse
    app_dt = jnp.dtype(meta.compute_dtype)

    def density_pass(cp, xyz, t, base_times):
        if meta.use_vel and advect:
            # training times satisfy |t - base| <= dt_max (one exact step);
            # eval may extrapolate past tmax and needs the full static bound
            if adv_steps is not None:
                n_steps = adv_steps
            elif transfer_vel:
                n_steps = meta.transfer_adv_steps
            elif training:
                # snap guarantees |offset| <= Delta/2 = unscaled dt_max; at
                # dt_scale < 1 the same offset needs 1/dt_scale finer steps
                n_steps = meta.snap_steps
            else:
                n_steps = meta.render_adv_steps
            advected = integrate_pos(cp, meta, xyz, t, base_times, n_steps=n_steps)
            is_key = jnp.isclose(t, base_times)
            xyz_eval = jnp.where(is_key, xyz, advected)
            bt = base_times
        else:
            xyz_eval = xyz
            bt = t
        xyzt_eval = jnp.concatenate([xyz_eval, normalize_time(meta, bt)], axis=-1)
        aux = {"times": t[..., 0], "time_offset": (t - base_times)[..., 0]}
        if reuse:
            sigma_feat, app = field_features(cp, meta, xyzt_eval)
        else:
            sigma_feat = density_feature(cp, meta, xyzt_eval)
            app = jnp.zeros(xyz.shape[:-1] + (0,), app_dt)
        sigma = feature2density(meta, sigma_feat, aux)
        return (sigma.astype(jnp.float32), xyz_eval.astype(jnp.float32),
                app.astype(app_dt))

    density_pass = jax.checkpoint(density_pass)
    dropped = jnp.zeros(())
    if sparse:
        # select in-box (and, with an alpha mask, occupied) 64-sample blocks
        # under a static budget; skipped blocks are all-invalid => exactly 0.
        nb = n_samples // SB
        total_b = N * nb
        active = valid.reshape(N * nb, SB).any(-1)
        B = min(total_b, max(8, (int(meta.block_budget * total_b) + 7) // 8 * 8))
        score = active.astype(jnp.float32)
        _, sel = jax.lax.top_k(score, B)
        sel = jax.lax.stop_gradient(sel)
        dropped = jnp.maximum(jnp.sum(score) - B, 0.0)

        def pick(x):
            c = x.shape[-1] if x.ndim == 3 else 1
            return x.reshape(N * nb, SB * c)[sel].reshape(B * SB, c)

        sigma_b, xyz_eval_b, app_b = density_pass(cp, pick(xyz), pick(t), pick(base_times))
        sigma = (
            jnp.zeros((N * nb, SB), jnp.float32)
            .at[sel].set(sigma_b.reshape(B, SB))
            .reshape(N, n_samples)
        )
        xyz_eval = (
            jnp.zeros((N * nb, SB * 3), jnp.float32)
            .at[sel].set(xyz_eval_b.reshape(B, SB * 3))
            .reshape(N, n_samples, 3)
        )
        AD = app_b.shape[-1]
        app_feat = (
            jnp.zeros((N * nb, SB * AD), app_dt)
            .at[sel].set(app_b.reshape(B, SB * AD))
            .reshape(N, n_samples, AD)
        )
    else:
        sigma, xyz_eval, app_feat = density_pass(cp, xyz, t, base_times)
    sigma = jnp.where(valid, sigma, 0.0)

    alpha, weight, bg_w = raw2alpha(sigma, dists * meta.distance_scale)
    app_mask = weight > meta.raymarch_weight_thres
    acc = jnp.sum(weight, axis=-1)

    S = n_samples
    total = N * S
    # the shade budget is based on the ORIGINAL sample count so block-sparse
    # padding doesn't change which samples the top-K truncates — keeps the
    # sparse path bit-identical to the dense one
    total_real = N * orig_n_samples
    frac = meta.shade_fraction
    use_topk = 0.0 < frac < 1.0 and total_real > 512
    shader = make_shader(meta.shading_mode, meta.view_pe, meta.pos_pe, meta.fea_pe)

    dropped_shade = jnp.zeros(())
    if use_topk:
        # PER-RAY top-k selection (round 3): each ray shades its k highest-
        # weight samples above the march threshold.  Compared to the earlier
        # global argsort over N*S scores this (a) sorts 686-length rows
        # instead of one 5.6M-element array, (b) gathers row-locally, and
        # (c) composites with a plain axis-sum instead of a scatter-add.
        # Exactness is the same contract as the reference's app_mask
        # compaction (tensorf_keyframe.py:719-735): any sample above
        # rayMarch_weight_thres beyond the per-ray budget is dropped, and the
        # 'dropped_shade' counter reports exactly how many (0 in practice —
        # per-ray surviving samples are far below k at the default 25%).
        K = min(S, max(16, (int(orig_n_samples * frac) + 7) // 8 * 8))
        score = jnp.where(app_mask, weight, 0.0)  # == weight * app_mask
        w_top, sel = jax.lax.top_k(score, K)  # (N, K)
        sel = jax.lax.stop_gradient(sel)
        dropped_shade = (
            jnp.sum(app_mask) - jnp.sum(w_top > meta.raymarch_weight_thres)
        ).astype(jnp.float32)

        def take_vec(x):  # (N, S, 3) -> (N, K, 3)
            return jnp.take_along_axis(x, sel[..., None], axis=1)

        xyz_sel = take_vec(xyz_eval)
        view_sel = take_vec(viewdirs)
        aux_sel = {
            "times": jnp.take_along_axis(t[..., 0], sel, axis=1),
            "time_offset": jnp.take_along_axis(time_offset[..., 0], sel, axis=1),
        }

        if reuse:
            # the density pass already gathered + decoded the app rows at
            # every sample; the shade pass is just a row-select + shader MLP
            app_sel = jnp.take_along_axis(app_feat, sel[..., None], axis=1)

            def shade_pass(cp, xyz_sel, app_sel, view_sel, aux_sel):
                return shader(
                    cp["shader"], xyz_sel, view_sel, app_sel, aux_sel
                ).astype(jnp.float32)

            shade_pass = jax.checkpoint(shade_pass)
            rgb_sel = shade_pass(cp, xyz_sel, app_sel, view_sel, aux_sel)
        else:
            bt_sel = jnp.take_along_axis(base_times[..., 0], sel, axis=1)

            def shade_pass(cp, xyz_sel, bt_sel, view_sel, aux_sel):
                xyzt = jnp.concatenate(
                    [xyz_sel, normalize_time(meta, bt_sel)[..., None]], axis=-1
                )
                app = app_feature(cp, meta, xyzt)
                return shader(cp["shader"], xyz_sel, view_sel, app, aux_sel).astype(jnp.float32)

            shade_pass = jax.checkpoint(shade_pass)
            rgb_sel = shade_pass(cp, xyz_sel, bt_sel, view_sel, aux_sel)
        rgb = jnp.sum(w_top[..., None] * rgb_sel, axis=1)
    else:
        if reuse:

            def shade_dense(cp, xyz_eval, app_feat, viewdirs):
                aux = {"times": t[..., 0], "time_offset": time_offset[..., 0]}
                return shader(
                    cp["shader"], xyz_eval, viewdirs, app_feat, aux
                ).astype(jnp.float32)

            shade_dense = jax.checkpoint(shade_dense)
            rgb_pts = shade_dense(cp, xyz_eval, app_feat, viewdirs)
        else:

            def shade_dense(cp, xyz_eval, base_times, viewdirs):
                xyzt_eval = jnp.concatenate(
                    [xyz_eval, normalize_time(meta, base_times)], axis=-1
                )
                aux = {"times": t[..., 0], "time_offset": time_offset[..., 0]}
                app = app_feature(cp, meta, xyzt_eval)
                return shader(cp["shader"], xyz_eval, viewdirs, app, aux).astype(jnp.float32)

            shade_dense = jax.checkpoint(shade_dense)
            rgb_pts = shade_dense(cp, xyz_eval, base_times, viewdirs)
        rgb_pts = jnp.where(app_mask[..., None], rgb_pts, 0.0)
        rgb = jnp.sum(weight[..., None] * rgb_pts, axis=-2)

    # white-background compositing with the reference's training coin flip
    # (reference :740: `if white_bg or (training and rand() < 0.5)`)
    if white_bg:
        rgb = rgb + (1.0 - acc[..., None])
    elif training:
        coin = jax.random.uniform(k_bg, ()) < 0.5
        rgb = jnp.where(coin, rgb + (1.0 - acc[..., None]), rgb)
    rgb = jnp.clip(rgb, 0.0, 1.0)

    depth = jnp.sum(weight * z_vals, axis=-1) + (1.0 - acc) * meta.near_far[1]

    # optional segmentation head composited along the ray (reference :749-755)
    if meta.mask_dim > 0 and mask_params is not None:
        if use_topk:
            m_sel = mask_mod.apply(mask_params, xyz_sel)  # (N, K, mask_dim)
            mask_map = jnp.sum(w_top[..., None] * m_sel, axis=1)
        else:
            m = mask_mod.apply(mask_params, xyz_eval)
            m = jnp.where(app_mask[..., None], m, 0.0)
            mask_map = jnp.sum(weight[..., None] * m, axis=-2)
    else:
        mask_map = jnp.zeros((N, 3), dtype=rgb.dtype)

    return {
        "rgb": rgb,
        "depth": depth,
        "acc": acc,
        "weight": weight,
        "mask": mask_map,
        "z_vals": z_vals,
        # active sample-blocks that exceeded the block_budget (0 when dense
        # or when the budget covered every active block — i.e. exact math)
        "dropped_blocks": dropped,
        # above-threshold samples truncated by the per-ray shade budget
        # (0 => the top-K shade pass reproduced app_mask compaction exactly)
        "dropped_shade": dropped_shade,
    }


# ---------------------------------------------------------------------------
# Alpha mask (occupancy grid)
# ---------------------------------------------------------------------------

def _to_mask_coords(alpha_state: dict, xyz_norm, meta: KPlaneMeta | None):
    """Re-normalize model-aabb coords into the alpha volume's own aabb —
    exactly what the reference's AlphaGridMask does with ``alpha_aabb``
    internally.  This matters whenever the model aabb has moved since the
    mask was built: the trainer shrinks the aabb right AFTER building the
    mask at each alpha-mask stage event, so training-time occupancy lookups
    (turbo pruning, PDE prefilter) MUST re-normalize.  Without ``meta`` the
    two aabbs are assumed identical (the eval path builds a fresh mask)."""
    if meta is None:
        return xyz_norm
    world = denormalize_coord(meta, xyz_norm)
    a = alpha_state["aabb"]
    return (world - a[0]) * 2.0 / (a[1] - a[0]) - 1.0


def sample_alpha(alpha_state: dict, xyz_norm, meta: KPlaneMeta | None = None):
    """Trilinear occupancy lookup (reference AlphaGridMask :417-442)."""
    return grid_sample_3d(
        alpha_state["volume"], _to_mask_coords(alpha_state, xyz_norm, meta)
    )


def corner_dilate(vol):
    """(D,H,W) -> per-cell corner max: out[i,j,k] = max(vol[i:i+2, j:j+2, k:k+2])
    with edge clamping."""
    for ax in range(3):
        n = vol.shape[ax]
        idx = jnp.minimum(jnp.arange(n) + 1, n - 1)
        vol = jnp.maximum(vol, jnp.take(vol, idx, axis=ax))
    return vol


def sample_occupied(alpha_state: dict, xyz_norm, meta: KPlaneMeta | None = None):
    """Boolean occupancy test, equal to ``sample_alpha(...) > 0``.

    The binary volume makes ``trilinear(x) > 0`` equivalent to "some cell
    corner with nonzero interpolation weight is occupied", which ONE nearest
    gather into the corner-dilated volume answers — 1 gather/sample instead
    of the trilinear lookup's 8 (measured ~3.8 ns/index on v5e, this is a
    real term at 350k samples/chunk).  At exactly grid-aligned coords the
    dilated test also sees corners whose trilinear weight is exactly 0, so it
    is (weakly) MORE permissive: a superset of kept samples — pruning
    stays exact (never drops a sample the trilinear test keeps).

    Falls back to the trilinear test when the state has no precomputed
    ``dilated`` volume (old checkpoints)."""
    dil = alpha_state.get("dilated")
    if dil is None:
        return sample_alpha(alpha_state, xyz_norm, meta) > 0
    c = _to_mask_coords(alpha_state, xyz_norm, meta)
    D, H, W = dil.shape
    sizes = jnp.asarray([W, H, D], dtype=c.dtype)
    pix = (c + 1.0) * 0.5 * (sizes - 1.0)
    # cells outside the volume by a full cell have no in-range corner
    in_range = jnp.all((pix > -1.0) & (pix < sizes), axis=-1)
    i = jnp.clip(jnp.floor(pix).astype(jnp.int32), 0,
                 jnp.asarray([max(W - 2, 0), max(H - 2, 0), max(D - 2, 0)],
                             jnp.int32))
    flat = dil.reshape(-1)
    v = flat[(i[..., 2] * H + i[..., 1]) * W + i[..., 0]]
    return (v > 0) & in_range


def compute_dense_alpha(params, meta: KPlaneMeta, grid_size: tuple, transfer: bool = False,
                        n_times: int = 60, chunk: int = 262144):
    """Max-over-time dense alpha grid (reference getDenseAlpha :460-499).

    Sweeps t over ``linspace(0, 59, 60)/60`` exactly as the reference, advecting
    grid points to keyframe (or t=0 for transfer) before density eval.  Grid
    coordinates are passed as device arguments in fixed-size chunks (never
    baked as jit constants — a 200^3 grid inlined into the HLO is ~100 MB).
    Returns (alpha (gx,gy,gz), dense_xyz (gx,gy,gz,3)).
    """
    gx, gy, gz = grid_size
    a = meta.aabb_np
    lin = [np.linspace(0.0, 1.0, g, dtype=np.float32) for g in (gx, gy, gz)]
    mesh = np.stack(np.meshgrid(*lin, indexing="ij"), axis=-1)
    dense_xyz = a[0] * (1 - mesh) + a[1] * mesh  # (gx,gy,gz,3) host
    flat = dense_xyz.reshape(-1, 3)
    xyz_norm = normalize_coord(meta, flat).astype(np.float32)
    total = flat.shape[0]
    chunk = min(chunk, total)

    # Two step-count specializations (static n_steps => 2 compiles, not 60):
    # times inside the training window need ONE RK2 step after keyframe
    # snapping; only t > tmax needs the full extrapolation bound.  The
    # transfer sweep advects from t all the way to 0 and uses the [0,1] bound
    # (the reference's data-dependent while-loop, tensorf_keyframe.py:591-609).
    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def alpha_chunk(params, xyz_c, tval, *, n_steps):
        t = jnp.full((xyz_c.shape[0], 1), tval, dtype=jnp.float32)
        if transfer:
            base = jnp.zeros_like(t)
        else:
            base = snap_to_keyframe(meta, t)
        prev = integrate_pos(params, meta, xyz_c, t, base, n_steps=n_steps)
        xyzt = jnp.concatenate([prev, normalize_time(meta, base)], axis=-1)
        feat = density_feature(params, meta, xyzt)
        sigma = feature2density(meta, feat, {"times": t[..., 0], "time_offset": (t - base)[..., 0]})
        return 1.0 - jnp.exp(-sigma * meta.step_size)

    pad = (-total) % chunk
    padded = np.concatenate([xyz_norm, np.zeros((pad, 3), np.float32)]) if pad else xyz_norm
    n_chunks = padded.shape[0] // chunk
    chunks = [jnp.asarray(padded[i * chunk : (i + 1) * chunk]) for i in range(n_chunks)]

    alpha = [jnp.zeros((chunk,), jnp.float32) for _ in range(n_chunks)]
    for i in range(n_times):
        tval = i / n_times
        if transfer:
            n_steps = meta.transfer_adv_steps
        else:
            n_steps = (meta.snap_steps if tval <= meta.tmax + 1e-6
                       else meta.render_adv_steps)
        for c in range(n_chunks):
            alpha[c] = jnp.maximum(
                alpha[c],
                alpha_chunk(params, chunks[c], jnp.float32(tval), n_steps=n_steps),
            )
    alpha = np.concatenate([np.asarray(x) for x in alpha])
    if pad:
        alpha = alpha[:-pad]
    return jnp.asarray(alpha.reshape(gx, gy, gz)), jnp.asarray(dense_xyz)


def update_alpha_mask(params, meta: KPlaneMeta, grid_size: tuple, transfer: bool = False):
    """Build the binary occupancy volume + proposed shrunk aabb
    (reference updateAlphaMask :378-405).

    Returns (alpha_state, new_aabb (2,3) numpy).  The stored volume is laid out
    (D,H,W) = (gz,gy,gx) so that grid_sample_3d's (x,y,z) coordinate order
    matches the reference's transpose(0,2) layout.
    """
    alpha, dense_xyz = compute_dense_alpha(params, meta, grid_size, transfer)
    alpha = jnp.clip(alpha, 0, 1).transpose(2, 1, 0)  # (gz,gy,gx)
    alpha = max_pool3d_same(alpha, kernel=3)
    alpha = (alpha >= meta.alpha_mask_thres).astype(jnp.float32)

    alpha_np = np.asarray(alpha)
    dense_np = np.asarray(dense_xyz).transpose(2, 1, 0, 3)
    occ = alpha_np > 0.5
    if occ.any():
        valid_xyz = dense_np[occ]
        new_aabb = np.stack([valid_xyz.min(0), valid_xyz.max(0)])
    else:
        new_aabb = meta.aabb_np.copy()
    vol = jnp.asarray(alpha_np)
    alpha_state = {
        "volume": vol,
        "aabb": jnp.asarray(meta.aabb_np),
        # corner-dilated binary volume: lets occupancy tests run as ONE
        # nearest gather instead of 8 trilinear corners (sample_occupied)
        "dilated": corner_dilate(vol),
    }
    return alpha_state, new_aabb


# ---------------------------------------------------------------------------
# Stage transitions: upsample & shrink (pure)
# ---------------------------------------------------------------------------

def upsample(params: dict, meta: KPlaneMeta, res_target: tuple, new_keyframes: int):
    """Bilinear-upsample all planes to a new resolution / keyframe count
    (reference up_sampling_VM + upsample_volume_grid :327-376)."""
    res_target = tuple(int(r) for r in res_target)
    new_params = dict(params)

    def up_space(plane, i):
        m0, m1 = MAT_SPACE[i]
        return resize_bilinear_ac(plane, (res_target[m1], res_target[m0]), axes=(0, 1))

    def up_time(plane, i):
        m0, _ = MAT_TIME[i]
        return resize_bilinear_ac(plane, (new_keyframes, res_target[m0]), axes=(0, 1))

    new_params["planes_space"] = [up_space(p, i) for i, p in enumerate(params["planes_space"])]
    new_params["planes_time"] = [up_time(p, i) for i, p in enumerate(params["planes_time"])]

    new_meta = replace(meta, grid_size=res_target, num_keyframes=int(new_keyframes))
    return new_params, new_meta


def shrink(params: dict, meta: KPlaneMeta, new_aabb: np.ndarray):
    """Crop planes to a tightened aabb (reference shrink :407-458)."""
    a = meta.aabb_np
    units = meta.units
    gs = np.asarray(meta.grid_size)
    xyz_min, xyz_max = np.asarray(new_aabb)
    t_l = np.round(np.round((xyz_min - a[0]) / units)).astype(np.int64)
    b_r = np.round((xyz_max - a[0]) / units).astype(np.int64) + 1
    b_r = np.minimum(b_r, gs)
    t_l = np.clip(t_l, 0, None)

    new_params = dict(params)

    def crop_space(plane, i):
        m0, m1 = MAT_SPACE[i]
        return plane[t_l[m1]:b_r[m1], t_l[m0]:b_r[m0], :]

    def crop_time(plane, i):
        m0, _ = MAT_TIME[i]
        return plane[:, t_l[m0]:b_r[m0], :]

    new_params["planes_space"] = [crop_space(p, i) for i, p in enumerate(params["planes_space"])]
    new_params["planes_time"] = [crop_time(p, i) for i, p in enumerate(params["planes_time"])]

    # snap the aabb to the actually-cropped voxel boundaries (reference :448-454)
    t_l_r = t_l / (gs - 1)
    b_r_r = (b_r - 1) / (gs - 1)
    correct = np.zeros((2, 3), dtype=np.float32)
    correct[0] = (1 - t_l_r) * a[0] + t_l_r * a[1]
    correct[1] = (1 - b_r_r) * a[0] + b_r_r * a[1]

    new_size = tuple(int(v) for v in (b_r - t_l))
    new_aabb_t = tuple(tuple(float(v) for v in row) for row in correct)
    gate = meta.vel_gate
    if gate.mode == "sur" and gate.world:
        # normalized coords change with the aabb: re-normalize the WORLD sur
        # box so the gate keeps covering the same physical region (the
        # reference's bounds go stale here, but it never shrinks sur scenes —
        # see VelGate docstring)
        sur = np.asarray(gate.world, dtype=np.float64)
        nb = (sur - correct[0]) * 2.0 / (correct[1] - correct[0]) - 1.0
        gate = gate._replace(bounds=(tuple(nb[0].tolist()), tuple(nb[1].tolist())))
    new_meta = replace(
        meta,
        grid_size=new_size,
        aabb=new_aabb_t,
        vel_gate=gate,
    )
    return new_params, new_meta


# ---------------------------------------------------------------------------
# Regularizers (reference :188-231)
# ---------------------------------------------------------------------------

def density_l1(params, meta: KPlaneMeta):
    """L1 of density planes; time planes penalized toward 1 (reference :188-203)."""
    cd = meta.density_n_comp
    total = 0.0
    for p in params["planes_space"]:
        total = total + jnp.mean(jnp.abs(p[..., :cd]))
    for p in params["planes_time"]:
        total = total + jnp.mean(jnp.abs(1.0 - p[..., :cd]))
    return total


def _tv(plane, t_axis: bool):
    """Plain first-difference TV — the live TVLoss (reference
    utils/tensorf_utils.py:139-158); time planes weight the keyframe axis x3."""
    h = plane.shape[0]
    w = plane.shape[1]
    if t_axis:
        h_tv = jnp.sum((plane[1:] - plane[:-1]) ** 2) * 3.0
        count_h = max((h - 2), 1) * w * plane.shape[2]
    else:
        h_tv = jnp.sum((plane[1:] - plane[:-1]) ** 2)
        count_h = (h - 1) * w * plane.shape[2]
    w_tv = jnp.sum((plane[:, 1:] - plane[:, :-1]) ** 2)
    count_w = h * (w - 1) * plane.shape[2]
    return 2.0 * (h_tv / count_h + w_tv / count_w)


def tv_loss_density(params, meta: KPlaneMeta):
    cd = meta.density_n_comp
    total = 0.0
    for p in params["planes_space"]:
        total = total + _tv(p[..., :cd], False) * 1e-2
    if meta.num_keyframes > 1:
        for p in params["planes_time"]:
            total = total + _tv(p[..., :cd], True) * 1e-2
    return total


def tv_loss_app(params, meta: KPlaneMeta):
    cd = meta.density_n_comp
    total = 0.0
    for p in params["planes_space"]:
        total = total + _tv(p[..., cd:], False) * 1e-2
    return total
