#!/usr/bin/env python
"""Single-chip perf ablation: where does the train-step time go?

Runs several jitted fwd+bwd variants of the bat-scale step in ONE process
(remote compiles are expensive — batch experiments per process, CLAUDE.md)
and prints a ms/call table:

  T1 grad(sum acc)                density+advect+composite (shading DCE'd)
  T2 grad(sum acc), advect=False  T1 minus the velocity-MLP RK2 sweeps
  T3 grad(sum rgb)                full render batch (top-K shade, argsort)
  T4 grad(sum rgb), dense shade   shade_fraction=1.0 (no argsort/scatter)
  T5 PDE loss grad                262144 filter pts / 32768 jacobian budget
  T3_16k                          T3 at 16384 rays (HBM spill probe)

Usage: python scripts/perf_ablate.py  (TPU; keep it the only TPU process)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from nvfi_tpu.fields import kplane
from nvfi_tpu.physics.pde import vel_pde_loss
from nvfi_tpu.train.trainer import n_to_reso


def make_meta(shade_fraction=0.25):
    aabb = np.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    grid = tuple(n_to_reso(8_000_000, aabb))
    return kplane.KPlaneMeta(
        grid_size=grid, num_keyframes=16, tmax=0.75,
        aabb=((-2.0,) * 3, (2.0,) * 3), near_far=(2.0, 6.0),
        density_n_comp=24, app_n_comp=48, app_dim=32,
        density_shift=-10.0, distance_scale=25.0,
        alpha_mask_thres=1e-4, raymarch_weight_thres=1e-4,
        feature_c=128, max_n_samples=1024, use_vel=True,
        compute_dtype="bfloat16", shade_fraction=shade_fraction,
    )


def make_rays(n, seed=0):
    rng = np.random.RandomState(seed)
    ro = np.tile(np.array([[0.0, 0.0, 4.5]], np.float32), (n, 1))
    d = np.concatenate([rng.randn(n, 2) * 0.35, -np.ones((n, 1))], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = rng.rand(n).astype(np.float32) * 0.75
    return jnp.asarray(ro), jnp.asarray(d.astype(np.float32)), jnp.asarray(t)


def timed(name, fn, args, n=5):
    t0 = time.time()
    out = fn(*args)
    s = float(out)  # device->host sync (block_until_ready unreliable via tunnel)
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    s = float(out)
    dt = (time.time() - t0) / n
    print(f"{name:>28s}: {dt * 1e3:8.1f} ms  (compile+1st {t_compile:5.1f}s, val {s:.3e})",
          flush=True)
    return dt



def turbo_main(budget: float, shade: float):
    """Component breakdown of the TURBO chunk (real exported occupancy).

    The dense table above models a 2x32x45.1ms + 30ms = 2917 ms step, but the
    measured turbo step is ~1826 ms (~28 ms/chunk) — this probe attributes the
    turbo chunk's cost so the residual over the gather speed-of-light
    (docs/pallas_decision.md §5) points at the next lever.  Needs
    assets/bench_alpha.npz (exported from the 30k turbo run).
    """
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import load_alpha_asset

    asset = load_alpha_asset()
    assert asset is not None, "run scripts/export_bench_alpha.py first"
    alpha_state, model_aabb, _ = asset
    alpha_state["dilated"] = kplane.corner_dilate(alpha_state["volume"])

    aabb = np.asarray(model_aabb)
    base = make_meta(shade_fraction=shade)
    meta = dataclasses.replace(
        base,
        grid_size=tuple(n_to_reso(8_000_000, aabb)),
        aabb=(tuple(float(v) for v in aabb[0]),
              tuple(float(v) for v in aabb[1])),
        train_occupancy_prune=True, block_budget=float(budget))
    occ = float(np.asarray(alpha_state["volume"]).mean())
    print(f"device={jax.devices()[0]} grid={meta.grid_size} S={meta.n_samples} "
          f"budget={budget} shade={shade} occ={occ:.4f}", flush=True)
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    key = jax.random.PRNGKey(1)

    center = aabb.mean(axis=0)
    rng = np.random.RandomState(0)
    n = 256
    ro = np.tile((center + np.array([0.0, 0.0, 4.0])).astype(np.float32), (n, 1))
    d = center[None] + rng.randn(n, 3).astype(np.float32) * 0.5 - ro
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro, rd = jnp.asarray(ro), jnp.asarray(d)
    t = jnp.asarray(rng.rand(n).astype(np.float32) * 0.75)

    def loss(params, t, ro, rd, key, m, advect, out_key):
        out = kplane.render_rays(params, m, t, ro, rd, key=key, training=True,
                                 white_bg=True, advect=advect,
                                 alpha_state=alpha_state)
        return jnp.sum(out[out_key]), out["dropped_blocks"]

    @jax.jit
    def probe_active(params, t, ro, rd, key):
        out = kplane.render_rays(params, meta, t, ro, rd, key=key,
                                 training=True, white_bg=True,
                                 alpha_state=alpha_state)
        return out["dropped_blocks"] * 1.0

    print(f"dropped at budget={budget}: {float(probe_active(params, t, ro, rd, key)):.0f}",
          flush=True)

    def g(m, advect, out_key):
        def f(params, t, ro, rd, key):
            grads = jax.grad(
                lambda *a: loss(*a)[0])(params, t, ro, rd, key, m, advect, out_key)
            return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(grads))
        return jax.jit(f)

    def fwd(m):
        return jax.jit(lambda p, t, ro, rd, key: loss(p, t, ro, rd, key, m, True, "rgb")[0])

    mk = lambda **kw: dataclasses.replace(meta, **kw)

    timed("Tu fwd rgb", fwd(meta), (params, t, ro, rd, key))
    timed("Tu acc-grad (density)", g(meta, True, "acc"), (params, t, ro, rd, key))
    timed("Tu acc-grad no-advect", g(meta, False, "acc"), (params, t, ro, rd, key))
    tu = timed("Tu rgb-grad (the chunk)", g(meta, True, "rgb"), (params, t, ro, rd, key))
    timed("Tu rgb-grad no-advect", g(meta, False, "rgb"), (params, t, ro, rd, key))
    timed("Tu rgb-grad dense-shade", g(mk(shade_fraction=1.0), True, "rgb"),
          (params, t, ro, rd, key))
    timed("Tu rgb-grad shade=0.05", g(mk(shade_fraction=0.05), True, "rgb"),
          (params, t, ro, rd, key))
    timed("Tu rgb-grad budget=1.0", g(mk(block_budget=1.0), True, "rgb"),
          (params, t, ro, rd, key))
    print(f"step estimate 2x32 turbo chunks = {2 * 32 * tu * 1e3 + 30:.0f} ms "
          f"({2 * 8192 / (2 * 32 * tu * 1e3 + 30) * 1e3:,.0f} rays/s)", flush=True)


def main():
    meta = make_meta()
    meta_dense = make_meta(shade_fraction=1.0)
    print(f"device={jax.devices()[0]} grid={meta.grid_size} S={meta.n_samples}",
          flush=True)
    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    key = jax.random.PRNGKey(1)

    def render_loss(params, t, ro, rd, key, m, advect, out_key):
        out = kplane.render_rays(params, m, t, ro, rd, key=key, training=True,
                                 white_bg=True, advect=advect)
        return jnp.sum(out[out_key])

    def g(m, advect, out_key):
        def f(params, t, ro, rd, key):
            grads = jax.grad(render_loss)(params, t, ro, rd, key, m, advect, out_key)
            return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(grads))
        return jax.jit(f)

    def fwd(m):
        def f(params, t, ro, rd, key):
            return render_loss(params, t, ro, rd, key, m, True, "rgb")
        return jax.jit(f)

    # per-chunk scale (the trainer's scan runs 256-ray chunks 32x per batch)
    ro, rd, t = make_rays(256)
    timed("C256 fwd rgb", fwd(meta), (params, t, ro, rd, key))
    timed("C256 acc-grad (density)", g(meta, True, "acc"), (params, t, ro, rd, key))
    timed("C256 acc-grad no-advect", g(meta, False, "acc"), (params, t, ro, rd, key))
    c256 = timed("C256 rgb-grad (topk)", g(meta, True, "rgb"), (params, t, ro, rd, key))
    timed("C256 rgb-grad (dense)", g(meta_dense, True, "rgb"), (params, t, ro, rd, key))

    ro2, rd2, t2 = make_rays(512, seed=1)
    c512 = timed("C512 rgb-grad (topk)", g(meta, True, "rgb"), (params, t2, ro2, rd2, key))
    ro3, rd3, t3 = make_rays(1024, seed=2)
    c1024 = timed("C1024 rgb-grad (topk)", g(meta, True, "rgb"), (params, t3, ro3, rd3, key))

    @jax.jit
    def pde(params, key):
        grads = jax.grad(
            lambda p: vel_pde_loss(p, meta, key, 262144, occupied_budget=32768)
        )(params)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(grads))

    t5 = timed("T5 PDE-grad (stratified)", pde, (params, key))

    # ceiling probe: the PDE with a precomputed-mask filter (one trilinear
    # lookup instead of the advect+density filter) — bounds what's left of
    # the filter cost after the stratified time split
    g128 = 128
    lin = np.linspace(-1, 1, g128)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = jnp.asarray(((xx**2 + yy**2 + zz**2) < 0.3).astype(np.float32))
    alpha_state = {"volume": vol, "aabb": jnp.asarray(meta.aabb_np)}

    @jax.jit
    def pde_mask(params, key):
        grads = jax.grad(
            lambda p: vel_pde_loss(p, meta, key, 262144, occupied_budget=32768,
                                   alpha_state=alpha_state)
        )(params)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(grads))

    t5m = timed("T5 PDE-grad (mask filter)", pde_mask, (params, key))

    for n_chunks, c in ((32, c256), (16, c512), (8, c1024)):
        est = 2 * n_chunks * c * 1e3 + t5 * 1e3
        print(f"estimate 2x{n_chunks} chunks + PDE = {est:.0f} ms "
              f"({2 * 8192 / est * 1e3:,.0f} rays/s)", flush=True)
    print(f"512/256 scaling {c512 / c256:.2f}x, 1024/256 {c1024 / c256:.2f}x "
          f"(linear = 2/4)", flush=True)
    print(f"PDE filter delta (advect-filter vs mask-filter): "
          f"{(t5 - t5m) * 1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--turbo", action="store_true",
                    help="component breakdown of the turbo chunk (needs "
                         "assets/bench_alpha.npz)")
    ap.add_argument("--budget", type=float, default=0.212)
    ap.add_argument("--shade", type=float, default=0.25)
    a = ap.parse_args()
    if a.turbo:
        turbo_main(a.budget, a.shade)
    else:
        main()
