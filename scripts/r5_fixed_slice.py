#!/usr/bin/env python
"""Attribute the last ~7 ms/chunk of the benched turbo step (VERDICT r4 item 5).

docs/pallas_decision.md §5 splits the 24.5 ms benched chunk into ~7 ms density
gather/scatter + ~7 ms top-K shade + 3.7 ms advection + ~7 ms UNATTRIBUTED
"composite/shader/fixed".  This session splits that residual:

  chunk arms (full fwd+bwd at the benched protocol, real 30k occupancy):
    base            — benched config (SB 16, probed budget, shade 0.25)
    shaderC64       — shader MLP width 128 -> 64 (halves the shader matmuls)
    shader_f32      — compute_dtype float32 (MXU bf16 -> f32 across the step;
                      isolates how much of the residual is MXU-bound)
  standalone micro-ops (same shapes the chunk runs, fwd+bwd where grads flow):
    topk_block      — lax.top_k over the block scores (budget selection)
    topk_shade      — per-ray top_k over (N, S) compositing weights
    composite       — raw2alpha + exclusive-cumprod + weight sum, with grad
    shader_mlp      — the 3-layer MLP_PE shader alone at the shaded count

Usage (TPU, only process): python scripts/r5_fixed_slice.py [budget] [shade]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from nvfi_tpu.fields import kplane
from nvfi_tpu.fields.shaders import init_shader, make_shader
from nvfi_tpu.ops.compositing import raw2alpha
from nvfi_tpu.train.trainer import n_to_reso
from scripts.perf_ablate import make_meta, timed
from bench import load_alpha_asset


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 0.237
    shade = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25

    asset = load_alpha_asset()
    assert asset is not None, "needs assets/bench_alpha.npz"
    alpha_state, model_aabb, _ = asset
    alpha_state["dilated"] = kplane.corner_dilate(alpha_state["volume"])
    aabb = np.asarray(model_aabb)

    def mk(**kw):
        base = make_meta(shade_fraction=shade)
        return dataclasses.replace(
            base,
            grid_size=tuple(n_to_reso(8_000_000, aabb)),
            aabb=(tuple(float(v) for v in aabb[0]),
                  tuple(float(v) for v in aabb[1])),
            train_occupancy_prune=True, block_budget=budget,
            sample_block=16, **kw)

    meta = mk()
    print(f"device={jax.devices()[0]} grid={meta.grid_size} S={meta.n_samples} "
          f"budget={budget} shade={shade}", flush=True)

    n = 256
    center = aabb.mean(axis=0)
    rng = np.random.RandomState(0)
    ro = np.tile((center + np.array([0.0, 0.0, 4.0])).astype(np.float32), (n, 1))
    d = center[None] + rng.randn(n, 3).astype(np.float32) * 0.5 - ro
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro, rd = jnp.asarray(ro), jnp.asarray(d)
    t = jnp.asarray(rng.rand(n).astype(np.float32) * 0.75)
    key = jax.random.PRNGKey(1)

    def chunk_ms(m, params):
        def loss(params, t, ro, rd, key):
            out = kplane.render_rays(params, m, t, ro, rd, key=key,
                                     training=True, white_bg=True,
                                     alpha_state=alpha_state)
            return jnp.sum(out["rgb"])

        return jax.jit(lambda *a: jax.grad(loss)(*a)["basis_mat"]["w"].sum())

    params = kplane.init_params(jax.random.PRNGKey(0), meta)
    base_ms = timed("base chunk rgb-grad", chunk_ms(meta, params),
                    (params, t, ro, rd, key))

    m64 = mk(feature_c=64)
    p64 = kplane.init_params(jax.random.PRNGKey(0), m64)
    timed("shader featureC=64", chunk_ms(m64, p64), (p64, t, ro, rd, key))

    mf32 = mk(compute_dtype="float32")
    timed("compute_dtype=f32", chunk_ms(mf32, params), (params, t, ro, rd, key))

    # ---- dispatch floor ----------------------------------------------------
    # The first (crashed) session showed micro-ops of wildly different sizes
    # all costing ~9 ms — suspicious of a fixed per-dispatch cost through the
    # axon tunnel rather than kernel time.  Time a trivial jitted reduction:
    # whatever it costs is the floor every "timed" row pays, and if it is
    # ~9 ms the unattributed chunk residual is dispatch latency, not compute.
    tiny = jnp.arange(8, dtype=jnp.float32)
    timed("dispatch floor (8-elt sum)", jax.jit(lambda x: x.sum()), (tiny,), n=20)

    # ---- standalone micro-ops at the chunk's real shapes -------------------
    S = meta.n_samples
    S_pad = -(-S // meta.sample_block) * meta.sample_block
    nb = S_pad // meta.sample_block
    total_b = n * nb
    B = max(8, (int(budget * total_b) + 7) // 8 * 8)
    K = max(16, (int(S * shade) + 7) // 8 * 8)
    print(f"shapes: S={S} blocks={total_b} B={B} shadeK={K}", flush=True)

    score_b = jnp.asarray(rng.rand(total_b).astype(np.float32))
    timed("topk_block (fwd)",
          jax.jit(lambda s: jax.lax.top_k(s, B)[1].sum()), (score_b,), n=20)

    w = jnp.asarray(rng.rand(n, S).astype(np.float32) * 1e-2)
    timed("topk_shade (fwd)",
          jax.jit(lambda s: jax.lax.top_k(s, K)[1].sum()), (w,), n=20)

    sigma = jnp.asarray(rng.rand(n, S).astype(np.float32))
    dists = jnp.full((n, S), 0.01, jnp.float32)

    def comp(sigma):
        alpha, weight, bg_w = raw2alpha(sigma, dists * 25.0)
        return jnp.sum(weight) + jnp.sum(bg_w)

    timed("composite grad", jax.jit(lambda s: jax.grad(comp)(s).sum()), (sigma,), n=20)

    shader = make_shader("MLP_PE", meta.view_pe, meta.pos_pe, meta.fea_pe)
    sp = init_shader(jax.random.PRNGKey(2), "MLP_PE", meta.app_dim,
                     meta.view_pe, meta.pos_pe, meta.fea_pe, meta.feature_c)
    pts = jnp.asarray(rng.randn(n, K, 3).astype(np.float32))
    view = jnp.asarray(rng.randn(n, K, 3).astype(np.float32))
    feat = jnp.asarray(rng.randn(n, K, meta.app_dim).astype(np.float32)).astype(jnp.bfloat16)

    def shade_loss(sp):
        return jnp.sum(shader(sp, pts, view, feat, None).astype(jnp.float32))

    timed("shader_mlp grad",
          jax.jit(lambda p: jax.tree.reduce(
              lambda a, b: a + b.sum(),
              jax.grad(shade_loss)(p), 0.0)), (sp,), n=20)


if __name__ == "__main__":
    main()
