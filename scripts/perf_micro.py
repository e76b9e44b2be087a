#!/usr/bin/env python
"""Micro-benchmarks of the density-core constituents at exact hot-path shapes.

One 256-ray chunk = 175,616 samples against a 199^2 quad plane.  Times:
  gather fwd / fwd+bwd (the scatter-add VJP)
  (P,24) elementwise product chain fwd+bwd  vs  packed (P/16,384) form
  velocity MLP fwd+bwd (f32 activations vs bf16)
  cumprod compositing fwd+bwd
  argsort vs top_k vs approx_max_k selection
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

P = 256 * 686
HW = 198 * 198
C4 = 96


def timed(name, fn, args, n=10):
    t0 = time.time()
    out = fn(*args)
    s = float(jnp.sum(out) if hasattr(out, "shape") and out.shape else out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    s = float(jnp.sum(out) if hasattr(out, "shape") and out.shape else out)
    dt = (time.time() - t0) / n
    print(f"{name:>34s}: {dt * 1e3:8.2f} ms  (compile {tc:4.1f}s)", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    quad = jax.random.normal(ks[0], (HW, C4), jnp.bfloat16)
    idx = jax.random.randint(ks[1], (P,), 0, HW)
    w = jax.random.uniform(ks[2], (P, 4))

    def gather_fwd(quad, idx, w):
        r = quad[idx].astype(jnp.float32)
        return jnp.sum(
            r[:, :24] * w[:, :1] + r[:, 24:48] * w[:, 1:2]
            + r[:, 48:72] * w[:, 2:3] + r[:, 72:] * w[:, 3:4]
        )

    timed("gather fwd (1 plane)", jax.jit(gather_fwd), (quad, idx, w))
    timed("gather fwd+bwd (scatter vjp)",
          jax.jit(lambda q, i, w: jnp.sum(jnp.abs(jax.grad(gather_fwd)(q, i, w)))),
          (quad, idx, w))

    feats = [jax.random.normal(k, (P, 24), jnp.float32) for k in jax.random.split(ks[3], 6)]

    def chain24(*fs):
        out = fs[0]
        for f in fs[1:]:
            out = out * f
        return jnp.sum(out)

    timed("chain (P,24) fwd+bwd",
          jax.jit(lambda *fs: sum(jnp.sum(jnp.abs(g)) for g in jax.grad(chain24, argnums=tuple(range(6)))(*fs))),
          tuple(feats))

    feats_packed = [f.reshape(P // 16, 16 * 24) for f in feats]
    timed("chain packed (P/16,384) fwd+bwd",
          jax.jit(lambda *fs: sum(jnp.sum(jnp.abs(g)) for g in jax.grad(chain24, argnums=tuple(range(6)))(*fs))),
          tuple(feats_packed))

    from nvfi_tpu.fields import velocity as vel_mod

    vparams = vel_mod.init_velocity_params(ks[4])
    xt = jax.random.uniform(ks[5], (P, 4))

    def vel_loss(vp, xt):
        return jnp.sum(vel_mod.get_vel(vp, xt))

    timed("vel MLP f32 fwd+bwd",
          jax.jit(lambda vp, xt: jnp.sum(jnp.abs(jax.grad(vel_loss)(vp, xt)["weight_net"][0]["w"]))),
          (vparams, xt))
    vparams_bf = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vparams)
    timed("vel MLP bf16 fwd+bwd",
          jax.jit(lambda vp, xt: jnp.sum(jnp.abs(jax.grad(
              lambda p, x: jnp.sum(vel_mod.get_vel(p, x.astype(jnp.bfloat16)).astype(jnp.float32))
          )(vp, xt)["weight_net"][0]["w"].astype(jnp.float32)))),
          (vparams_bf, xt))

    sig = jax.random.uniform(ks[6], (256, 686))
    dist = jnp.full((256, 686), 0.01)

    from nvfi_tpu.ops.compositing import raw2alpha

    def comp(s, d):
        a, wgt, bg = raw2alpha(s, d)
        return jnp.sum(wgt)

    timed("raw2alpha fwd+bwd (256,686)",
          jax.jit(lambda s, d: jnp.sum(jnp.abs(jax.grad(comp)(s, d)))), (sig, dist))

    score = jax.random.uniform(ks[7], (P,))
    K = 43904
    timed("argsort top-K", jax.jit(lambda s: jnp.sum(jnp.argsort(-s)[:K])), (score,))
    timed("lax.top_k", jax.jit(lambda s: jnp.sum(jax.lax.top_k(s, K)[1])), (score,))
    timed("approx_max_k",
          jax.jit(lambda s: jnp.sum(jax.lax.approx_max_k(s, K)[1])), (score,))


if __name__ == "__main__":
    main()
