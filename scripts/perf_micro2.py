#!/usr/bin/env python
"""Micro-benchmarks round 2: gather/scatter scaling laws on the v5e.

Questions:
  * is plane gather/scatter cost per-INDEX or per-BYTE? (row widths 24/96/288)
  * does f32 vs bf16 row dtype matter?
  * do coherent (ray-sorted) indices beat random ones?
  * are the tiny time-plane scatters cheap?
  * does Mosaic/Pallas support a vectorized dynamic row-gather from VMEM now?
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
    print(f"{name:>36s}: {dt * 1e3:8.2f} ms  (compile {tc:4.1f}s)", flush=True)
    return dt


def gather_loss(table, idx, w):
    r = table[idx].astype(jnp.float32)
    return jnp.sum(r * w[:, None])


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    idx_rand = jax.random.randint(ks[1], (P,), 0, HW)
    # ray-coherent indices: 256 rays x 686 samples walking ~diagonally
    base = np.random.RandomState(0).randint(0, 197, (256, 1))
    walk = (np.linspace(0, 150, 686)[None, :]).astype(np.int64)
    idx_coh = jnp.asarray(((base + walk) % 197 * 198 + (base + walk // 2) % 197).reshape(-1))
    w = jax.random.uniform(ks[2], (P,))

    for C in (24, 96, 288):
        tab = jax.random.normal(ks[0], (HW, C), jnp.bfloat16)
        timed(f"gather fwd bf16 C={C}", jax.jit(gather_loss), (tab, idx_rand, w))
        timed(f"gather+scatter bf16 C={C}",
              jax.jit(lambda t, i, w: jnp.sum(jnp.abs(jax.grad(gather_loss)(t, i, w)))),
              (tab, idx_rand, w))

    tab96f = jax.random.normal(ks[0], (HW, 96), jnp.float32)
    timed("gather+scatter f32 C=96",
          jax.jit(lambda t, i, w: jnp.sum(jnp.abs(jax.grad(gather_loss)(t, i, w)))),
          (tab96f, idx_rand, w))

    tab96 = jax.random.normal(ks[0], (HW, 96), jnp.bfloat16)
    timed("gather+scatter bf16 C=96 coherent",
          jax.jit(lambda t, i, w: jnp.sum(jnp.abs(jax.grad(gather_loss)(t, i, w)))),
          (tab96, idx_coh, w))

    tiny = jax.random.normal(ks[3], (15 * 198, 96), jnp.bfloat16)
    idx_t = jax.random.randint(ks[4], (P,), 0, 15 * 198)
    timed("gather+scatter bf16 timeplane",
          jax.jit(lambda t, i, w: jnp.sum(jnp.abs(jax.grad(gather_loss)(t, i, w)))),
          (tiny, idx_t, w))

    # ---- Pallas vectorized dynamic row-gather probe (SURVEY §7.1.4) --------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def probe(kernel_body, label):
        try:
            fn = pl.pallas_call(
                kernel_body,
                out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            out = jax.jit(fn)(
                jnp.arange(1024, dtype=jnp.int32) % 512,
                jnp.ones((512, 128), jnp.float32),
            )
            print(f"[pallas] {label}: OK, sum={float(out.sum())}", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:160]
            print(f"[pallas] {label}: UNSUPPORTED ({type(e).__name__}: {msg})",
                  flush=True)

    def k_direct(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:], :]

    def k_take(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    probe(k_direct, "ref[vec_idx, :] row-gather")
    probe(k_take, "jnp.take(axis=0) row-gather")


if __name__ == "__main__":
    main()
