"""Minimal functional MLP building blocks (params are plain pytrees).

Initialization mirrors torch.nn.Linear defaults (kaiming-uniform weights,
uniform bias in +-1/sqrt(fan_in)) so training dynamics match the reference's
modules without importing torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    """torch.nn.Linear default init: W ~ kaiming_uniform(a=sqrt(5)) which for a
    Linear reduces to U(-1/sqrt(in), 1/sqrt(in)); b ~ U(-1/sqrt(in), 1/sqrt(in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def linear(p, x):
    w = p["w"]
    # mixed precision: follow the (possibly bf16-cast) weight dtype so the
    # matmul lands on the MXU in bf16 when the caller casts params
    y = jnp.dot(x.astype(w.dtype), w)
    if "b" in p:
        y = y + p["b"]
    return y


def mlp_init(key, dims, bias=True, dtype=jnp.float32):
    """Init a stack of Linear layers with the given [in, h1, ..., out] dims."""
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_init(k, dims[i], dims[i + 1], bias, dtype) for i, k in enumerate(keys)]


def mlp_apply(layers, x, act, final_act=None):
    for i, p in enumerate(layers):
        x = linear(p, x)
        if i < len(layers) - 1:
            x = act(x)
        elif final_act is not None:
            x = final_act(x)
    return x
