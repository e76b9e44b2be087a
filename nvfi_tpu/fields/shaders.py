"""Appearance shaders and density decoders.

Functional re-design of the reference shading modules:

* MLP shaders (reference models/tensorf_base.py:33-130): ``MLP_PE`` (features +
  viewdir + position + their positional encodings), ``MLP_Fea`` (features +
  viewdir + encodings of both), ``MLP`` (features + viewdir + viewdir PE); all
  three are 3-layer 128-wide ReLU MLPs with sigmoid output and zero-initialized
  final bias.
* analytic shaders (reference models/tensorf_model_utils.py:292-358): SH
  (degree-2 spherical harmonics), RGB (sigmoid), RGBIdentity (abs(x+0.5)),
  RGBtLinear (per-channel linear-in-t basis).
* density decoders (reference models/tensorf_model_utils.py:361-414): Density
  (passthrough), DensityLinear (linear-in-t).

The Fourier time-basis modes (RGBtFourier / DensityFourier) are dead in the
reference — they read the never-assigned ``frames_per_keyframe`` (reference
models/tensorf_keyframe.py:51,60) — and are deliberately not replicated
(SURVEY.md §2.3).

``make_shader(mode, ...)`` returns a pure ``apply(params, pts, viewdirs,
features, aux) -> rgb`` closure; static hyperparameters (PE band counts) are
baked into the closure rather than stored in the trainable param pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.encoding import positional_encoding
from .mlp import mlp_init, mlp_apply
from .sh import eval_sh_bases

MLP_SHADERS = ("MLP_PE", "MLP_Fea", "MLP")

DENSITY_DATA_DIM = {"Density": 1, "DensityLinear": 2}


def shader_in_dim(mode: str, app_dim: int, view_pe: int, pos_pe: int, fea_pe: int) -> int:
    if mode == "MLP_PE":
        return (3 + 2 * view_pe * 3) + (3 + 2 * pos_pe * 3) + app_dim
    if mode == "MLP_Fea":
        return 2 * view_pe * 3 + 2 * fea_pe * app_dim + 3 + app_dim
    if mode == "MLP":
        return (3 + 2 * view_pe * 3) + app_dim
    raise ValueError(mode)


def init_shader(key, mode: str, app_dim: int, view_pe: int = 6, pos_pe: int = 6,
                fea_pe: int = 6, feature_c: int = 128):
    """Shader trainable params: MLP layer list, or None for analytic shaders."""
    if mode in MLP_SHADERS:
        in_dim = shader_in_dim(mode, app_dim, view_pe, pos_pe, fea_pe)
        layers = mlp_init(key, [in_dim, feature_c, feature_c, 3])
        layers[-1]["b"] = jnp.zeros_like(layers[-1]["b"])  # reference zero-inits final bias
        return layers
    if mode in ("SH", "RGB", "RGBIdentity", "RGBtLinear"):
        return None
    raise ValueError(f"unknown shadingMode {mode}")


def make_shader(mode: str, view_pe: int = 6, pos_pe: int = 6, fea_pe: int = 6):
    """Build the pure shading function for ``mode``."""

    if mode == "MLP_PE":

        def apply(params, pts, viewdirs, features, aux=None):
            indata = [features, viewdirs, pts]
            if pos_pe > 0:
                indata.append(positional_encoding(pts, pos_pe))
            if view_pe > 0:
                indata.append(positional_encoding(viewdirs, view_pe))
            x = jnp.concatenate(indata, axis=-1)
            return jax.nn.sigmoid(mlp_apply(params, x, jax.nn.relu))

    elif mode == "MLP_Fea":

        def apply(params, pts, viewdirs, features, aux=None):
            indata = [features, viewdirs]
            if fea_pe > 0:
                indata.append(positional_encoding(features, fea_pe))
            if view_pe > 0:
                indata.append(positional_encoding(viewdirs, view_pe))
            x = jnp.concatenate(indata, axis=-1)
            return jax.nn.sigmoid(mlp_apply(params, x, jax.nn.relu))

    elif mode == "MLP":

        def apply(params, pts, viewdirs, features, aux=None):
            indata = [features, viewdirs]
            if view_pe > 0:
                indata.append(positional_encoding(viewdirs, view_pe))
            x = jnp.concatenate(indata, axis=-1)
            return jax.nn.sigmoid(mlp_apply(params, x, jax.nn.relu))

    elif mode == "SH":

        def apply(params, pts, viewdirs, features, aux=None):
            sh_mult = eval_sh_bases(2, viewdirs)[..., None, :]
            rgb_sh = features.reshape(*features.shape[:-1], 3, sh_mult.shape[-1])
            return jax.nn.relu(jnp.sum(sh_mult * rgb_sh, axis=-1) + 0.5)

    elif mode == "RGB":

        def apply(params, pts, viewdirs, features, aux=None):
            return jax.nn.sigmoid(features)

    elif mode == "RGBIdentity":

        def apply(params, pts, viewdirs, features, aux=None):
            return jnp.abs(features + 0.5)

    elif mode == "RGBtLinear":

        def apply(params, pts, viewdirs, features, aux):
            coeffs = features.reshape(*features.shape[:-1], 3, 2)
            t = aux["times"][..., None]
            basis = jnp.concatenate([jnp.ones_like(t), t], axis=-1)
            return jax.nn.relu(jnp.sum(basis[..., None, :] * coeffs, axis=-1) + 0.5)

    else:
        raise ValueError(f"unknown shadingMode {mode}")

    return apply


def make_density_decoder(mode: str):
    """Density-feature decoder for ``densityMode`` (reference :361-414)."""
    if mode == "Density":

        def decode(features, aux=None):
            return features[..., 0]

    elif mode == "DensityLinear":

        def decode(features, aux):
            coeffs = features.reshape(*features.shape[:-1], 1, 2)
            t = aux["times"][..., None]
            basis = jnp.concatenate([jnp.ones_like(t), t], axis=-1)
            return jnp.sum(basis[..., None, :] * coeffs, axis=-1)[..., 0]

    else:
        raise ValueError(f"unknown densityMode {mode}")

    return decode
