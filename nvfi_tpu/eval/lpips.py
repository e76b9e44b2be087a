"""LPIPS (VGG) perceptual metric — JAX implementation of the reference's
``lpips.LPIPS(net='vgg')`` protocol (reference utils/metrics.py:103-122).

Architecture (faithful to the lpips package, v0.1):

* inputs in [-1, 1], normalized by the fixed ImageNet shift/scale constants;
* VGG16 feature maps tapped after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3;
* per-layer: channel-unit-normalize both feature stacks, squared difference,
  1x1 "lin" conv to a single channel, spatial mean;
* LPIPS = sum over the five layers.

This image has no network egress and ships neither torchvision VGG16 weights
nor the lpips package, so **calibrated weights must be provided by the user**:

* ``NVFI_LPIPS_WEIGHTS=/path/to/lpips_vgg.npz`` (or default
  ``assets/lpips_vgg.npz``) — an npz produced by :func:`export_torch_lpips`
  from a machine where ``pip install lpips`` works;
* when absent, :func:`available` is False and ``estim_error`` reports the
  3-metric protocol (documented in BASELINE.md).

The forward math is golden-tested against an independent numpy reference with
random weights (tests/test_lpips.py), so only the calibration — not the
architecture — depends on the external file.
"""

from __future__ import annotations

import os

import numpy as np

# VGG16 convolutional config: channel widths per conv layer, with maxpool
# boundaries after each block.  Taps = last relu of each block.
_VGG_BLOCKS = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))

# lpips ScalingLayer constants (lpips/lpips.py v0.1)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets", "lpips_vgg.npz",
)


def weights_path() -> str | None:
    p = os.environ.get("NVFI_LPIPS_WEIGHTS", DEFAULT_WEIGHTS)
    return p if os.path.isfile(p) else None


def available() -> bool:
    return weights_path() is not None


def init_random_weights(seed: int = 0) -> dict:
    """He-initialized weights with the exact LPIPS-VGG structure.

    Used by tests to validate the forward math; NOT a calibrated metric.
    """
    rng = np.random.RandomState(seed)
    w = {}
    cin = 3
    li = 0
    for block in _VGG_BLOCKS:
        for cout in block:
            std = np.sqrt(2.0 / (9 * cin))
            w[f"conv{li}_w"] = rng.randn(3, 3, cin, cout).astype(np.float32) * std
            w[f"conv{li}_b"] = np.zeros(cout, np.float32)
            cin = cout
            li += 1
        w[f"lin{len([k for k in w if k.startswith('lin')])}_w"] = np.abs(
            rng.randn(cin).astype(np.float32) * 0.1
        )
    return w


def export_torch_lpips(out_path: str):
    """Convert an installed ``lpips`` package's VGG model to our npz format.

    Run wherever ``pip install lpips torchvision`` works:
        python -c "from nvfi_tpu.eval.lpips import export_torch_lpips; \\
                   export_torch_lpips('assets/lpips_vgg.npz')"
    """
    import lpips as lpips_pkg  # noqa: F401
    import torch

    model = lpips_pkg.LPIPS(net="vgg").eval()
    w = {}
    li = 0
    for mod in model.net.slice1 + model.net.slice2 + model.net.slice3 \
            + model.net.slice4 + model.net.slice5:
        if isinstance(mod, torch.nn.Conv2d):
            # torch OIHW -> our HWIO
            w[f"conv{li}_w"] = mod.weight.detach().numpy().transpose(2, 3, 1, 0)
            w[f"conv{li}_b"] = mod.bias.detach().numpy()
            li += 1
    for i, lin in enumerate(model.lins):
        w[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy().reshape(-1)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **w)


_CACHE: dict = {}


def load_weights(path: str | None = None) -> dict:
    path = path or weights_path()
    if path not in _CACHE:
        with np.load(path) as z:
            _CACHE[path] = {k: z[k] for k in z.files}
    return _CACHE[path]


def _forward_taps(weights: dict, x):
    """x: (N, H, W, 3) in [-1, 1] -> list of 5 tapped feature maps (NHWC)."""
    import jax
    import jax.numpy as jnp

    x = (x - _SHIFT) / _SCALE
    taps = []
    li = 0
    for block in _VGG_BLOCKS:
        for _ in block:
            x = jax.lax.conv_general_dilated(
                x, jnp.asarray(weights[f"conv{li}_w"]),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(weights[f"conv{li}_b"])
            x = jax.nn.relu(x)
            li += 1
        taps.append(x)
        # 2x2 max-pool stride 2 between blocks (not after the last tap)
        if len(taps) < len(_VGG_BLOCKS):
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return taps


def lpips_pair(weights: dict, img0, img1) -> float:
    """LPIPS between two (H, W, 3) images in [0, 1]."""
    import jax.numpy as jnp

    a = jnp.asarray(img0, jnp.float32)[None] * 2.0 - 1.0
    b = jnp.asarray(img1, jnp.float32)[None] * 2.0 - 1.0
    taps0 = _forward_taps(weights, a)
    taps1 = _forward_taps(weights, b)
    total = 0.0
    for i, (f0, f1) in enumerate(zip(taps0, taps1)):
        n0 = f0 / jnp.sqrt(jnp.sum(f0**2, axis=-1, keepdims=True) + 1e-10)
        n1 = f1 / jnp.sqrt(jnp.sum(f1**2, axis=-1, keepdims=True) + 1e-10)
        d = (n0 - n1) ** 2
        lin = jnp.asarray(weights[f"lin{i}_w"])
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    return float(total)


def lpips(img0, img1) -> float:
    """Calibrated LPIPS; raises if no weights file is available."""
    return lpips_pair(load_weights(), img0, img1)
