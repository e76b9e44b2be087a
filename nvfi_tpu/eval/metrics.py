"""Image quality metrics: MSE / PSNR / SSIM / LPIPS.

Port of reference utils/metrics.py with the same protocols:

* PSNR = 10 * log10(1 / mse) on [0,1] images (reference :25-28).
* SSIM: 11-tap Gaussian window (sigma 1.5), per-image mean, VALID padding —
  the reference's conv2d-based SSIM (reference :32-99) implemented in numpy.
* LPIPS (VGG) requires torch + the lpips package; it is gated — ``estim_error``
  computes it only when available, since the TPU framework itself must not
  depend on torch (reference :103-122 uses lpips.LPIPS(net='vgg')).
"""

from __future__ import annotations

import math

import numpy as np


def mse(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(np.mean((np.asarray(pred) - np.asarray(gt)) ** 2))


def mse2psnr(v: float) -> float:
    """Scalar convenience (reference utils/metrics.py:11-15)."""
    if v == 0:
        v = 1e-5
    return -10.0 * math.log10(v)


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    return 10.0 * math.log10(1.0 / max(mse(pred, gt), 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def ssim(pred: np.ndarray, gt: np.ndarray, w_size: int = 11) -> float:
    """Gaussian-window SSIM on a single (H, W, C) image pair in [0, 1]."""
    from scipy.signal import convolve2d

    img0 = np.asarray(pred, dtype=np.float64)
    img1 = np.asarray(gt, dtype=np.float64)
    if img0.ndim == 2:
        img0, img1 = img0[..., None], img1[..., None]
    filt = _gaussian_kernel(w_size)

    def blur(z):
        return np.stack(
            [
                convolve2d(convolve2d(z[..., c], filt[:, None], mode="valid"), filt[None, :], mode="valid")
                for c in range(z.shape[-1])
            ],
            axis=-1,
        )

    mu0, mu1 = blur(img0), blur(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = np.maximum(blur(img0 * img0) - mu00, 0)
    s11 = np.maximum(blur(img1 * img1) - mu11, 0)
    s01 = blur(img0 * img1) - mu01
    s01 = np.sign(s01) * np.minimum(np.sqrt(s00 * s11), np.abs(s01))
    c1, c2 = 0.01**2, 0.03**2
    num = (2 * mu01 + c1) * (2 * s01 + c2)
    den = (mu00 + mu11 + c1) * (s00 + s11 + c2)
    return float(np.mean(num / den))


_LPIPS_MODEL = None


def lpips_available() -> bool:
    """True when either the vendored JAX LPIPS has calibrated weights (see
    eval/lpips.py) or the torch ``lpips`` package is importable."""
    from . import lpips as jlpips

    if jlpips.available():
        return True
    try:
        import lpips  # noqa: F401
        import torch  # noqa: F401

        return True
    except Exception:
        return False


def lpips(pred: np.ndarray, gt: np.ndarray) -> float:
    """VGG-LPIPS on a single (H, W, 3) pair in [0,1].

    Prefers the vendored JAX implementation with calibrated weights
    (NVFI_LPIPS_WEIGHTS / assets/lpips_vgg.npz); falls back to the torch
    ``lpips`` package when installed (used as an oracle in tests)."""
    from . import lpips as jlpips

    if jlpips.available():
        return jlpips.lpips(pred, gt)
    global _LPIPS_MODEL
    import torch
    import lpips as lpips_pkg

    if _LPIPS_MODEL is None:
        _LPIPS_MODEL = lpips_pkg.LPIPS(net="vgg").eval()
    a = torch.tensor(pred, dtype=torch.float32).permute(2, 0, 1)[None] * 2 - 1
    b = torch.tensor(gt, dtype=torch.float32).permute(2, 0, 1)[None] * 2 - 1
    with torch.no_grad():
        return float(_LPIPS_MODEL(a, b).mean())


def estim_error(estim: np.ndarray, gt: np.ndarray) -> dict:
    """Batch metric dict over (N, H, W, 3) stacks (reference :141-152)."""
    estim = np.asarray(estim, dtype=np.float32)
    gt = np.asarray(gt, dtype=np.float32)
    out = {
        "mse": mse(estim, gt),
        "psnr": psnr(estim, gt),
        "ssim": float(np.mean([ssim(estim[i], gt[i]) for i in range(len(estim))])),
    }
    if lpips_available():
        out["lpips"] = float(np.mean([lpips(estim[i], gt[i]) for i in range(len(estim))]))
    return out


def save_error(errors: dict, save_dir: str, ext: str = ""):
    import os

    with open(os.path.join(save_dir, f"metrics{ext}.txt"), "w") as f:
        f.write(str(errors))
