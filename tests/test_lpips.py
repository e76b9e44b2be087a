"""LPIPS forward-math golden tests (architecture-level, random weights).

The image ships no calibrated VGG weights (zero egress), so these tests
validate the vendored implementation's *math* against an independent numpy
reference: conv padding/strides, tap placement, max-pool boundaries, channel
unit-normalization, lin heads, spatial mean, layer sum.  Calibration enters
only through the weights file (eval/lpips.py docstring).
"""

import numpy as np
import pytest

from nvfi_tpu.eval import lpips as L


def _np_conv3x3(x, w, b):
    """NHWC 3x3 same-padding conv, pure numpy (slow, tiny inputs only)."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((n, h, wd, cout), np.float32)
    for dy in range(3):
        for dx in range(3):
            out += np.einsum("nhwc,co->nhwo",
                             xp[:, dy:dy + h, dx:dx + wd, :], w[dy, dx])
    return out + b


def _np_lpips(weights, img0, img1):
    def taps(img):
        x = img[None].astype(np.float32) * 2.0 - 1.0
        x = (x - L._SHIFT) / L._SCALE
        outs = []
        li = 0
        for bi, block in enumerate(L._VGG_BLOCKS):
            for _ in block:
                x = np.maximum(_np_conv3x3(x, weights[f"conv{li}_w"],
                                           weights[f"conv{li}_b"]), 0)
                li += 1
            outs.append(x)
            if bi < len(L._VGG_BLOCKS) - 1:
                n, h, wd, c = x.shape
                x = x[:, : h // 2 * 2, : wd // 2 * 2, :]
                x = x.reshape(n, h // 2, 2, wd // 2, 2, c).max(axis=(2, 4))
        return outs

    t0, t1 = taps(img0), taps(img1)
    total = 0.0
    for i, (f0, f1) in enumerate(zip(t0, t1)):
        n0 = f0 / np.sqrt((f0**2).sum(-1, keepdims=True) + 1e-10)
        n1 = f1 / np.sqrt((f1**2).sum(-1, keepdims=True) + 1e-10)
        total += ((n0 - n1) ** 2 * weights[f"lin{i}_w"]).sum(-1).mean()
    return float(total)


@pytest.fixture(scope="module")
def rw():
    return L.init_random_weights(0)


def test_lpips_matches_numpy_reference(rw):
    rng = np.random.RandomState(1)
    a = rng.rand(32, 32, 3).astype(np.float32)
    b = np.clip(a + rng.randn(32, 32, 3).astype(np.float32) * 0.1, 0, 1)
    got = L.lpips_pair(rw, a, b)
    want = _np_lpips(rw, a, b)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_lpips_identity_and_positivity(rw):
    rng = np.random.RandomState(2)
    a = rng.rand(32, 32, 3).astype(np.float32)
    assert L.lpips_pair(rw, a, a) == pytest.approx(0.0, abs=1e-6)
    b = np.clip(1.0 - a, 0, 1)
    assert L.lpips_pair(rw, a, b) > 0

    # symmetric by construction
    assert L.lpips_pair(rw, a, b) == pytest.approx(L.lpips_pair(rw, b, a), rel=1e-5)


def test_estim_error_reports_lpips_when_weights_present(rw, tmp_path, monkeypatch):
    np.savez(tmp_path / "w.npz", **rw)
    monkeypatch.setenv("NVFI_LPIPS_WEIGHTS", str(tmp_path / "w.npz"))
    from nvfi_tpu.eval.metrics import estim_error

    rng = np.random.RandomState(3)
    a = rng.rand(2, 32, 32, 3).astype(np.float32)
    b = np.clip(a + 0.05 * rng.randn(2, 32, 32, 3).astype(np.float32), 0, 1)
    out = estim_error(a, b)
    assert set(out) >= {"mse", "psnr", "ssim", "lpips"}
    assert np.isfinite(out["lpips"])
