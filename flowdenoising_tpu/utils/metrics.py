"""Volume quality metrics (PSNR / SSIM) for parity evaluation.

The rebuild's acceptance bar is PSNR/SSIM parity of denoised volumes vs the
CPU reference (BASELINE.md); these are the reference implementations used by
tests and the benchmark harness.  SSIM follows Wang et al. 2004 with the
standard 11-tap sigma=1.5 Gaussian window, applied slice-wise and averaged.
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float | None = None) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    if peak is None:
        peak = float(max(a.max() - a.min(), 1e-12))
    return 10.0 * np.log10(peak * peak / mse)


def _gaussian_window(radius: int = 5, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2 * sigma * sigma))
    return g / g.sum()


def _filter2d(img: np.ndarray, g: np.ndarray) -> np.ndarray:
    from numpy.lib.stride_tricks import sliding_window_view
    r = len(g) // 2
    p = np.pad(img, r, mode="symmetric")
    v = sliding_window_view(p, len(g), axis=0)
    out = np.einsum("ijk,k->ij", v[:, : img.shape[1] + 2 * r], g)
    v = sliding_window_view(out, len(g), axis=1)
    return np.einsum("ijk,k->ij", v, g)


def ssim_slice(a: np.ndarray, b: np.ndarray, peak: float) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    g = _gaussian_window()
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    mu_a = _filter2d(a, g)
    mu_b = _filter2d(b, g)
    s_aa = _filter2d(a * a, g) - mu_a * mu_a
    s_bb = _filter2d(b * b, g) - mu_b * mu_b
    s_ab = _filter2d(a * b, g) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * s_ab + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (s_aa + s_bb + c2)
    return float(np.mean(num / den))


def ssim(a: np.ndarray, b: np.ndarray, peak: float | None = None) -> float:
    """Mean slice-wise SSIM over the Z axis of (Z, Y, X) volumes."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if peak is None:
        peak = float(max(a.max() - a.min(), 1e-12))
    if a.ndim == 2:
        return ssim_slice(a, b, peak)
    return float(np.mean([ssim_slice(a[z], b[z], peak) for z in range(a.shape[0])]))
