"""Composed-flow tap mode (FlowConfig.tap_mode "compose").

The compose modes replace the reference's per-tap Farneback solves
(flowdenoising.py:310-324) with adjacent-pair solves chained by flow-field
composition.  Adjacent taps are exact (same solve); farther taps are
approximations, so tests assert (a) exact equivalence when the kernel has
only adjacent taps, and (b) tight agreement of the final denoised volume
otherwise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import make_blob_volume
from flowdenoising_tpu.config import Boundary, FilterConfig, FlowConfig
from flowdenoising_tpu.core.axis_filter import of_pass
from flowdenoising_tpu.core.pipeline import denoise


def _psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    rng = float(a.max() - a.min())
    return 10 * np.log10(rng * rng / mse) if mse > 0 else np.inf


def _cfg(tap_mode, sigma=1.0, levels=1):
    return FilterConfig(
        sigma=(sigma,) * 3, boundary=Boundary.WRAP,
        flow=FlowConfig(levels=levels, winsize=5, use_initial_flow=True,
                        tap_mode=tap_mode))


@pytest.mark.slow
def test_adjacent_only_kernel_is_exact():
    # sigma small enough that the Gaussian kernel has ks2 == 1: every tap is
    # adjacent, where composition degenerates to the very same solve.
    from flowdenoising_tpu.kernels import get_gaussian_kernel
    taps = get_gaussian_kernel(0.3)
    assert len(taps) // 2 == 1, len(taps)
    vol = jnp.asarray(make_blob_volume(8, 32, 32, seed=0))
    flow_cfg = FlowConfig(levels=0, winsize=5, use_initial_flow=True)
    ref = np.asarray(of_pass(vol, taps, flow_cfg))
    flow_cfg_c = FlowConfig(levels=0, winsize=5, use_initial_flow=True,
                            tap_mode="compose")
    out = np.asarray(of_pass(vol, taps, flow_cfg_c))
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.slow
def test_composed_close_to_solve():
    vol = make_blob_volume(12, 40, 40, seed=3, drift=0.5)
    ref = np.asarray(denoise(vol, _cfg("solve")))
    out = np.asarray(denoise(vol, _cfg("compose")))
    assert np.isfinite(out).all()
    p = _psnr(ref, out)
    # Composed flows track the solved flows closely on smooth drift.
    assert p > 35, p


def test_compose_refine_removed():
    # v0.5.0 removed the compose_refine mode on round-4 ladder evidence
    # (at-or-below plain compose on every tier at ~2x cost); the config
    # rejects it with a clear pointer instead of silently running it.
    with pytest.raises(ValueError, match="compose_refine"):
        FlowConfig(tap_mode="compose_refine")


def test_composed_denoises():
    # The composed pipeline must actually denoise: output closer to the
    # clean drifting structure than the noisy input is.  Noise is set well
    # above the filter's structure-blur floor (~200 MSE on this volume for
    # solve mode too) so the comparison measures noise removal.
    clean = make_blob_volume(10, 36, 36, seed=7, drift=0.4)
    noisy = clean + np.random.default_rng(0).normal(
        scale=25.0, size=clean.shape).astype(np.float32)
    out = np.asarray(denoise(noisy, _cfg("compose")))
    err_out = float(((out - clean) ** 2).mean())
    err_in = float(((noisy - clean) ** 2).mean())
    assert err_out < 0.5 * err_in, (err_out, err_in)


@pytest.mark.slow
def test_symmetric_adjacent_close():
    # Negated-forward backward links stay close to the two-solve compose
    # output in the small-motion regime.
    vol = make_blob_volume(10, 36, 36, seed=9, drift=0.4)
    base = np.asarray(denoise(vol, _cfg("compose")))
    cfg = FilterConfig(
        sigma=(1.0,) * 3, boundary=Boundary.WRAP,
        flow=FlowConfig(levels=1, winsize=5, use_initial_flow=True,
                        tap_mode="compose", symmetric_adjacent=True))
    out = np.asarray(denoise(vol, cfg))
    assert np.isfinite(out).all()
    p = _psnr(base, out)
    assert p > 35, p
