"""Farneback optical-flow parity vs cv2.calcOpticalFlowFarneback.

The JAX implementation runs in float32 with exact bilinear interpolation,
while OpenCV mixes float/double accumulation; agreement is validated to
tight-but-not-bitwise tolerances at the reference's parameter points.
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from flowdenoising_tpu.config import FlowConfig
from flowdenoising_tpu.ops.farneback import farneback_flow
from conftest import make_blob_image


def _pair(h=64, w=64, seed=0, dy=1, dx=-1):
    base = make_blob_image(h, w, seed=seed)
    img0 = base[4:4 + h, 4:4 + w].copy()
    img1 = base[4 + dy:4 + dy + h, 4 + dx:4 + dx + w].copy()
    return img0, img1


@pytest.mark.parametrize("levels,winsize", [(0, 5), (1, 5), (3, 5), (3, 15)])
def test_matches_cv2_fresh_flow(levels, winsize):
    img0, img1 = _pair()
    f_cv = cv2.calcOpticalFlowFarneback(
        prev=img0, next=img1, flow=None, pyr_scale=0.5, levels=levels,
        winsize=winsize, iterations=3, poly_n=5, poly_sigma=1.2, flags=0)
    cfg = FlowConfig(levels=levels, winsize=winsize, use_initial_flow=False)
    f_j = np.asarray(farneback_flow(jnp.asarray(img1), jnp.asarray(img0), cfg))
    err = np.abs(f_cv - f_j)
    assert err.mean() < 1e-5, f"mean {err.mean()}"
    assert err.max() < 1e-3, f"max {err.max()}"


def test_matches_cv2_seeded_flow():
    img0, img1 = _pair(seed=2)
    seed_flow = np.zeros(img0.shape + (2,), np.float32)
    f_cv = cv2.calcOpticalFlowFarneback(
        prev=img0, next=img1, flow=seed_flow.copy(), pyr_scale=0.5, levels=3,
        winsize=5, iterations=3, poly_n=5, poly_sigma=1.2,
        flags=cv2.OPTFLOW_USE_INITIAL_FLOW)
    cfg = FlowConfig(levels=3, winsize=5, use_initial_flow=True)
    f_j = np.asarray(farneback_flow(jnp.asarray(img1), jnp.asarray(img0), cfg,
                                    initial_flow=jnp.asarray(seed_flow)))
    err = np.abs(f_cv - f_j)
    assert err.mean() < 1e-5
    assert err.max() < 1e-3


def test_seeded_with_nonzero_prior():
    img0, img1 = _pair(seed=3, dy=2, dx=0)
    prior = np.zeros(img0.shape + (2,), np.float32)
    prior[..., 1] = -2.0
    f_cv = cv2.calcOpticalFlowFarneback(
        prev=img0, next=img1, flow=prior.copy(), pyr_scale=0.5, levels=3,
        winsize=5, iterations=3, poly_n=5, poly_sigma=1.2,
        flags=cv2.OPTFLOW_USE_INITIAL_FLOW)
    cfg = FlowConfig(levels=3, winsize=5, use_initial_flow=True)
    f_j = np.asarray(farneback_flow(jnp.asarray(img1), jnp.asarray(img0), cfg,
                                    initial_flow=jnp.asarray(prior)))
    err = np.abs(f_cv - f_j)
    assert err.mean() < 2e-5
    assert err.max() < 2e-3


@pytest.mark.slow
def test_batched_matches_single():
    img0a, img1a = _pair(seed=4)
    img0b, img1b = _pair(seed=5, dy=0, dx=2)
    cfg = FlowConfig(levels=1, winsize=5, use_initial_flow=False)
    batch_t = jnp.stack([jnp.asarray(img0a), jnp.asarray(img0b)])
    batch_r = jnp.stack([jnp.asarray(img1a), jnp.asarray(img1b)])
    fb = np.asarray(farneback_flow(batch_r, batch_t, cfg))
    fa = np.asarray(farneback_flow(jnp.asarray(img1a), jnp.asarray(img0a), cfg))
    np.testing.assert_allclose(fb[0], fa, atol=2e-4)


def test_recovers_known_shift():
    img0, img1 = _pair(seed=6, dy=1, dx=1)
    cfg = FlowConfig(levels=3, winsize=15, use_initial_flow=False)
    f = np.asarray(farneback_flow(jnp.asarray(img1), jnp.asarray(img0), cfg))
    # img1 crops one pixel further down-right, so content appears shifted
    # up-left: the flow img0 -> img1 should approach (-1, -1)
    inner = f[16:-16, 16:-16]
    assert abs(inner[..., 0].mean() + 1.0) < 0.25
    assert abs(inner[..., 1].mean() + 1.0) < 0.25
