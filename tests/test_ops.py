"""Unit tests for the resize/blur building blocks vs their cv2 counterparts."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from flowdenoising_tpu.ops.blur import gaussian_blur, opencv_gaussian_taps, box_blur
from flowdenoising_tpu.ops.resize import (
    resize_linear, resize_area, pyramid_sizes, cv_round)
from conftest import make_blob_image


def test_opencv_gaussian_taps_match_cv2():
    for ksize, sigma in [(3, 0.0), (3, 0.5), (5, 0.0), (9, 1.5), (19, 3.5), (7, 0.0)]:
        ours = opencv_gaussian_taps(ksize, sigma)
        ref = cv2.getGaussianKernel(ksize, sigma).ravel()
        np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_gaussian_blur_matches_cv2():
    img = make_blob_image(40, 44, seed=20).astype(np.float32)[:40, :44]
    for ksize, sigma in [(3, 0.0), (9, 1.5)]:
        ours = np.asarray(gaussian_blur(jnp.asarray(img), ksize, sigma))
        ref = cv2.GaussianBlur(img, (ksize, ksize), sigma)
        np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_resize_linear_matches_cv2_downsample():
    img = make_blob_image(64, 64, seed=21).astype(np.float32)[:64, :64]
    for out_hw in [(32, 32), (16, 16), (33, 17)]:
        ours = np.asarray(resize_linear(jnp.asarray(img), out_hw))
        ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours, ref, atol=2e-2)


def test_resize_linear_matches_cv2_upsample():
    img = make_blob_image(16, 16, seed=22).astype(np.float32)[:16, :16]
    ours = np.asarray(resize_linear(jnp.asarray(img), (32, 32)))
    ref = cv2.resize(img, (32, 32), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=2e-2)


def test_resize_area_matches_cv2():
    img = make_blob_image(64, 64, seed=23).astype(np.float32)[:64, :64]
    for out_hw in [(32, 32), (16, 16), (21, 13)]:
        ours = np.asarray(resize_area(jnp.asarray(img), out_hw))
        ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_AREA)
        np.testing.assert_allclose(ours, ref, atol=2e-2)


def test_pyramid_sizes():
    assert pyramid_sizes(64, 64, 2, 0.5) == [(64, 64), (32, 32), (16, 16)]
    assert pyramid_sizes(100, 50, 1, 0.5) == [(100, 50), (50, 25)]
    assert cv_round(2.5) == 2 and cv_round(3.5) == 4  # half-to-even


def test_clamped_levels():
    from flowdenoising_tpu.config import FlowConfig
    cfg = FlowConfig(levels=3)
    assert cfg.clamped_levels(64, 64) == 1     # 32 ok, 16 < 32
    assert cfg.clamped_levels(256, 256) == 3
    assert cfg.clamped_levels(16, 16) == 0
