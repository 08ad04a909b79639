"""Multi-device sharding equivalence on the 8-device virtual CPU mesh:
the sharded pipeline must reproduce the single-device pipeline exactly
(halo exchange + all-to-all resharding are pure data movement)."""

import numpy as np
import jax
import pytest

from conftest import make_blob_volume
from flowdenoising_tpu.config import Boundary, FilterConfig, FlowConfig
from flowdenoising_tpu.core.pipeline import denoise, gaussian_denoise
from flowdenoising_tpu.parallel.mesh import (
    denoise_sharded, make_mesh, usable_device_count)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_usable_device_count():
    assert usable_device_count((16, 24, 16), 2, 8) == 8
    assert usable_device_count((12, 24, 16), 2, 8) == 4
    assert usable_device_count((7, 11, 13), 2, 8) == 1
    # halo must fit in the local shard
    assert usable_device_count((16, 16, 16), 3, 8) == 4


@pytest.mark.parametrize("boundary", [Boundary.WRAP, Boundary.MEAN, Boundary.REPLICATE])
def test_sharded_gaussian_matches_single(boundary):
    vol = make_blob_volume(16, 24, 16, seed=7)
    cfg = FilterConfig(sigma=(0.5, 0.5, 0.5), boundary=boundary, use_flow=False)
    single = np.asarray(gaussian_denoise(vol, cfg.sigma, boundary))
    sharded = np.asarray(denoise_sharded(vol, cfg, n_devices=8))
    # MEAN boundary: the sharded global mean reduces in a different order
    # (psum of shard partials), so allow f32 reduction noise on ~500-range data.
    np.testing.assert_allclose(sharded, single, atol=2e-3)


@pytest.mark.parametrize("boundary", [Boundary.WRAP, Boundary.MEAN])
def test_sharded_of_denoise_matches_single(boundary):
    vol = make_blob_volume(16, 24, 16, seed=8)
    cfg = FilterConfig(sigma=(0.5, 0.5, 0.5), boundary=boundary,
                       flow=FlowConfig(levels=0, winsize=5))
    single = np.asarray(denoise(vol, cfg))
    sharded = np.asarray(denoise_sharded(vol, cfg, n_devices=8))
    err = np.abs(sharded - single)
    assert err.max() < 5e-3, err.max()


def test_sharded_falls_back_on_indivisible_volume():
    vol = make_blob_volume(10, 24, 16, seed=9)  # Z=10 not divisible by 8
    cfg = FilterConfig(sigma=(0.5, 0.5, 0.5), use_flow=False)
    single = np.asarray(gaussian_denoise(vol, cfg.sigma, cfg.boundary))
    sharded = np.asarray(denoise_sharded(vol, cfg, n_devices=8))
    np.testing.assert_allclose(sharded, single, atol=2e-4)
