"""Sharded volume ingest (parallel/ingest.py) on the virtual CPU mesh."""

import numpy as np
import jax

from conftest import make_blob_volume
from flowdenoising_tpu.config import Boundary, FilterConfig
from flowdenoising_tpu.core.pipeline import gaussian_denoise
from flowdenoising_tpu.io.mrc import write_mrc
from flowdenoising_tpu.parallel.ingest import load_sharded, local_z_range
from flowdenoising_tpu.parallel.mesh import denoise_sharded, make_mesh


def test_local_z_range_covers_all():
    mesh = make_mesh(8)
    lo, hi = local_z_range(16, mesh)
    # single-process: this host owns everything
    assert (lo, hi) == (0, 16)


def test_load_sharded_roundtrip(tmp_path):
    vol = make_blob_volume(16, 24, 16, seed=1)
    p = tmp_path / "v.mrc"
    write_mrc(p, vol)
    mesh = make_mesh(8)
    arr = load_sharded(p, mesh)
    assert arr.shape == vol.shape
    np.testing.assert_allclose(np.asarray(arr), vol, atol=0)
    # sharded along Z across the mesh
    assert len(arr.sharding.device_set) == 8


def test_load_sharded_feeds_denoise(tmp_path):
    vol = make_blob_volume(16, 24, 16, seed=2)
    p = tmp_path / "v.mrc"
    write_mrc(p, vol)
    mesh = make_mesh(8)
    arr = load_sharded(p, mesh)
    cfg = FilterConfig(sigma=(0.5,) * 3, use_flow=False)
    out = np.asarray(denoise_sharded(arr, cfg, mesh=mesh))
    ref = np.asarray(gaussian_denoise(vol, cfg.sigma, cfg.boundary))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_load_sharded_uneven_falls_back(tmp_path):
    vol = make_blob_volume(10, 24, 16, seed=3)
    p = tmp_path / "v.mrc"
    write_mrc(p, vol)
    mesh = make_mesh(8)
    arr = load_sharded(p, mesh)
    assert arr.shape == vol.shape
    np.testing.assert_allclose(np.asarray(arr), vol, atol=0)
