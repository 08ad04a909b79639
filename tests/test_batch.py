"""Throughput mode: batched multi-volume denoise equals per-volume calls."""

import numpy as np

from conftest import make_blob_volume
from flowdenoising_tpu.config import Boundary, FilterConfig, FlowConfig
from flowdenoising_tpu.core.pipeline import denoise, denoise_many


def test_denoise_many_matches_singles():
    cfg = FilterConfig(sigma=(0.5, 0.5, 0.5), boundary=Boundary.WRAP,
                       flow=FlowConfig(levels=0, winsize=5))
    vols = [make_blob_volume(6, 24, 24, seed=s) for s in (31, 32, 33)]
    batch = denoise_many(vols, cfg)
    for v, out in zip(vols, batch):
        single = np.asarray(denoise(v, cfg))
        np.testing.assert_allclose(np.asarray(out), single, atol=1e-5)


def test_denoise_many_streams_generator():
    """Lazy iterable input: volumes are staged as consumed, not upfront,
    and the pre-staged (owned, donated) path matches per-volume calls."""
    cfg = FilterConfig(sigma=(0.5, 0.5, 0.5), boundary=Boundary.WRAP,
                       flow=FlowConfig(levels=0, winsize=5))
    seeds = (41, 42, 43, 44)
    vols = [make_blob_volume(5, 24, 24, seed=s) for s in seeds]
    staged_order = []

    def gen():
        for i, v in enumerate(vols):
            staged_order.append(i)
            yield v.copy()

    batch = denoise_many(gen(), cfg, window=2)
    assert len(batch) == len(vols)
    assert staged_order == list(range(len(vols)))
    for v, out in zip(vols, batch):
        single = np.asarray(denoise(v, cfg))
        np.testing.assert_allclose(np.asarray(out), single, atol=1e-5)


def test_denoise_many_does_not_clobber_device_inputs():
    """Caller-held float32 device arrays must survive (denoise copies them
    instead of donating the caller's buffer)."""
    import jax.numpy as jnp
    cfg = FilterConfig(sigma=(0.5, 0.5, 0.5), boundary=Boundary.WRAP,
                       flow=FlowConfig(levels=0, winsize=5))
    host = make_blob_volume(5, 24, 24, seed=7)
    dev = jnp.asarray(host)
    denoise_many([dev], cfg)
    np.testing.assert_array_equal(np.asarray(dev), host)


def test_denoise_many_to_host():
    """Sustained-service mode: results come back as host arrays (device
    buffers freed as they leave the window) and match per-volume calls."""
    cfg = FilterConfig(sigma=(0.5, 0.5, 0.5), boundary=Boundary.WRAP,
                       flow=FlowConfig(levels=0, winsize=5))
    vols = [make_blob_volume(5, 24, 24, seed=s) for s in (51, 52, 53, 54)]
    batch = denoise_many(vols, cfg, window=2, to_host=True)
    assert all(isinstance(o, np.ndarray) for o in batch)
    for v, out in zip(vols, batch):
        single = np.asarray(denoise(v, cfg))
        np.testing.assert_allclose(out, single, atol=1e-5)
