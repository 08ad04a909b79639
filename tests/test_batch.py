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
