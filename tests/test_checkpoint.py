"""Pass-boundary checkpoint/resume: resumed runs reproduce uninterrupted runs."""

import numpy as np
import pytest

from conftest import make_blob_volume
from flowdenoising_tpu.config import Boundary, FilterConfig, FlowConfig
from flowdenoising_tpu.core.pipeline import denoise
from flowdenoising_tpu.utils.checkpoint import CheckpointManager, volume_digest


@pytest.fixture
def cfg():
    return FilterConfig(sigma=(0.5, 0.5, 0.5), boundary=Boundary.MEAN,
                        flow=FlowConfig(levels=0, winsize=5))


def test_resume_matches_uninterrupted(tmp_path, cfg):
    vol = make_blob_volume(8, 24, 24, seed=21)
    full = np.asarray(denoise(vol, cfg))

    ckpt = CheckpointManager(str(tmp_path), cfg, vol)
    saved = {}
    # run passes 0..1, checkpointing, then "crash"
    denoise(vol, cfg, start_pass=0,
            on_pass=lambda i, v: (ckpt.save_pass(i, v), saved.setdefault(i, np.asarray(v)))
            if i < 2 else None)

    resumed = CheckpointManager(str(tmp_path), cfg, vol).load_latest()
    assert resumed is not None
    start_pass, state, mean = resumed
    assert start_pass == 2
    out = np.asarray(denoise(state, cfg, start_pass=start_pass, mean_val=np.float32(mean)))
    np.testing.assert_allclose(out, full, atol=1e-3)


def test_completed_run_fast_path(tmp_path, cfg, monkeypatch):
    """A manifest with all three passes done returns the finished volume;
    restarting after success must not re-execute any pass."""
    vol = make_blob_volume(8, 24, 24, seed=25)
    full = np.asarray(denoise(vol, cfg))

    ckpt = CheckpointManager(str(tmp_path), cfg, vol)
    denoise(vol, cfg, on_pass=lambda i, v: ckpt.save_pass(i, v))

    resumed = CheckpointManager(str(tmp_path), cfg, vol).load_latest()
    assert resumed is not None
    start_pass, state, mean = resumed
    assert start_pass == 3

    # no pass may execute from here: poison the pass-program cache
    import flowdenoising_tpu.core.pipeline as pl

    def _boom(*a, **k):
        raise AssertionError("a pass re-executed after a completed run")

    monkeypatch.setattr(pl, "_cached_pass", _boom)
    out = np.asarray(denoise(state, cfg, start_pass=start_pass,
                             mean_val=np.float32(mean)))
    np.testing.assert_allclose(out, full, atol=1e-3)


def test_manifest_rejects_other_config(tmp_path, cfg):
    vol = make_blob_volume(8, 24, 24, seed=22)
    ckpt = CheckpointManager(str(tmp_path), cfg, vol)
    ckpt.save_pass(0, vol)
    import dataclasses
    other = dataclasses.replace(cfg, sigma=(1.0, 1.0, 1.0))
    assert CheckpointManager(str(tmp_path), other, vol).load_latest() is None


def test_manifest_rejects_other_input(tmp_path, cfg):
    vol = make_blob_volume(8, 24, 24, seed=23)
    CheckpointManager(str(tmp_path), cfg, vol).save_pass(0, vol)
    vol2 = vol + 1.0
    assert CheckpointManager(str(tmp_path), cfg, vol2).load_latest() is None


def test_volume_digest_sensitivity():
    v = make_blob_volume(4, 16, 16, seed=24)
    assert volume_digest(v) == volume_digest(v.copy())
    w = v.copy()
    w[0, 0, 0] += 1
    assert volume_digest(v) != volume_digest(w)
