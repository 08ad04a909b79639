"""Native C++ runtime (libfdio) bindings and their NumPy-equivalence."""

import numpy as np
import pytest

from flowdenoising_tpu import runtime
from flowdenoising_tpu.io.mrc import read_mrc_f32, write_mrc, read_mrc


def test_stats_matches_numpy():
    x = np.random.default_rng(0).normal(size=30000).astype(np.float32) * 37 + 5
    mn, mx, mean, rms = runtime.stats_f32(x)
    assert abs(mn - x.min()) < 1e-4
    assert abs(mx - x.max()) < 1e-4
    assert abs(mean - x.mean()) < 1e-3
    assert abs(rms - x.std()) < 1e-3


@pytest.mark.parametrize("dtype,mode", [(np.int8, 0), (np.int16, 1),
                                        (np.float32, 2), (np.uint16, 6),
                                        (np.float16, 12)])
def test_read_mrc_f32_all_modes(tmp_path, dtype, mode):
    r = np.random.default_rng(mode)
    if np.issubdtype(dtype, np.floating):
        vol = r.normal(size=(3, 8, 8)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        vol = r.integers(info.min, info.max, size=(3, 8, 8)).astype(dtype)
    p = tmp_path / "v.mrc"
    write_mrc(p, vol)
    f32 = read_mrc_f32(p)
    np.testing.assert_array_equal(f32, vol.astype(np.float32))
    raw, hdr = read_mrc(p)
    assert hdr.mode == mode


def test_native_or_fallback_consistency(tmp_path):
    # whichever path is active, the public API result is identical
    vol = (np.random.default_rng(9).normal(size=(4, 16, 16)) * 900).astype(np.int16)
    p = tmp_path / "w.mrc"
    write_mrc(p, vol)
    a = read_mrc_f32(p)
    b, _ = read_mrc(p)
    np.testing.assert_array_equal(a, b.astype(np.float32))
