"""Sharded MRC output writer (parallel/distributed.py::write_mrc_sharded):
single-process semantics on the 8-device CPU mesh.  The cross-process path
is covered by tests/test_multihost.py::test_two_process_cli_file_to_file."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flowdenoising_tpu.io.mrc import read_mrc, write_mrc
from flowdenoising_tpu.parallel.distributed import (
    sharded_stats, write_mrc_sharded)
from flowdenoising_tpu.parallel.mesh import AXIS, make_mesh


def _vol(z=16, y=8, x=24, seed=3):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(z, y, x)) * 40).astype(np.float32)


@pytest.mark.parametrize("spec", [P(AXIS, None, None), P(None, AXIS, None),
                                  P()])
def test_write_mrc_sharded_matches_write_mrc(tmp_path, spec):
    vol = _vol()
    mesh = make_mesh(8)
    garr = jax.device_put(jnp.asarray(vol), NamedSharding(mesh, spec))

    ref_path = tmp_path / "ref.mrc"
    out_path = tmp_path / "out.mrc"
    write_mrc(ref_path, vol)
    write_mrc_sharded(out_path, garr)

    ref, ref_hdr = read_mrc(ref_path)
    got, hdr = read_mrc(out_path)
    np.testing.assert_array_equal(got, ref)
    # header statistics are globally reduced (float-rounding vs NumPy)
    assert abs(hdr.dmin - ref_hdr.dmin) < 1e-3
    assert abs(hdr.dmax - ref_hdr.dmax) < 1e-3
    assert abs(hdr.dmean - ref_hdr.dmean) < 1e-3
    assert abs(hdr.rms - ref_hdr.rms) < 1e-3


def test_sharded_stats_global():
    vol = _vol(seed=5)
    mesh = make_mesh(8)
    garr = jax.device_put(jnp.asarray(vol),
                          NamedSharding(mesh, P(AXIS, None, None)))
    mn, mx, mean, rms = sharded_stats(garr)
    assert abs(mn - vol.min()) < 1e-4
    assert abs(mx - vol.max()) < 1e-4
    assert abs(mean - vol.mean()) < 1e-4
    assert abs(rms - vol.std()) < 1e-4
