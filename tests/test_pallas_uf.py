"""Fused Pallas update-flow kernel vs the XLA composition (interpreter)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flowdenoising_tpu.ops import farneback as F
from flowdenoising_tpu.ops.pallas.update_flow import update_flow_pallas


@pytest.mark.parametrize("winsize,shape", [(5, (2, 24, 40)), (15, (1, 32, 32))])
def test_matches_xla(winsize, shape):
    r = np.random.default_rng(0)
    m = jnp.asarray(r.normal(size=shape + (5,)).astype(np.float32) * 10)
    ref = np.asarray(F.update_flow(m, winsize, sampler="windowed"))
    out = np.asarray(update_flow_pallas(m, winsize, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
