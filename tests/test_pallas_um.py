"""Fused Pallas update-matrices kernel vs the XLA composition (interpreter
mode on the CPU mesh; exercised compiled on TPU by the benchmark)."""

import numpy as np
import jax.numpy as jnp

from flowdenoising_tpu.ops import farneback as F
from flowdenoising_tpu.ops.pallas.update_matrices import update_matrices_pallas


def _setup(b=2, h=24, w=40, seed=0, flow_scale=1.5):
    r = np.random.default_rng(seed)
    img0 = jnp.asarray(r.normal(size=(b, h, w)).astype(np.float32) * 40)
    img1 = jnp.asarray(r.normal(size=(b, h, w)).astype(np.float32) * 40)
    R0 = F.poly_expand(img0)
    R1 = F.poly_expand(img1)
    flow = jnp.asarray((r.normal(size=(b, h, w, 2)) * flow_scale).astype(np.float32))
    return R0, R1, flow


def test_matches_xla_windowed():
    R0, R1, flow = _setup()
    ref = np.asarray(F.update_matrices(R0, R1, flow, 4, sampler="windowed"))
    out = np.asarray(update_matrices_pallas(R0, R1, flow, 4, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_matches_with_large_flow_clamp():
    R0, R1, flow = _setup(seed=3, flow_scale=6.0)
    ref = np.asarray(F.update_matrices(R0, R1, flow, 3, sampler="windowed"))
    out = np.asarray(update_matrices_pallas(R0, R1, flow, 3, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_zero_flow_center_is_exactly_averaged():
    R0, R1, _ = _setup(seed=4)
    flow = jnp.zeros(R0.shape[:-1] + (2,), jnp.float32)
    out = np.asarray(update_matrices_pallas(R0, R1, flow, 2, interpret=True))
    ref = np.asarray(F.update_matrices(R0, R1, flow, None))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)
