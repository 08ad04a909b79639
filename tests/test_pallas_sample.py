"""Pallas fused sampling kernel vs the XLA windowed reference, in
interpreter mode (runs on the CPU test mesh; the compiled kernel is exercised
on real TPU hardware by the benchmark)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flowdenoising_tpu.ops.pallas.sample import bilinear_displace_pallas
from flowdenoising_tpu.ops.warp import bilinear_displace_windowed


@pytest.mark.parametrize("shape,scale", [((2, 24, 32), 1.5), ((1, 16, 16), 3.0)])
def test_matches_windowed_no_channels(shape, scale):
    r = np.random.default_rng(1)
    img = r.normal(size=shape).astype(np.float32) * 50
    u = (r.normal(size=shape) * scale).astype(np.float32)
    v = (r.normal(size=shape) * scale).astype(np.float32)
    ref = np.asarray(bilinear_displace_windowed(
        jnp.asarray(img), jnp.asarray(u), jnp.asarray(v), 4))
    out = np.asarray(bilinear_displace_pallas(
        jnp.asarray(img), jnp.asarray(u), jnp.asarray(v), 4, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_matches_windowed_channels():
    r = np.random.default_rng(2)
    img = r.normal(size=(2, 5, 16, 24)).astype(np.float32) * 10
    u = (r.normal(size=(2, 16, 24)) * 2).astype(np.float32)
    v = (r.normal(size=(2, 16, 24)) * 2).astype(np.float32)
    ref = np.asarray(bilinear_displace_windowed(
        jnp.asarray(img), jnp.asarray(u)[:, None], jnp.asarray(v)[:, None], 3))
    out = np.asarray(bilinear_displace_pallas(
        jnp.asarray(img), jnp.asarray(u), jnp.asarray(v), 3, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_clamping_and_borders():
    r = np.random.default_rng(3)
    img = r.normal(size=(1, 16, 16)).astype(np.float32)
    u = np.full((1, 16, 16), 9.0, np.float32)   # beyond D=2 -> clamped
    v = np.full((1, 16, 16), -9.0, np.float32)
    ref = np.asarray(bilinear_displace_windowed(
        jnp.asarray(img), jnp.asarray(u), jnp.asarray(v), 2))
    out = np.asarray(bilinear_displace_pallas(
        jnp.asarray(img), jnp.asarray(u), jnp.asarray(v), 2, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4)
