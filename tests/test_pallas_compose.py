"""Fused compose-tap kernel vs the unfused composition step
(ops/pallas/compose.py; interpreter mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flowdenoising_tpu.ops.pallas.compose import compose_tap_pallas
from flowdenoising_tpu.ops.warp import displace_sample, warp_slices


def _ref_step(link, flow, neighbor, acc, weight, d):
    link_cf = jnp.moveaxis(link, -1, -3)
    warped_link = displace_sample(link_cf, flow[..., 0], flow[..., 1], d,
                                  "windowed")
    flow = flow + jnp.moveaxis(warped_link, -3, -1)
    warped = warp_slices(neighbor, flow, d, "windowed")
    return np.asarray(flow), np.asarray(acc + warped * weight)


def _setup(b=2, h=24, w=40, seed=0, scale=1.5):
    r = np.random.default_rng(seed)
    link = jnp.asarray((r.normal(size=(b, h, w, 2)) * 0.6).astype(np.float32))
    flow = jnp.asarray((r.normal(size=(b, h, w, 2)) * scale).astype(np.float32))
    neighbor = jnp.asarray(r.normal(size=(b, h, w)).astype(np.float32) * 50)
    acc = jnp.asarray(r.normal(size=(b, h, w)).astype(np.float32))
    return link, flow, neighbor, acc


@pytest.mark.parametrize("d", [3, 6])
def test_matches_unfused(d):
    link, flow, neighbor, acc = _setup()
    fr, ar = _ref_step(link, flow, neighbor, acc, 0.13, d)
    fo, ao = compose_tap_pallas(link, flow, neighbor, acc, 0.13, d,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(fo), fr, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ao), ar, atol=1e-4)


def test_large_flow_clamped():
    link, flow, neighbor, acc = _setup(seed=3, scale=8.0)
    fr, ar = _ref_step(link, flow, neighbor, acc, 0.2, 4)
    fo, ao = compose_tap_pallas(link, flow, neighbor, acc, 0.2, 4,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(fo), fr, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ao), ar, atol=1e-4)


@pytest.mark.parametrize("scale", [1.5, 8.0])
def test_dyn_matches_static(scale):
    # dyn trip loop (8-aligned dynamic windows + roll) must be bitwise
    # identical to the statically predicated shift loop: same gathers,
    # same accumulation order.
    link, flow, neighbor, acc = _setup(seed=7, scale=scale)
    fs, as_ = compose_tap_pallas(link, flow, neighbor, acc, 0.17, 4,
                                 interpret=True, dyn=False)
    fd, ad = compose_tap_pallas(link, flow, neighbor, acc, 0.17, 4,
                                interpret=True, dyn=True)
    np.testing.assert_allclose(np.asarray(fd), np.asarray(fs), atol=0)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(as_), atol=0)


@pytest.mark.parametrize("dyn", [False, True])
def test_packed_close_to_f32(dyn):
    # bf16 pair-gather sampling: one gather yields both x-neighbors; values
    # carry bfloat16 relative error (~2^-8) vs the f32 path.
    link, flow, neighbor, acc = _setup(seed=9)
    fr, ar = compose_tap_pallas(link, flow, neighbor, acc, 0.13, 4,
                                interpret=True)
    fp, ap = compose_tap_pallas(link, flow, neighbor, acc, 0.13, 4,
                                interpret=True, dyn=dyn, packed=True)
    # flow updates add |link| <= ~2.4-magnitude samples at bf16 precision
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fr), atol=0.03)
    # acc adds weight * |neighbor| <= ~200-magnitude bf16 samples
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ar), atol=0.6)
    assert np.abs(np.asarray(ap) - np.asarray(ar)).mean() < 0.1


def test_row_tiling_exact(monkeypatch):
    import flowdenoising_tpu.ops.pallas.compose as C
    link, flow, neighbor, acc = _setup(b=1, h=48, w=40, seed=5)
    full = compose_tap_pallas(link, flow, neighbor, acc, 0.3, 3,
                              interpret=True)
    monkeypatch.setattr(C, "compose_fits_vmem", lambda th, w, d: th <= 16)
    C._compose_tap_cf.clear_cache()
    tiled = compose_tap_pallas(link, flow, neighbor, acc, 0.3, 3,
                               interpret=True)
    C._compose_tap_cf.clear_cache()
    np.testing.assert_allclose(np.asarray(tiled[0]), np.asarray(full[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(tiled[1]), np.asarray(full[1]),
                               atol=1e-6)
