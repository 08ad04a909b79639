"""Row-tiled kernel paths (large-plane support): tiling must not change
results.  Forces tiling by shrinking the VMEM budget, using unique shapes so
jit caches cannot replay untiled traces."""

import numpy as np
import jax.numpy as jnp
import pytest

import flowdenoising_tpu.ops.pallas.sample as S
import flowdenoising_tpu.ops.pallas.update_matrices as UM
import flowdenoising_tpu.ops.pallas.update_flow as UF
from flowdenoising_tpu.ops import farneback as F
from flowdenoising_tpu.ops.warp import bilinear_displace_windowed


def test_plane_row_tiles():
    assert S.plane_row_tiles(100, lambda th: th <= 40) == [(0, 34), (34, 34), (68, 32)]
    assert S.plane_row_tiles(64, lambda th: True) == [(0, 64)]
    assert S.plane_row_tiles(7, lambda th: th <= 2) == [(0, 2), (2, 2), (4, 2), (6, 1)]


def test_tiled_sample_matches_windowed(monkeypatch):
    monkeypatch.setattr(S, "_VMEM_BUDGET_BYTES", 40 * 1024)
    r = np.random.default_rng(5)
    img = r.normal(size=(2, 31, 40)).astype(np.float32) * 30
    u = (r.normal(size=(2, 31, 40)) * 2).astype(np.float32)
    v = (r.normal(size=(2, 31, 40)) * 2).astype(np.float32)
    assert len(S.plane_row_tiles(31, lambda th: S.fits_vmem(1, th, 40, 3))) > 1
    out = np.asarray(S.bilinear_displace_pallas(
        jnp.asarray(img), jnp.asarray(u), jnp.asarray(v), 3, interpret=True))
    ref = np.asarray(bilinear_displace_windowed(
        jnp.asarray(img), jnp.asarray(u), jnp.asarray(v), 3))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_tiled_um_matches_xla(monkeypatch):
    monkeypatch.setattr(UM, "_VMEM_BUDGET_BYTES", 280 * 1024)
    r = np.random.default_rng(6)
    img0 = jnp.asarray(r.normal(size=(2, 29, 48)).astype(np.float32) * 40)
    img1 = jnp.asarray(r.normal(size=(2, 29, 48)).astype(np.float32) * 40)
    R0 = F.poly_expand(img0)
    R1 = F.poly_expand(img1)
    flow = jnp.asarray((r.normal(size=(2, 29, 48, 2)) * 1.5).astype(np.float32))
    assert len(S.plane_row_tiles(29, lambda th: UM.um_fits_vmem(th, 48, 3))) > 1
    out = np.asarray(UM.update_matrices_pallas(R0, R1, flow, 3, interpret=True))
    ref = np.asarray(F.update_matrices(R0, R1, flow, 3, sampler="windowed"))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_tiled_uf_matches_xla(monkeypatch):
    monkeypatch.setattr(UF, "_VMEM_BUDGET_BYTES", 100 * 1024)
    r = np.random.default_rng(7)
    m = jnp.asarray(r.normal(size=(2, 27, 56, 5)).astype(np.float32) * 10)
    assert len(S.plane_row_tiles(27, lambda th: UF.uf_fits_vmem(th, 56, 5))) > 1
    out = np.asarray(UF.update_flow_pallas(m, 5, interpret=True))
    ref = np.asarray(F.update_flow(m, 5, sampler="windowed"))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
