"""Fused UM+UF Farneback-iteration kernel vs the split composition
(interpreter mode on the CPU mesh; exercised compiled on TPU by the
benchmark and scripts/verify_tpu.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flowdenoising_tpu.ops import farneback as F
from flowdenoising_tpu.ops.pallas import umuf as U


def _setup(b=2, h=24, w=40, seed=0, flow_scale=1.5):
    r = np.random.default_rng(seed)
    img0 = jnp.asarray(r.normal(size=(b, h, w)).astype(np.float32) * 40)
    img1 = jnp.asarray(r.normal(size=(b, h, w)).astype(np.float32) * 40)
    R0 = F.poly_expand(img0)
    R1 = F.poly_expand(img1)
    flow = jnp.asarray((r.normal(size=(b, h, w, 2)) * flow_scale).astype(np.float32))
    return R0, R1, flow


def _split_ref(R0, R1, flow, d, winsize):
    m = F.update_matrices(R0, R1, flow, d, sampler="windowed")
    return np.asarray(F.update_flow(m, winsize, sampler="xla"))


@pytest.mark.parametrize("winsize", [5, 7])
def test_matches_split_composition(winsize):
    R0, R1, flow = _setup()
    ref = _split_ref(R0, R1, flow, 4, winsize)
    out = np.asarray(U.umuf_pallas(R0, R1, flow, 4, winsize, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_large_flow_clamp():
    R0, R1, flow = _setup(seed=3, flow_scale=6.0)
    ref = _split_ref(R0, R1, flow, 3, 5)
    out = np.asarray(U.umuf_pallas(R0, R1, flow, 3, 5, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_lane_aligned_width():
    # w == multiple of 128: right box reads anchor exactly at w_true
    R0, R1, flow = _setup(b=1, h=16, w=128, seed=5)
    ref = _split_ref(R0, R1, flow, 2, 5)
    out = np.asarray(U.umuf_pallas(R0, R1, flow, 2, 5, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_row_tiling_exact(monkeypatch):
    # Force multi-tile execution; tile boundaries must not change results.
    R0, R1, flow = _setup(b=1, h=48, w=40, seed=6)
    ref_full = np.asarray(U.umuf_pallas(R0, R1, flow, 3, 5, interpret=True))

    fits_calls = []
    orig = U.umuf_fits_vmem

    def tiny_fits(th, w, d, winsize, iters=1):
        fits_calls.append(th)
        return th <= 16 and orig(th, w, d, winsize, iters)

    monkeypatch.setattr(U, "umuf_fits_vmem", tiny_fits)
    U._umuf_pallas_cf.clear_cache()
    tiled = np.asarray(U.umuf_pallas(R0, R1, flow, 3, 5, interpret=True))
    U._umuf_pallas_cf.clear_cache()
    assert len(fits_calls) > 1
    np.testing.assert_allclose(tiled, ref_full, atol=1e-6)

    ref = _split_ref(R0, R1, flow, 3, 5)
    np.testing.assert_allclose(tiled, ref, atol=5e-4, rtol=1e-4)


def test_iterated_application_matches_level_loop():
    # Three fused iterations == the split _iterate_level sequence.
    R0, R1, flow = _setup(b=1, h=20, w=36, seed=7)
    d, winsize, iters = 3, 5, 3

    ref = flow
    m = F.update_matrices(R0, R1, ref, d, sampler="windowed")
    for i in range(iters):
        ref = F.update_flow(m, winsize, sampler="xla")
        if i < iters - 1:
            m = F.update_matrices(R0, R1, ref, d, sampler="windowed")

    out = flow
    for _ in range(iters):
        out = U.umuf_pallas(R0, R1, out, d, winsize, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("fused", [True, False])
@pytest.mark.parametrize("kw", [dict(), dict(dyn=True), dict(mxu=True),
                                dict(dyn=True, mxu=True)])
def test_umuf_iterate_matches_chained_calls(kw, fused):
    # The prepared-iteration API (prep hoisted out of the loop, flow kept
    # channel-first/lane-padded between iterations; with fused=True all
    # iterations chained inside one program, flow carry in VMEM) must be
    # bitwise equal to iterating the one-shot API — including at
    # non-lane-aligned widths where the zero_tail masking stands in for the
    # per-call re-pad.
    R0, R1, flow = _setup(b=2, h=20, w=36, seed=13, flow_scale=2.0)
    ref = flow
    for _ in range(3):
        ref = U.umuf_pallas(R0, R1, ref, 3, 5, interpret=True, **kw)
    out = U.umuf_iterate(R0, R1, flow, 3, 3, 5, interpret=True, fused=fused,
                         **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


@pytest.mark.parametrize("fused", [True, False])
def test_umuf_iterate_row_tiled(monkeypatch, fused):
    # Multi-tile iteration: per-tile flow slices are re-assembled between
    # iterations (fused=False) or carried in VMEM with an r*iters row
    # context (fused=True); both must equal the single-tile result exactly.
    R0, R1, flow = _setup(b=1, h=48, w=40, seed=14)
    full = np.asarray(U.umuf_iterate(R0, R1, flow, 3, 3, 5, interpret=True,
                                     fused=fused))
    orig = U.umuf_fits_vmem
    monkeypatch.setattr(U, "umuf_fits_vmem",
                        lambda th, w, d, ws, it=1: th <= 16
                        and orig(th, w, d, ws, it))
    U._umuf_pallas_cf.clear_cache()
    tiled = np.asarray(U.umuf_iterate(R0, R1, flow, 3, 3, 5, interpret=True,
                                      fused=fused))
    U._umuf_pallas_cf.clear_cache()
    np.testing.assert_allclose(tiled, full, atol=0)


@pytest.mark.parametrize("kw", [dict(), dict(dyn=True, mxu=True)])
def test_umuf_fused_iters_tile_invariant_vs_unfused(monkeypatch, kw):
    # The fused in-kernel iteration under FORCED multi-tiling must equal the
    # unfused per-iteration programs bitwise: the r*iters halo argument.
    R0, R1, flow = _setup(b=1, h=64, w=40, seed=15, flow_scale=2.5)
    ref = np.asarray(U.umuf_iterate(R0, R1, flow, 3, 3, 5, interpret=True,
                                    fused=False))
    orig = U.umuf_fits_vmem
    monkeypatch.setattr(U, "umuf_fits_vmem",
                        lambda th, w, d, ws, it=1: th <= 16
                        and orig(th, w, d, ws, it))
    U._umuf_pallas_cf.clear_cache()
    out = np.asarray(U.umuf_iterate(R0, R1, flow, 3, 3, 5, interpret=True,
                                    fused=True, **kw))
    U._umuf_pallas_cf.clear_cache()
    if kw.get("mxu"):
        np.testing.assert_allclose(out, ref, atol=1e-5)
    else:
        np.testing.assert_allclose(out, ref, atol=0)


def test_xwin_matches_gather_path():
    # The static-shift-window sampling variant is mathematically identical
    # to the lane-gather path (bilinear hat decomposition); outputs must
    # agree to f32 rounding.
    R0, R1, flow = _setup(b=2, h=24, w=40, seed=8, flow_scale=1.5)
    ref = np.asarray(U.umuf_pallas(R0, R1, flow, 4, 5, interpret=True))
    out = np.asarray(U.umuf_pallas(R0, R1, flow, 4, 5, interpret=True,
                                   xwin=True))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-5)


def test_xwin_large_flow_clamp():
    R0, R1, flow = _setup(b=1, h=20, w=36, seed=9, flow_scale=6.0)
    ref = np.asarray(U.umuf_pallas(R0, R1, flow, 3, 5, interpret=True))
    out = np.asarray(U.umuf_pallas(R0, R1, flow, 3, 5, interpret=True,
                                   xwin=True))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-5)


@pytest.mark.parametrize("kw", [dict(dyn=True), dict(mxu=True),
                                dict(dyn=True, mxu=True)])
def test_dyn_mxu_match_base(kw):
    # dyn must be bitwise-identical (same gathers, dynamic trip count);
    # mxu reassociates the box sums on the MXU (float-rounding level).
    R0, R1, flow = _setup(b=2, h=24, w=40, seed=11, flow_scale=3.0)
    base = np.asarray(U.umuf_pallas(R0, R1, flow, 4, 5, interpret=True))
    out = np.asarray(U.umuf_pallas(R0, R1, flow, 4, 5, interpret=True, **kw))
    tol = 0 if kw == dict(dyn=True) else 1e-5
    np.testing.assert_allclose(out, base, atol=tol)


def test_dyn_mxu_row_tiling_exact(monkeypatch):
    # Multi-tile execution with per-tile Bh matrices must be tile-invariant.
    R0, R1, flow = _setup(b=1, h=48, w=40, seed=12)
    full = np.asarray(U.umuf_pallas(R0, R1, flow, 3, 5, interpret=True,
                                    dyn=True, mxu=True))
    orig = U.umuf_fits_vmem
    monkeypatch.setattr(U, "umuf_fits_vmem",
                        lambda th, w, d, ws, it=1: th <= 16
                        and orig(th, w, d, ws, it))
    U._umuf_pallas_cf.clear_cache()
    tiled = np.asarray(U.umuf_pallas(R0, R1, flow, 3, 5, interpret=True,
                                     dyn=True, mxu=True))
    U._umuf_pallas_cf.clear_cache()
    np.testing.assert_allclose(tiled, full, atol=1e-6)
    ref = _split_ref(R0, R1, flow, 3, 5)
    np.testing.assert_allclose(tiled, ref, atol=5e-4, rtol=1e-4)
