"""Fused UM+UF Farneback-iteration kernel vs the split composition
(interpreter mode on the CPU mesh; exercised compiled on TPU by the
benchmark and scripts/verify_tpu.py)."""

import numpy as np
import jax
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

    def tiny_fits(th, w, d, winsize, iters=1, eo=False):
        fits_calls.append(th)
        return th <= 16 and orig(th, w, d, winsize, iters, eo)

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
@pytest.mark.slow
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
@pytest.mark.slow
def test_umuf_iterate_row_tiled(monkeypatch, fused):
    # Multi-tile iteration: per-tile flow slices are re-assembled between
    # iterations (fused=False) or carried in VMEM with an r*iters row
    # context (fused=True); both must equal the single-tile result exactly.
    R0, R1, flow = _setup(b=1, h=48, w=40, seed=14)
    full = np.asarray(U.umuf_iterate(R0, R1, flow, 3, 3, 5, interpret=True,
                                     fused=fused))
    orig = U.umuf_fits_vmem
    monkeypatch.setattr(U, "umuf_fits_vmem",
                        lambda th, w, d, ws, it=1, eo=0: th <= 16
                        and orig(th, w, d, ws, it, eo))
    U._umuf_pallas_cf.clear_cache()
    tiled = np.asarray(U.umuf_iterate(R0, R1, flow, 3, 3, 5, interpret=True,
                                      fused=fused))
    U._umuf_pallas_cf.clear_cache()
    np.testing.assert_allclose(tiled, full, atol=0)


@pytest.mark.parametrize("kw", [dict(), dict(dyn=True, mxu=True)])
@pytest.mark.slow
def test_umuf_fused_iters_tile_invariant_vs_unfused(monkeypatch, kw):
    # The fused in-kernel iteration under FORCED multi-tiling must equal the
    # unfused per-iteration programs bitwise: the r*iters halo argument.
    R0, R1, flow = _setup(b=1, h=64, w=40, seed=15, flow_scale=2.5)
    ref = np.asarray(U.umuf_iterate(R0, R1, flow, 3, 3, 5, interpret=True,
                                    fused=False))
    orig = U.umuf_fits_vmem
    monkeypatch.setattr(U, "umuf_fits_vmem",
                        lambda th, w, d, ws, it=1, eo=0: th <= 16
                        and orig(th, w, d, ws, it, eo))
    U._umuf_pallas_cf.clear_cache()
    out = np.asarray(U.umuf_iterate(R0, R1, flow, 3, 3, 5, interpret=True,
                                    fused=True, **kw))
    U._umuf_pallas_cf.clear_cache()
    if kw.get("mxu"):
        np.testing.assert_allclose(out, ref, atol=1e-5)
    else:
        np.testing.assert_allclose(out, ref, atol=0)


@pytest.mark.slow
def test_xwin_matches_gather_path():
    # The static-shift-window sampling variant is mathematically identical
    # to the lane-gather path (bilinear hat decomposition); outputs must
    # agree to f32 rounding.
    R0, R1, flow = _setup(b=2, h=24, w=40, seed=8, flow_scale=1.5)
    ref = np.asarray(U.umuf_pallas(R0, R1, flow, 4, 5, interpret=True))
    out = np.asarray(U.umuf_pallas(R0, R1, flow, 4, 5, interpret=True,
                                   xwin=True))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-5)


@pytest.mark.slow
def test_xwin_large_flow_clamp():
    R0, R1, flow = _setup(b=1, h=20, w=36, seed=9, flow_scale=6.0)
    ref = np.asarray(U.umuf_pallas(R0, R1, flow, 3, 5, interpret=True))
    out = np.asarray(U.umuf_pallas(R0, R1, flow, 3, 5, interpret=True,
                                   xwin=True))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-5)


@pytest.mark.parametrize("kw", [dict(dyn=True), dict(mxu=True),
                                dict(dyn=True, mxu=True),
                                dict(dyn=True, rg=8),
                                dict(dyn=True, mxu=True, rg=8),
                                dict(dyn=True, mxu=True, rg=16),
                                dict(dyn=True, eo=True),
                                dict(dyn=True, rg=8, eo=True),
                                dict(dyn=True, mxu=True, rg=16, eo=True)])
@pytest.mark.slow
def test_dyn_mxu_match_base(kw):
    # dyn must be bitwise-identical (same gathers, dynamic trip count);
    # eo gathers the same values from deinterleaved planes (also bitwise);
    # mxu reassociates the box sums on the MXU (float-rounding level).
    R0, R1, flow = _setup(b=2, h=24, w=40, seed=11, flow_scale=3.0)
    base = np.asarray(U.umuf_pallas(R0, R1, flow, 4, 5, interpret=True))
    out = np.asarray(U.umuf_pallas(R0, R1, flow, 4, 5, interpret=True, **kw))
    tol = 0 if not kw.get("mxu") else 1e-5
    np.testing.assert_allclose(out, base, atol=tol)


@pytest.mark.slow
def test_dyn_mxu_row_tiling_exact(monkeypatch):
    # Multi-tile execution with per-tile Bh matrices must be tile-invariant.
    R0, R1, flow = _setup(b=1, h=48, w=40, seed=12)
    full = np.asarray(U.umuf_pallas(R0, R1, flow, 3, 5, interpret=True,
                                    dyn=True, mxu=True))
    orig = U.umuf_fits_vmem
    monkeypatch.setattr(U, "umuf_fits_vmem",
                        lambda th, w, d, ws, it=1, eo=False: th <= 16
                        and orig(th, w, d, ws, it, eo))
    U._umuf_pallas_cf.clear_cache()
    tiled = np.asarray(U.umuf_pallas(R0, R1, flow, 3, 5, interpret=True,
                                     dyn=True, mxu=True))
    U._umuf_pallas_cf.clear_cache()
    np.testing.assert_allclose(tiled, full, atol=1e-6)
    ref = _split_ref(R0, R1, flow, 3, 5)
    np.testing.assert_allclose(tiled, ref, atol=5e-4, rtol=1e-4)


# ---- prepped full-stack path (prep once per pass, scalar-prefetch window) ----

def _stack_setup(B=10, h=20, w=36, seed=21, flow_scale=2.0):
    r = np.random.default_rng(seed)
    stack = jnp.asarray(r.normal(size=(B, h, w)).astype(np.float32) * 40)
    Rcf = F.poly_expand(stack, channel_first=True)      # (B, 5, h, w)
    return stack, Rcf, r


@pytest.mark.parametrize("kw", [dict(), dict(dyn=True, mxu=True),
                                dict(dyn=True, mxu=True, rg=8),
                                dict(dyn=True, mxu=True, rg=8, eo=True)])
@pytest.mark.parametrize("start,w", [(0, 36), (3, 36), (3, 128)])
@pytest.mark.slow
def test_prepped_window_matches_umuf_iterate(kw, start, w):
    # umuf_iterate_prepped windowing into the FULL stack operand at a traced
    # offset must equal umuf_iterate on the materialized window -- across
    # offsets, lane-aligned and unaligned widths, and kernel variants.
    n, d, winsize, iters = 4, 3, 5, 3
    stack, Rcf, r = _stack_setup(B=n + 6, w=w)
    flow = jnp.asarray((r.normal(size=(n, Rcf.shape[-2], w, 2)) * 2.0)
                       .astype(np.float32))
    r0cf = Rcf[2:2 + n]
    r1cf = jax.lax.dynamic_slice_in_dim(Rcf, start, n, axis=0)
    ref = np.asarray(U.umuf_iterate(
        jnp.moveaxis(r0cf, 1, -1), jnp.moveaxis(r1cf, 1, -1), flow,
        iters, d, winsize, interpret=True, **kw))

    r0_tiles, r1_tiles, tiles = U.prep_tiles_cf(
        Rcf, d, w, winsize, iters, dyn=kw.get("dyn", False),
        eo=kw.get("eo", False), interior=(2, n))
    fcf = U._lane_pad_flow_cf(jnp.moveaxis(flow, -1, 1), w)
    out = U.umuf_iterate_prepped(
        r0_tiles, r1_tiles, tiles, fcf, iters, d, winsize,
        h=Rcf.shape[-2], w=w, r1_start=jnp.int32(start),
        interpret=True, **kw)
    out = np.asarray(jnp.moveaxis(out[:, :, :, :w], 1, -1))
    np.testing.assert_allclose(out, ref, atol=0)


@pytest.mark.slow
def test_prepped_window_row_tiled(monkeypatch):
    # Forced multi-tile prep: per-tile full-stack row slices + traced batch
    # window must be tile-invariant.
    n, d, winsize, iters = 3, 3, 5, 3
    stack, Rcf, r = _stack_setup(B=n + 5, h=48, w=40, seed=22)
    flow = jnp.asarray((r.normal(size=(n, 48, 40, 2)) * 2.0)
                       .astype(np.float32))
    ref = np.asarray(U.umuf_iterate(
        jnp.moveaxis(Rcf[1:1 + n], 1, -1),
        jnp.moveaxis(Rcf[4:4 + n], 1, -1), flow,
        iters, d, winsize, interpret=True, dyn=True, mxu=True))

    orig = U.umuf_fits_vmem
    monkeypatch.setattr(U, "umuf_fits_vmem",
                        lambda th, w, dd, ws, it=1, eo=False: th <= 16
                        and orig(th, w, dd, ws, it, eo))
    r0_tiles, r1_tiles, tiles = U.prep_tiles_cf(
        Rcf, d, 40, winsize, iters, dyn=True, interior=(1, n))
    assert len(tiles) > 1
    fcf = U._lane_pad_flow_cf(jnp.moveaxis(flow, -1, 1), 40)
    out = U.umuf_iterate_prepped(
        r0_tiles, r1_tiles, tiles, fcf, iters, d, winsize,
        h=48, w=40, r1_start=jnp.int32(4), interpret=True,
        dyn=True, mxu=True)
    out = np.asarray(jnp.moveaxis(out[:, :, :, :40], 1, -1))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("seeded", [True, False])
@pytest.mark.slow
def test_prepped_tap_solver_matches_flow_from_pyramids(seeded):
    # Full coarse-to-fine parity: the per-pass prepped solver (channel-first
    # pyramids, hoisted prep, traced reference window) vs flow_from_pyramids
    # on the materialized slices, seeded and unseeded.
    from flowdenoising_tpu.config import FlowConfig
    n, ks2 = 4, 2
    cfg = FlowConfig(levels=2, winsize=5, use_initial_flow=seeded,
                     max_displacement=4)
    stack, _, r = _stack_setup(B=n + 2 * ks2, h=80, w=72, seed=23)
    init = jnp.asarray((r.normal(size=(n, 80, 72, 2)) * 1.5)
                       .astype(np.float32)) if seeded else None

    r_levels = F.polyexp_pyramid(stack, cfg)
    levels = len(r_levels) - 1   # clamped_levels trims below 32px planes
    assert levels >= 1
    r0_levels = [x[ks2:ks2 + n] for x in r_levels]
    start = 1
    r1_levels = [jax.lax.dynamic_slice_in_dim(x, start, n, axis=0)
                 for x in r_levels]
    # reference: force the Pallas interpret path through _iterate_level by
    # computing per-level with umuf_iterate directly (tiny levels route to
    # the split XLA iteration, mirroring _iterate_level's launch-floor
    # threshold)
    flow_ref = None
    from flowdenoising_tpu.ops.farneback import (
        _level_displacement, _umuf_opts, _small_level_iterate,
        _XLA_LEVEL_AREA)
    from flowdenoising_tpu.ops.resize import resize_area, resize_linear
    kn = _umuf_opts()
    for k in range(levels, -1, -1):
        hk, wk = r0_levels[k].shape[-3], r0_levels[k].shape[-2]
        if flow_ref is None:
            if seeded:
                f = jnp.moveaxis(init, -1, -3)
                f = resize_area(f, (hk, wk)) * (cfg.pyr_scale ** k)
                flow_ref = jnp.moveaxis(f, -3, -1)
            else:
                flow_ref = jnp.zeros((n, hk, wk, 2), jnp.float32)
        else:
            f = jnp.moveaxis(flow_ref, -1, -3)
            f = resize_linear(f, (hk, wk)) * (1.0 / cfg.pyr_scale)
            flow_ref = jnp.moveaxis(f, -3, -1)
        d_k = _level_displacement(cfg, k)
        if hk * wk <= _XLA_LEVEL_AREA and d_k is not None:
            flow_ref = _small_level_iterate(r0_levels[k], r1_levels[k],
                                            flow_ref, cfg, d_k)
            flow_ref = flow_ref.astype(jnp.float32)
        else:
            flow_ref = U.umuf_iterate(r0_levels[k], r1_levels[k], flow_ref,
                                      cfg.iterations, d_k,
                                      cfg.winsize, interpret=True, **kn)
    ref = np.asarray(flow_ref)

    solver = F.prepped_tap_solver(stack, ks2, n, cfg, interpret=True)
    out = solver(jnp.int32(start),
                 jnp.moveaxis(init, -1, 1) if seeded else None)
    out = np.asarray(jnp.moveaxis(out, 1, -1))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
