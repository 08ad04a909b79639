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


@pytest.mark.parametrize("dyn", [False, True])
@pytest.mark.slow
def test_eo_matches_base_bitwise(dyn):
    # even/odd-deinterleaved sampling (default f32 path): same gathers in a
    # different layout, identical arithmetic -- must be bitwise-equal to the
    # interleaved two-window form.  w=150 spans two x-blocks, so the odd
    # block exercises the 64-lane phase-copy planes.
    link, flow, neighbor, acc = _setup(b=2, h=24, w=150, seed=11, scale=3.0)
    fb, ab = compose_tap_pallas(link, flow, neighbor, acc, 0.17, 6,
                                interpret=True, dyn=dyn, eo=False)
    fe, ae = compose_tap_pallas(link, flow, neighbor, acc, 0.17, 6,
                                interpret=True, dyn=dyn, eo=True)
    np.testing.assert_array_equal(np.asarray(fe), np.asarray(fb))
    np.testing.assert_array_equal(np.asarray(ae), np.asarray(ab))


def test_row_tiling_exact(monkeypatch):
    import flowdenoising_tpu.ops.pallas.compose as C
    link, flow, neighbor, acc = _setup(b=1, h=48, w=40, seed=5)
    full = compose_tap_pallas(link, flow, neighbor, acc, 0.3, 3,
                              interpret=True)
    monkeypatch.setattr(C, "compose_fits_vmem",
                        lambda th, w, d, eo=False: th <= 16)
    C._compose_tap_cf.clear_cache()
    tiled = compose_tap_pallas(link, flow, neighbor, acc, 0.3, 3,
                               interpret=True)
    C._compose_tap_cf.clear_cache()
    np.testing.assert_allclose(np.asarray(tiled[0]), np.asarray(full[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(tiled[1]), np.asarray(full[1]),
                               atol=1e-6)


def _prepped_scan(link_stack, nb_stack, vol, taps_w, starts, shifts, d,
                  dtype=jnp.float32, **kw):
    """Run a short outward tap chain through the PREPPED API."""
    import flowdenoising_tpu.ops.pallas.compose as C
    h, w = vol.shape[-2], vol.shape[-1]
    eo = kw.get("eo", False)
    tiles = C.compose_plan(h, w, d, eo)
    link_cf = jnp.moveaxis(link_stack, -1, -3)
    link_tiles = C.prep_compose_src(link_cf, d, w, tiles=tiles, **kw)
    nb_tiles = C.prep_compose_src(nb_stack[:, None], d, w, tiles=tiles, **kw)
    carry = C.init_compose_carry(vol.astype(dtype), taps_w[0], tiles, w,
                                 dtype)
    for (ls, ns), wgt in zip(zip(*starts), taps_w[1:]):
        carry = C.compose_tap_prepped(
            link_tiles, nb_tiles, carry, tiles, wgt,
            jnp.asarray(ls, jnp.int32), jnp.asarray(ns, jnp.int32),
            d=d, w=w, dtype=dtype, interpret=True, **kw)
    return C.finish_compose_carry(carry, w)


@pytest.mark.parametrize("kw", [dict(eo=True), dict(eo=False),
                                dict(eo=True, dyn=True),
                                dict(packed=True)])
@pytest.mark.slow
def test_prepped_matches_per_tap_chain(kw):
    # The prepped form (operands prepared once, per-tap kernels windowing
    # into the full stacks at traced offsets, lane-padded carry) must match
    # the per-tap API chained the same way -- bitwise for the f32 forms.
    import flowdenoising_tpu.ops.pallas.compose as C
    r = np.random.default_rng(21)
    n, h, w, d = 3, 24, 150, 5
    n_link, n_nb = n + 3, n + 4
    dtype = jnp.bfloat16 if kw.get("packed") else jnp.float32
    link_stack = jnp.asarray(
        (r.normal(size=(n_link, h, w, 2)) * 0.6).astype(np.float32))
    nb_stack = jnp.asarray(
        (r.normal(size=(n_nb, h, w)) * 40).astype(np.float32))
    vol = nb_stack[2:2 + n]
    taps_w = [0.3, 0.2, 0.15]
    starts = ([1, 0], [3, 2])   # (link starts, nb starts) per tap

    # per-tap reference chain (channels-last API, carry in pass dtype)
    flow = jnp.zeros((n, h, w, 2), dtype)
    acc = (vol.astype(dtype) * jnp.asarray(taps_w[0], dtype))
    for ls, ns, wgt in zip(*starts, taps_w[1:]):
        f32 = jnp.float32
        flow2, acc2 = compose_tap_pallas(
            link_stack[ls:ls + n].astype(f32), flow.astype(f32),
            nb_stack[ns:ns + n].astype(f32), acc.astype(f32),
            wgt, d, interpret=True, **kw)
        flow, acc = flow2.astype(dtype), acc2.astype(dtype)
    ref = np.asarray(acc.astype(jnp.float32))

    out = np.asarray(_prepped_scan(link_stack, nb_stack, vol, taps_w,
                                   starts, [], d, dtype=dtype, **kw))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_prepped_tiled_matches_per_tap(monkeypatch):
    # forced multi-tile prepped run == untiled per-tap chain, bitwise
    import flowdenoising_tpu.ops.pallas.compose as C
    r = np.random.default_rng(22)
    n, h, w, d = 2, 48, 40, 4
    link_stack = jnp.asarray(
        (r.normal(size=(n + 2, h, w, 2)) * 0.8).astype(np.float32))
    nb_stack = jnp.asarray(
        (r.normal(size=(n + 3, h, w)) * 40).astype(np.float32))
    vol = nb_stack[1:1 + n]
    taps_w = [0.4, 0.25]
    starts = ([1], [2])

    flow = jnp.zeros((n, h, w, 2), jnp.float32)
    acc = vol * taps_w[0]
    flow, acc = compose_tap_pallas(link_stack[1:1 + n], flow,
                                   nb_stack[2:2 + n], acc, taps_w[1], d,
                                   interpret=True, eo=True)
    ref = np.asarray(acc)

    monkeypatch.setattr(C, "compose_fits_vmem",
                        lambda th, w_, d_, eo=False, budget=0: th <= 16)
    out = np.asarray(_prepped_scan(link_stack, nb_stack, vol, taps_w,
                                   starts, [], d, eo=True))
    np.testing.assert_array_equal(out, ref)
