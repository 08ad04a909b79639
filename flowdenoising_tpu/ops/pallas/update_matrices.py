"""Pallas TPU kernel: fused Farneback constraint-matrix update.

Fuses the displaced 5-channel sampling of the reference image's polynomial
expansion (see ops/pallas/sample.py for the two-window lane-gather scheme)
with the per-pixel normal-equation arithmetic of
``ops.farneback.update_matrices``: out-of-bounds masking, quadratic-term
averaging, border down-weighting, and the G/h products.  Compared to the
composed XLA form this removes a full 5-channel HBM round trip (sampled
values never leave VMEM) plus several elementwise kernel launches per
update -- and update_matrices runs ~200x per voxel-pass, so it dominates
the pipeline.

Grid: (batch, x-block).  The padded reference plane is revisited (same
block indices) across x-blocks, so Pallas keeps it resident in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowdenoising_tpu.ops.pallas.sample import (
    _round_up, _LANE, pack_pairs, unpack_pair)

_VMEM_BUDGET_BYTES = 13 * 1024 * 1024
_BORDER_RAMP = (0.14, 0.14, 0.4472, 0.4472, 0.4472)
_BORDER = 5
_CH = 5


def um_fits_vmem(h: int, w: int, d: int) -> bool:
    m = d + 1
    w_src = _round_up(w, _LANE) + _LANE
    r1p = _CH * (h + 2 * m) * w_src
    per_block = (_CH * h * _LANE) * 2 + 2 * h * _LANE + 6 * h * _LANE
    return 4 * (r1p + per_block) <= _VMEM_BUDGET_BYTES


def _edge_weight(pos: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Border down-weighting factor for a pixel coordinate array."""
    wgt = jnp.ones_like(pos, dtype=jnp.float32)
    for i in range(_BORDER):
        r = jnp.float32(_BORDER_RAMP[i])
        wgt = jnp.where(pos == i, wgt * r, wgt)
        wgt = jnp.where(pos == extent - 1 - i, wgt * r, wgt)
    return wgt


def _um_kernel(r0_ref, r1p_ref, u_ref, v_ref, out_ref, acc_ref, *, d: int,
               h: int, w_true: int, y0: int, h_true: int,
               packed: bool = False):
    m = d + 1
    xb = pl.program_id(1)
    x0 = xb * _LANE

    dx = u_ref[0]
    dy = v_ref[0]
    u = jnp.clip(dx, -float(d), float(d))
    v = jnp.clip(dy, -float(d), float(d))
    iu = jnp.floor(u)
    tu = u - iu
    iui = iu.astype(jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (h, _LANE), 1)
    # Global row index: y0 is the tile's first output row within the plane.
    row = jax.lax.broadcasted_iota(jnp.int32, (h, _LANE), 0) + y0
    x_abs = col + x0

    # In-bounds test on the *unclamped* displaced coordinates (OpenCV
    # semantics: cvFloor(x+dx) in [0, W-2], cvFloor(y+dy) in [0, H-2]).
    fx1 = jnp.floor(x_abs.astype(jnp.float32) + dx)
    fy1 = jnp.floor(row.astype(jnp.float32) + dy)
    inb = ((fx1 >= 0) & (fx1 <= w_true - 2) & (fy1 >= 0) & (fy1 <= h_true - 2))

    # Gather indices (two aligned 128-wide windows; see sample.py).
    l_idx = col + m + iui
    i_a0 = jnp.clip(l_idx, 0, _LANE - 1)
    i_b0 = jnp.clip(l_idx - _LANE, 0, _LANE - 1)
    use_b0 = l_idx >= _LANE
    if not packed:
        l1 = l_idx + 1
        i_a1 = jnp.clip(l1, 0, _LANE - 1)
        i_b1 = jnp.clip(l1 - _LANE, 0, _LANE - 1)
        use_b1 = l1 >= _LANE

    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)

    # Accumulate the 5 sampled channels in scratch; skip row shifts whose hat
    # weight is zero for every pixel of this block (flows are smooth and
    # usually sub-pixel, so most of the 2D+2 shifts are dead per block).
    # The shift loop is a static unroll: Mosaic requires 8-aligned dynamic
    # sublane starts, so it cannot be a fori_loop with pl.ds(m+s, h); the
    # unroll's stack cost is covered by the raised vmem_limit_bytes.
    vmin = jnp.min(v)
    vmax = jnp.max(v)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for s in range(-d, d + 2):
        @pl.when((vmin < s + 1) & (vmax > s - 1))
        def _(s=s):
            wy = jnp.maximum(zero, one - jnp.abs(v - s))
            for c in range(_CH):
                rows_a = r1p_ref[0, c, m + s:m + s + h, pl.ds(x0, _LANE)]
                rows_b = r1p_ref[0, c, m + s:m + s + h, pl.ds(x0 + _LANE, _LANE)]
                ga0 = jnp.take_along_axis(rows_a, i_a0, axis=1, mode="promise_in_bounds")
                gb0 = jnp.take_along_axis(rows_b, i_b0, axis=1, mode="promise_in_bounds")
                g0 = jnp.where(use_b0, gb0, ga0)
                if packed:
                    # One bf16-pair gather yields both x-neighbors.
                    g0, g1 = unpack_pair(g0)
                else:
                    ga1 = jnp.take_along_axis(rows_a, i_a1, axis=1, mode="promise_in_bounds")
                    gb1 = jnp.take_along_axis(rows_b, i_b1, axis=1, mode="promise_in_bounds")
                    g1 = jnp.where(use_b1, gb1, ga1)
                acc_ref[c] += wy * (g0 + (g1 - g0) * tu)

    s0 = acc_ref[0]
    s1 = acc_ref[1]
    s2 = acc_ref[2]
    s3 = acc_ref[3]
    s4 = acc_ref[4]

    r00 = r0_ref[0, 0]
    r01 = r0_ref[0, 1]
    r02 = r0_ref[0, 2]
    r03 = r0_ref[0, 3]
    r04 = r0_ref[0, 4]

    half = jnp.float32(0.5)
    quarter = jnp.float32(0.25)
    r4 = jnp.where(inb, (r02 + s2) * half, r02)
    r5 = jnp.where(inb, (r03 + s3) * half, r03)
    r6 = jnp.where(inb, (r04 + s4) * quarter, r04 * half)
    r2 = (r00 - jnp.where(inb, s0, zero)) * half + r4 * dy + r6 * dx
    r3 = (r01 - jnp.where(inb, s1, zero)) * half + r6 * dy + r5 * dx

    scale = _edge_weight(x_abs, w_true) * _edge_weight(row, h_true)
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    out_ref[0, 0] = r4 * r4 + r6 * r6
    out_ref[0, 1] = (r4 + r5) * r6
    out_ref[0, 2] = r5 * r5 + r6 * r6
    out_ref[0, 3] = r4 * r2 + r6 * r3
    out_ref[0, 4] = r6 * r2 + r5 * r3


def _um_call(r0_t, r1_rows, u_t, v_t, d: int, y0: int, h_true: int,
             w: int, interpret: bool, packed: bool = False):
    """Kernel invocation on a row tile.

    r0_t/u_t/v_t cover the tile's output rows; r1_rows additionally carries
    M true context rows per side.  y0/h_true anchor border weights and the
    in-bounds test to plane-global coordinates.
    """
    b, c, h, _ = r0_t.shape
    m = d + 1
    w_out = _round_up(w, _LANE)
    w_src = w_out + _LANE
    r1p = jnp.pad(r1_rows.astype(jnp.float32),
                  ((0, 0), (0, 0), (0, 0), (m, w_src - w - m)), mode="edge")
    if packed:
        r1p = pack_pairs(r1p)
    pad_xy = ((0, 0), (0, 0), (0, w_out - w))
    u_p = jnp.pad(u_t.astype(jnp.float32), pad_xy)
    v_p = jnp.pad(v_t.astype(jnp.float32), pad_xy)
    r0_p = jnp.pad(r0_t.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, w_out - w)))

    grid = (b, w_out // _LANE)
    out = pl.pallas_call(
        functools.partial(_um_kernel, d=d, h=h, w_true=w, y0=y0, h_true=h_true,
                          packed=packed),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _CH, h, _LANE), lambda bb, xb: (bb, 0, 0, xb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _CH, h + 2 * m, w_src), lambda bb, xb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, _LANE), lambda bb, xb: (bb, 0, xb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, _LANE), lambda bb, xb: (bb, 0, xb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _CH, h, _LANE), lambda bb, xb: (bb, 0, 0, xb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, _CH, h, w_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_CH, h, _LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r0_p, r1p, u_p, v_p)
    return out[:, :, :, :w]


@functools.partial(jax.jit,
                   static_argnames=("max_displacement", "interpret", "packed"))
def _update_matrices_pallas_cf(r0: jnp.ndarray, r1: jnp.ndarray,
                               u: jnp.ndarray, v: jnp.ndarray,
                               max_displacement: int, interpret: bool = False,
                               packed: bool = False):
    """Channel-first fused UM.  r0, r1: (B, 5, H, W); u, v: (B, H, W).

    Large planes are processed in row tiles with exact overlapping context
    (see sample.plane_row_tiles); tiling never changes results.
    """
    from flowdenoising_tpu.ops.pallas.sample import plane_row_tiles

    b, c, h, w = r0.shape
    assert c == _CH
    d = int(max_displacement)
    m = d + 1

    r1_rows_p = jnp.pad(r1, ((0, 0), (0, 0), (m, m), (0, 0)), mode="edge")
    tiles = plane_row_tiles(h, lambda th: um_fits_vmem(th, w, d))
    outs = []
    for a, th in tiles:
        r1_rows = jax.lax.dynamic_slice_in_dim(r1_rows_p, a, th + 2 * m, axis=2)
        outs.append(_um_call(r0[:, :, a:a + th], r1_rows,
                             u[:, a:a + th], v[:, a:a + th],
                             d, a, h, w, interpret, packed))
    if len(outs) == 1:
        return outs[0]
    return jnp.concatenate(outs, axis=2)


def update_matrices_pallas(r0: jnp.ndarray, r1: jnp.ndarray, flow: jnp.ndarray,
                           max_displacement: int,
                           interpret: bool = False,
                           packed: bool = False) -> jnp.ndarray:
    """Fused UM, channels-last API: r0, r1 (..., H, W, 5), flow (..., H, W, 2)
    -> M (..., H, W, 5).  ``packed`` selects the bf16 pair-gather fast path
    (reference expansion sampled at bfloat16 precision, half the gathers)."""
    lead = r0.shape[:-3]
    h, w = r0.shape[-3], r0.shape[-2]
    r0cf = jnp.moveaxis(r0, -1, -3).reshape((-1, _CH, h, w))
    r1cf = jnp.moveaxis(r1, -1, -3).reshape((-1, _CH, h, w))
    u = flow[..., 0].reshape((-1, h, w))
    v = flow[..., 1].reshape((-1, h, w))
    m = _update_matrices_pallas_cf(r0cf, r1cf, u, v, max_displacement,
                                   interpret, packed)
    m = m.reshape(lead + (_CH, h, w))
    return jnp.moveaxis(m, -3, -1)
