"""Pallas TPU kernel: fully fused Farneback iteration (UM + UF).

One Farneback fixed-point iteration is ``flow' = update_flow(
update_matrices(r0, r1, flow))`` (ops/farneback.py:222-231).  The separate
kernels round-trip the five constraint-matrix channels M through HBM on
every iteration -- 10 H*W floats of traffic per pixel per iteration, pure
overhead since M is consumed immediately.  This kernel keeps M in VMEM
scratch: phase 1 computes M per 128-lane x-block (displaced 5-channel
sampling via the two-window lane gather of ops/pallas/sample.py, then the
normal-equation arithmetic of ops/pallas/update_matrices.py); phase 2
box-aggregates M over the winsize window and solves the regularized 2x2
system, writing only the 2-channel flow to HBM.

Exactness notes (bitwise-matched against UF(UM(...)) in tests):

- The box filter replicates M at plane borders.  A replicated M row/column
  is NOT the same as M computed at a shifted position with edge-replicated
  inputs (the displaced-sampling pattern re-anchors), so border context is
  realized by *assembling* replicated edge rows/columns of true M values
  inside phase 2 -- never by recomputing M on padded inputs.
- Row tiles compute M only for TRUE plane rows [max(0, a-r), min(h, a+th+r));
  interior tiles therefore need no row assembly at all, and first/last tiles
  replicate exactly the plane-edge M row, preserving tile-size invariance.
- Columns: M is garbage beyond the true width (inputs are zero-padded to the
  lane-aligned width); right-shifted box reads anchor at the true width and
  replicate M(:, w_true-1), so garbage lanes only feed cropped outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowdenoising_tpu.ops.pallas.sample import (
    _round_up, _LANE, plane_row_tiles, pack_pairs, unpack_pair)
from flowdenoising_tpu.ops.pallas.update_matrices import _edge_weight

_VMEM_BUDGET_BYTES = 13 * 1024 * 1024
_CH = 5


def umuf_fits_vmem(th: int, w: int, d: int, winsize: int) -> bool:
    """Whether one batch program's operands + M scratch fit the VMEM budget."""
    m = d + 1
    r = winsize // 2
    hm = th + 2 * r
    w_out = _round_up(w, _LANE)
    w_src = w_out + _LANE
    needed = 4 * (_CH * (hm + 2 * m) * w_src      # r1 padded
                  + _CH * hm * w_out              # r0
                  + 2 * hm * w_out                # u, v
                  + _CH * hm * w_out              # M scratch
                  + _CH * hm * _LANE              # sampling accumulator
                  + 2 * th * w_out)               # flow out
    return needed <= _VMEM_BUDGET_BYTES


def _replicated_rows(m_ref, c: int, lo: int, n_rows: int, top: int, bot: int,
                     hm: int, w_out: int):
    """Rows [lo, lo+n_rows) of M channel c with ``top`` copies of the first
    true row prepended and ``bot`` copies of the last appended (all static)."""
    body = m_ref[c, lo:lo + n_rows, :]
    parts = []
    if top:
        parts.append(jnp.broadcast_to(m_ref[c, 0:1, :], (top, w_out)))
    parts.append(body)
    if bot:
        parts.append(jnp.broadcast_to(m_ref[c, hm - 1:hm, :], (bot, w_out)))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else body


def _umuf_kernel(r0_ref, r1p_ref, u_ref, v_ref, out_ref, m_ref, acc_ref, *,
                 d: int, winsize: int, th: int, hm: int, w_out: int,
                 w_true: int, a: int, m0: int, h_true: int,
                 packed: bool = False, xwin: bool = False):
    """One batch element.  r0/u/v cover M rows [m0, m0+hm); r1p additionally
    carries d+1 context rows per side; out covers output rows [a, a+th)."""
    m = d + 1
    r = winsize // 2
    n_blk = w_out // _LANE

    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    half = jnp.float32(0.5)
    quarter = jnp.float32(0.25)

    col = jax.lax.broadcasted_iota(jnp.int32, (hm, _LANE), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (hm, _LANE), 0) + m0
    row_w = _edge_weight(row, h_true)

    # ---- phase 1: M per x-block, written to VMEM scratch ----
    for blk in range(n_blk):
        x0 = blk * _LANE
        dx = u_ref[0, :, x0:x0 + _LANE]
        dy = v_ref[0, :, x0:x0 + _LANE]
        u = jnp.clip(dx, -float(d), float(d))
        v = jnp.clip(dy, -float(d), float(d))
        iu = jnp.floor(u)
        tu = u - iu
        iui = iu.astype(jnp.int32)

        x_abs = col + x0
        fx1 = jnp.floor(x_abs.astype(jnp.float32) + dx)
        fy1 = jnp.floor(row.astype(jnp.float32) + dy)
        inb = ((fx1 >= 0) & (fx1 <= w_true - 2)
               & (fy1 >= 0) & (fy1 <= h_true - 2))

        # Displaced 5-channel sampling with per-block dead-shift skipping
        # (see ops/pallas/update_matrices.py for the scheme).
        vmin = jnp.min(v)
        vmax = jnp.max(v)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if xwin:
            # Gather-free variant: the bilinear x-interpolation
            # g0 + (g1-g0)*tu  ==  sum_t max(0, 1-|u-t|) * src[x+t], so both
            # axes become static-shift windows with per-block dead-shift
            # skipping -- statically-offset column slices (cheap lane
            # rotations) + VPU fma, no DynamicGatherOp.  Exact for |u|<=d.
            umin = jnp.min(u)
            umax = jnp.max(u)
            for t in range(-d, d + 2):
                @pl.when((umin < t + 1) & (umax > t - 1))
                def _(t=t):
                    wx = jnp.maximum(zero, one - jnp.abs(u - t))
                    for s in range(-d, d + 2):
                        @pl.when((vmin < s + 1) & (vmax > s - 1))
                        def _(s=s, t=t, wx=wx):
                            wxy = wx * jnp.maximum(zero,
                                                   one - jnp.abs(v - s))
                            for c in range(_CH):
                                rows = r1p_ref[0, c, m + s:m + s + hm,
                                               pl.ds(x0 + m + t, _LANE)]
                                acc_ref[c] += wxy * rows
        else:
            l_idx = col + m + iui
            i_a0 = jnp.clip(l_idx, 0, _LANE - 1)
            i_b0 = jnp.clip(l_idx - _LANE, 0, _LANE - 1)
            use_b0 = l_idx >= _LANE
            if not packed:
                l1 = l_idx + 1
                i_a1 = jnp.clip(l1, 0, _LANE - 1)
                i_b1 = jnp.clip(l1 - _LANE, 0, _LANE - 1)
                use_b1 = l1 >= _LANE
            for s in range(-d, d + 2):
                @pl.when((vmin < s + 1) & (vmax > s - 1))
                def _(s=s):
                    wy = jnp.maximum(zero, one - jnp.abs(v - s))
                    for c in range(_CH):
                        rows_a = r1p_ref[0, c, m + s:m + s + hm,
                                         pl.ds(x0, _LANE)]
                        rows_b = r1p_ref[0, c, m + s:m + s + hm,
                                         pl.ds(x0 + _LANE, _LANE)]
                        ga0 = jnp.take_along_axis(rows_a, i_a0, axis=1,
                                                  mode="promise_in_bounds")
                        gb0 = jnp.take_along_axis(rows_b, i_b0, axis=1,
                                                  mode="promise_in_bounds")
                        g0 = jnp.where(use_b0, gb0, ga0)
                        if packed:
                            # One bf16-pair gather yields both x-neighbors.
                            g0, g1 = unpack_pair(g0)
                        else:
                            ga1 = jnp.take_along_axis(rows_a, i_a1, axis=1,
                                                      mode="promise_in_bounds")
                            gb1 = jnp.take_along_axis(rows_b, i_b1, axis=1,
                                                      mode="promise_in_bounds")
                            g1 = jnp.where(use_b1, gb1, ga1)
                        acc_ref[c] += wy * (g0 + (g1 - g0) * tu)

        r00 = r0_ref[0, 0, :, x0:x0 + _LANE]
        r01 = r0_ref[0, 1, :, x0:x0 + _LANE]
        r02 = r0_ref[0, 2, :, x0:x0 + _LANE]
        r03 = r0_ref[0, 3, :, x0:x0 + _LANE]
        r04 = r0_ref[0, 4, :, x0:x0 + _LANE]

        r4 = jnp.where(inb, (r02 + acc_ref[2]) * half, r02)
        r5 = jnp.where(inb, (r03 + acc_ref[3]) * half, r03)
        r6 = jnp.where(inb, (r04 + acc_ref[4]) * quarter, r04 * half)
        r2 = (r00 - jnp.where(inb, acc_ref[0], zero)) * half + r4 * dy + r6 * dx
        r3 = (r01 - jnp.where(inb, acc_ref[1], zero)) * half + r6 * dy + r5 * dx

        scale = _edge_weight(x_abs, w_true) * row_w
        r2 = r2 * scale
        r3 = r3 * scale
        r4 = r4 * scale
        r5 = r5 * scale
        r6 = r6 * scale

        m_ref[0, :, x0:x0 + _LANE] = r4 * r4 + r6 * r6
        m_ref[1, :, x0:x0 + _LANE] = (r4 + r5) * r6
        m_ref[2, :, x0:x0 + _LANE] = r5 * r5 + r6 * r6
        m_ref[3, :, x0:x0 + _LANE] = r4 * r2 + r6 * r3
        m_ref[4, :, x0:x0 + _LANE] = r6 * r2 + r5 * r3

    # ---- phase 2: box aggregation + 2x2 solve, full width ----
    inv = jnp.float32(1.0 / float(winsize * winsize))
    sums = []
    for c in range(_CH):
        vacc = None
        for o in range(-r, r + 1):
            # output row i reads M plane rows clamp(a+i+o, m0, m0+hm-1)
            top = max(0, m0 - (a + o))
            bot = max(0, (a + th + o) - (m0 + hm))
            lo = max(0, a + o - m0)
            rows_o = _replicated_rows(m_ref, c, lo, th - top - bot, top, bot,
                                      hm, w_out)
            vacc = rows_o if vacc is None else vacc + rows_o
        hacc = None
        for o in range(-r, r + 1):
            if o == 0:
                sh = vacc
            elif o < 0:
                sh = jnp.concatenate(
                    [jnp.broadcast_to(vacc[:, 0:1], (th, -o)),
                     vacc[:, 0:w_out + o]], axis=1)
            else:
                # anchor at the true width: columns beyond it hold garbage
                fill = w_out - (w_true - o)
                sh = jnp.concatenate(
                    [vacc[:, o:w_true],
                     jnp.broadcast_to(vacc[:, w_true - 1:w_true], (th, fill))],
                    axis=1)
            hacc = sh if hacc is None else hacc + sh
        sums.append(hacc * inv)

    g11, g12, g22, h1, h2 = sums
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    out_ref[0, 0] = (g11 * h2 - g12 * h1) * idet
    out_ref[0, 1] = (g22 * h1 - g12 * h2) * idet


def _umuf_call(r0_t, r1_t, u_t, v_t, *, d: int, winsize: int, th: int,
               a: int, m0: int, h_true: int, w: int, interpret: bool,
               packed: bool = False, xwin: bool = False):
    b, c, hm, _ = r0_t.shape
    m = d + 1
    w_out = _round_up(w, _LANE)
    w_src = w_out + _LANE
    r1p = jnp.pad(r1_t.astype(jnp.float32),
                  ((0, 0), (0, 0), (0, 0), (m, w_src - w - m)), mode="edge")
    if packed:
        r1p = pack_pairs(r1p)
    pad_xy = ((0, 0), (0, 0), (0, w_out - w))
    u_p = jnp.pad(u_t.astype(jnp.float32), pad_xy)
    v_p = jnp.pad(v_t.astype(jnp.float32), pad_xy)
    r0_p = jnp.pad(r0_t.astype(jnp.float32),
                   ((0, 0), (0, 0), (0, 0), (0, w_out - w)))

    out = pl.pallas_call(
        functools.partial(_umuf_kernel, d=d, winsize=winsize, th=th, hm=hm,
                          w_out=w_out, w_true=w, a=a, m0=m0, h_true=h_true,
                          packed=packed, xwin=xwin),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, _CH, hm, w_out), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _CH, hm + 2 * m, w_src), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hm, w_out), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hm, w_out), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, th, w_out), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, th, w_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_CH, hm, w_out), jnp.float32),
                        pltpu.VMEM((_CH, hm, _LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r0_p, r1p, u_p, v_p)
    return out[:, :, :, :w]


@functools.partial(jax.jit,
                   static_argnames=("max_displacement", "winsize", "interpret",
                                    "packed", "xwin"))
def _umuf_pallas_cf(r0: jnp.ndarray, r1: jnp.ndarray,
                    u: jnp.ndarray, v: jnp.ndarray,
                    max_displacement: int, winsize: int,
                    interpret: bool = False, packed: bool = False,
                    xwin: bool = False):
    """Channel-first fused iteration.  r0, r1: (B, 5, H, W); u, v: (B, H, W)
    -> flow (B, 2, H, W).  Row-tiled with exact M-row context."""
    b, c, h, w = r0.shape
    assert c == _CH
    d = int(max_displacement)
    m = d + 1
    r = winsize // 2

    r1p_plane = jnp.pad(r1, ((0, 0), (0, 0), (m, m), (0, 0)), mode="edge")
    tiles = plane_row_tiles(h, lambda th: umuf_fits_vmem(th, w, d, winsize))
    outs = []
    for a, th in tiles:
        m0 = max(0, a - r)
        m1 = min(h, a + th + r)
        outs.append(_umuf_call(
            r0[:, :, m0:m1], r1p_plane[:, :, m0:m1 + 2 * m],
            u[:, m0:m1], v[:, m0:m1],
            d=d, winsize=winsize, th=th, a=a, m0=m0, h_true=h, w=w,
            interpret=interpret, packed=packed, xwin=xwin))
    if len(outs) == 1:
        return outs[0]
    return jnp.concatenate(outs, axis=2)


def umuf_pallas(r0: jnp.ndarray, r1: jnp.ndarray, flow: jnp.ndarray,
                max_displacement: int, winsize: int,
                interpret: bool = False, packed: bool = False,
                xwin: bool = False) -> jnp.ndarray:
    """Fused Farneback iteration, channels-last API.

    r0, r1: (..., H, W, 5) polynomial expansions; flow: (..., H, W, 2).
    Returns the updated flow (..., H, W, 2); numerically identical to
    ``update_flow(update_matrices(r0, r1, flow, d), winsize)``.  ``packed``
    samples the reference expansion at bfloat16 precision with half the
    gathers (the fast mode; flow differences are sub-1e-2 px).
    """
    lead = r0.shape[:-3]
    h, w = r0.shape[-3], r0.shape[-2]
    r0cf = jnp.moveaxis(r0, -1, -3).reshape((-1, _CH, h, w))
    r1cf = jnp.moveaxis(r1, -1, -3).reshape((-1, _CH, h, w))
    u = flow[..., 0].reshape((-1, h, w))
    v = flow[..., 1].reshape((-1, h, w))
    f = _umuf_pallas_cf(r0cf, r1cf, u, v, max_displacement, winsize, interpret,
                        packed, xwin)
    f = f.reshape(lead + (2, h, w))
    return jnp.moveaxis(f, -3, -1)
