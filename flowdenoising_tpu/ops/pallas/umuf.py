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
# dyn mode: extra r1 pad rows so the 8-aligned dynamic window (rounded up to
# a sublane multiple of 8, i.e. up to hm+14 rows) never overruns the buffer
_DYN_PAD = 16


def umuf_fits_vmem(th: int, w: int, d: int, winsize: int,
                   iters: int = 1, eo: int = 0) -> bool:
    """Whether one batch program's operands + M scratch fit the VMEM budget."""
    m = d + 1
    r = winsize // 2
    hm = th + 2 * r * iters
    w_out = _round_up(w, _LANE)
    w_src = w_out + _LANE
    if eo:
        # even/odd deinterleaved r1: eo=1 -> 4 planes (2 parities x 2 phase
        # copies, ~2x the interleaved operand); eo=2 -> 2 planes (no phase
        # copies, ~1x, unaligned lane windows)
        w_src = (4 if eo == 1 else 2) * _round_up(w_src // 2, _LANE)
    needed = 4 * (_CH * (hm + 2 * m + _DYN_PAD) * w_src  # r1 (+dyn pad rows)
                  + _CH * hm * w_out              # r0
                  + 2 * hm * w_out                # u, v
                  + _CH * hm * w_out              # M scratch
                  + _CH * hm * _LANE              # sampling accumulator
                  + th * hm + min(w_out, 512) ** 2  # mxu box matrices
                  + (2 * hm * w_out if iters > 1 else 0)  # flow carry scratch
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


def _umuf_kernel(r0_ref, r1p_ref, u_ref, v_ref, *rest,
                 d: int, winsize: int, th: int, hm: int, w_out: int,
                 w_true: int, a: int, m0: int, h_true: int, iters: int = 1,
                 packed: bool = False, xwin: bool = False,
                 dyn: bool = False, mxu: bool = False,
                 rg: int = 0, eo: int = 0, zero_tail: bool = False,
                 _phases: str = "both"):
    """One batch element.  r0/u/v cover M rows [m0, m0+hm); r1p additionally
    carries d+1 context rows per side; out covers output rows [a, a+th).

    ``iters``: number of chained Farneback iterations run INSIDE the program.
    The flow carry lives in VMEM scratch (f_ref); intermediate iterations
    rebuild M and solve over the full hm-row range, the last one solves only
    the output rows.  The caller extends the tile's row context by
    ``r*iters`` (not r), so output rows are bitwise-identical to running
    iterations as separate programs over the whole plane: tile-edge rows
    whose box window sees synthetically replicated M go wrong, but the
    wrongness creeps inward at most r rows per iteration and never reaches
    [a, a+th).
    ``dyn``: the y-shift loop runs as a lax.fori_loop over the block's TRUE
    active shift range (dynamic trip count) instead of a statically unrolled
    predicated loop -- @pl.when bodies execute regardless of their runtime
    predicate on Mosaic, so the static form pays for all 2d+2 shifts.
    ``mxu``: phase 2's box aggregation runs as two banded 0/1 matmuls
    (Bh @ M @ Bw) on the MXU, border replication folded into the band
    weights, instead of ~50 full-plane VPU shift-adds.
    ``eo``: r1p is stored column-DEINTERLEAVED (planes [E0, O0, E64, O64]:
    even/odd columns, plus 64-entry-shifted phase copies so every 128-lane
    block finds an aligned window).  The bilinear x-pair (l, l+1) always
    splits one-each across E and O, and the per-parity gather indices
    ((l+1)>>1 into E, l>>1 into O) span only [0, 64+d] -- a single-vreg
    gather per neighbor, so each trip needs 2 lane gathers instead of 4
    (plus two parity selects replacing the two window selects).
    """
    if mxu:
        if iters > 1:
            bh_ref, bhf_ref, bw_ref = rest[:3]
            rest = rest[3:]
        else:
            bh_ref, bw_ref = rest[:2]
            bhf_ref = None
            rest = rest[2:]
    out_ref, m_ref, acc_ref = rest[:3]
    f_ref = rest[3] if iters > 1 else None
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

    if _phases == "none":
        # probe mode: pure pipeline/DMA floor
        out_ref[0, 0] = u_ref[0, :th, :]
        out_ref[0, 1] = v_ref[0, :th, :]
        return

    _phase1_phase2(
        r0_ref=r0_ref, r1p_ref=r1p_ref, u_ref=u_ref, v_ref=v_ref,
        out_ref=out_ref, m_ref=m_ref, acc_ref=acc_ref, f_ref=f_ref,
        bh_ref=bh_ref if mxu else None, bhf_ref=bhf_ref if mxu else None,
        bw_ref=bw_ref if mxu else None,
        d=d, winsize=winsize, th=th, hm=hm, w_out=w_out, w_true=w_true,
        a=a, m0=m0, h_true=h_true, iters=iters, packed=packed, xwin=xwin,
        dyn=dyn, mxu=mxu, rg=rg, eo=eo, zero_tail=zero_tail, _phases=_phases,
        col=col, row=row, row_w=row_w, n_blk=n_blk,
        consts=(zero, one, half, quarter))


def _phase1_phase2(*, r0_ref, r1p_ref, u_ref, v_ref, out_ref, m_ref, acc_ref,
                   f_ref, bh_ref, bhf_ref, bw_ref, d, winsize, th, hm, w_out,
                   w_true, a, m0, h_true, iters, packed, xwin, dyn, mxu, rg,
                   eo, zero_tail, _phases, col, row, row_w, n_blk, consts):
    if eo:
        assert dyn and not packed and not xwin, \
            "eo sampling requires the dyn path (f32, non-xwin)"
    zero, one, half, quarter = consts
    m = d + 1
    r = winsize // 2

    def phase1(read_uv):
        # ---- phase 1: M per x-block, written to VMEM scratch ----
        if _phases == "p2":
            # probe mode: skip sampling, fill M from r0 directly
            for c in range(_CH):
                m_ref[c] = r0_ref[0, c]
            return
        for blk in range(n_blk):
            _phase1_block(blk, read_uv)

    def _phase1_block(blk, read_uv):
        x0 = blk * _LANE
        dx, dy = read_uv(x0)
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
            if eo:
                # parity and per-parity single-vreg gather indices
                # (trip-invariant): the bilinear pair (l, l+1) is always one
                # even + one odd column; indices span [0, 64+d] < 128.
                i_e = jnp.clip((l_idx + 1) >> 1, 0, _LANE - 1)
                i_o = jnp.clip(l_idx >> 1, 0, _LANE - 1)
                par = (l_idx & 1) == 0
            i_a0 = jnp.clip(l_idx, 0, _LANE - 1)
            i_b0 = jnp.clip(l_idx - _LANE, 0, _LANE - 1)
            use_b0 = l_idx >= _LANE
            if not packed:
                l1 = l_idx + 1
                i_a1 = jnp.clip(l1, 0, _LANE - 1)
                i_b1 = jnp.clip(l1 - _LANE, 0, _LANE - 1)
                use_b1 = l1 >= _LANE
            def _take(rows, idx):
                if _phases == "p1nog":
                    # probe mode: skip the DynamicGatherOp, keep everything
                    # else (rolls, selects, weights, fma) -- isolates the
                    # gather cost in context
                    return rows
                return jnp.take_along_axis(rows, idx, axis=1,
                                           mode="promise_in_bounds")

            def _gather_term(rows_of_c, wy, tug, ia0, ib0, ub0, idx1):
                # bilinear weights folded with the hat weight ONCE per trip
                # (w0 = wy*(1-tu), w1 = wy*tu) so the per-channel work is two
                # fma instead of sub+fma+mul
                w1 = wy * tug
                w0 = wy - w1
                terms = []
                for c in range(_CH):
                    rows_a, rows_b = rows_of_c(c)
                    ga0 = _take(rows_a, ia0)
                    gb0 = _take(rows_b, ib0)
                    g0 = jnp.where(ub0, gb0, ga0)
                    if packed:
                        g0, g1 = unpack_pair(g0)
                    else:
                        ia1, ib1, ub1 = idx1
                        ga1 = _take(rows_a, ia1)
                        gb1 = _take(rows_b, ib1)
                        g1 = jnp.where(ub1, gb1, ga1)
                    terms.append(g0 * w0 + g1 * w1)
                return terms

            def _gather_term_eo(rows_of_c, wy, tug, ie, io, parity):
                # deinterleaved sampling: one gather per bilinear neighbor
                # (rows_of_c returns the block's rolled E and O windows);
                # parity routes (g0, g1) = even l ? (E, O) : (O, E).
                # (Swapping the WEIGHTS by parity once per trip instead of
                # the gathered values per channel measured 0% on hardware
                # and loses bitwise identity to the base path through fma
                # contraction order -- keep the value selects.)
                w1 = wy * tug
                w0 = wy - w1
                terms = []
                for c in range(_CH):
                    rows_e, rows_o = rows_of_c(c)
                    ge = _take(rows_e, ie)
                    go = _take(rows_o, io)
                    g0 = jnp.where(parity, ge, go)
                    g1 = jnp.where(parity, go, ge)
                    terms.append(g0 * w0 + g1 * w1)
                return terms

            def _s_accum(rows_of_c, s_f):
                wy = jnp.maximum(zero, one - jnp.abs(v - s_f))
                if eo:
                    terms = _gather_term_eo(rows_of_c, wy, tu, i_e, i_o, par)
                else:
                    terms = _gather_term(
                        rows_of_c, wy, tu, i_a0, i_b0, use_b0,
                        None if packed else (i_a1, i_b1, use_b1))
                for c in range(_CH):
                    acc_ref[c] += terms[c]

            # eo window plane indices/base (static per block): eo=1 -- even
            # blocks read the [E0, O0] planes at aligned base (blk//2)*128,
            # odd blocks the 64-shifted [E64, O64] planes at the same base;
            # eo=2 -- two planes only, window at (possibly 64-offset)
            # base blk*64 (Mosaic relayouts the unaligned lane slice).
            if eo == 1:
                eo_ph = 2 * (blk & 1)
                eo_base = (blk // 2) * _LANE
            elif eo:
                eo_ph = 0
                eo_base = blk * (_LANE // 2)

            if dyn and rg:
                # Row groups: the y-shift trip count is set by the TRUE flow
                # range of the rows it covers.  A whole-block (hm x 128)
                # vmin/vmax pays for the union range of ~200 rows; per-group
                # windows (rg rows each) only pay each group's local range --
                # on noisy/wavy real-volume flows that's a large trip-count
                # reduction (bitwise-identical: skipped terms have zero
                # bilinear weight).  Mosaic's gather lowering wants
                # 8-row-aligned operands, so the per-pixel sampling arrays
                # are edge-padded to hm8 rows and all groups sized in
                # multiples of 8; padded rows are sliced off before the
                # accumulate.
                assert rg % 8 == 0, "row-group height must be 8-aligned"
                hm8 = _round_up(hm, 8)
                pad_r = hm8 - hm

                def _pad8(x):
                    # edge-pad to 8-aligned rows; int32/f32 only (Mosaic's
                    # relayout cannot bitcast i1 vregs, so bool masks are
                    # re-derived per group from the padded int indices)
                    if pad_r == 0:
                        return x
                    return jnp.concatenate(
                        [x, jnp.broadcast_to(x[hm - 1:hm], (pad_r, _LANE))],
                        axis=0)

                v8, tu8 = _pad8(v), _pad8(tu)
                l_idx8 = _pad8(l_idx)
                for ga in range(0, hm8, rg):
                    gb = min(ga + rg, hm8)
                    gn = gb - ga
                    gv = min(gb, hm)  # true rows to accumulate
                    vg = v8[ga:gb]
                    tug = tu8[ga:gb]
                    # per-group index/mask arrays, hoisted out of the shift
                    # loop (the whole-block path recomputes nothing per
                    # shift either -- total clip work is unchanged)
                    lg = l_idx8[ga:gb]
                    if eo:
                        ieg = jnp.clip((lg + 1) >> 1, 0, _LANE - 1)
                        iog = jnp.clip(lg >> 1, 0, _LANE - 1)
                        parg = (lg & 1) == 0
                    else:
                        ia0g = jnp.clip(lg, 0, _LANE - 1)
                        ib0g = jnp.clip(lg - _LANE, 0, _LANE - 1)
                        ub0g = lg >= _LANE
                        if not packed:
                            l1g = lg + 1
                            idx1g = (jnp.clip(l1g, 0, _LANE - 1),
                                     jnp.clip(l1g - _LANE, 0, _LANE - 1),
                                     l1g >= _LANE)
                        else:
                            idx1g = None
                    s_lo = jnp.floor(jnp.min(vg)).astype(jnp.int32)
                    s_hi = jnp.floor(jnp.max(vg)).astype(jnp.int32) + 1
                    nw = _round_up(gn + 7, 8)

                    if eo:
                        def s_body(sv, carry, ga=ga, gn=gn, gv=gv, nw=nw,
                                   vg=vg, tug=tug, ieg=ieg, iog=iog,
                                   parg=parg):
                            base = ga + m + sv
                            aligned = pl.multiple_of((base // 8) * 8, 8)
                            off = base - aligned
                            shift = jax.lax.rem(nw - off, nw)

                            def rows_of_c(c):
                                we = r1p_ref[0, c, eo_ph, pl.ds(aligned, nw),
                                             pl.ds(eo_base, _LANE)]
                                wo = r1p_ref[0, c, eo_ph + 1,
                                             pl.ds(aligned, nw),
                                             pl.ds(eo_base, _LANE)]
                                return (pltpu.roll(we, shift, axis=0)[:gn],
                                        pltpu.roll(wo, shift, axis=0)[:gn])
                            s_f = sv.astype(jnp.float32)
                            wy = jnp.maximum(zero, one - jnp.abs(vg - s_f))
                            terms = _gather_term_eo(rows_of_c, wy, tug,
                                                    ieg, iog, parg)
                            for c in range(_CH):
                                acc_ref[c, ga:gv] += terms[c][:gv - ga]
                            return carry
                    else:
                        def s_body(sv, carry, ga=ga, gn=gn, gv=gv, nw=nw,
                                   vg=vg, tug=tug, ia0g=ia0g, ib0g=ib0g,
                                   ub0g=ub0g, idx1g=idx1g):
                            base = ga + m + sv
                            aligned = pl.multiple_of((base // 8) * 8, 8)
                            off = base - aligned
                            shift = jax.lax.rem(nw - off, nw)

                            def rows_of_c(c):
                                wa = r1p_ref[0, c, pl.ds(aligned, nw),
                                             pl.ds(x0, _LANE)]
                                wb = r1p_ref[0, c, pl.ds(aligned, nw),
                                             pl.ds(x0 + _LANE, _LANE)]
                                return (pltpu.roll(wa, shift, axis=0)[:gn],
                                        pltpu.roll(wb, shift, axis=0)[:gn])
                            s_f = sv.astype(jnp.float32)
                            wy = jnp.maximum(zero, one - jnp.abs(vg - s_f))
                            terms = _gather_term(rows_of_c, wy, tug, ia0g,
                                                 ib0g, ub0g, idx1g)
                            for c in range(_CH):
                                acc_ref[c, ga:gv] += terms[c][:gv - ga]
                            return carry

                    jax.lax.fori_loop(s_lo, s_hi + 1, s_body, 0)
            elif dyn:
                s_lo = jnp.floor(vmin).astype(jnp.int32)
                s_hi = jnp.floor(vmax).astype(jnp.int32) + 1
                # window row count must be sublane-aligned (Mosaic's
                # dynamic_rotate rejects unaligned shapes); covers the sub-8
                # offset (< 8 rows) after rounding
                nw = _round_up(hm + 7, 8)

                def rows_for(sv):
                    # Mosaic requires dynamic sublane starts to be 8-aligned:
                    # read an aligned window of hm+8 rows (r1p carries pad
                    # rows in dyn mode) and roll the sub-8 offset away.  No
                    # wraparound reaches rows [0, hm).
                    base = m + sv
                    aligned = pl.multiple_of((base // 8) * 8, 8)
                    off = base - aligned
                    shift = jax.lax.rem(nw - off, nw)

                    def rows_of_c_eo(c):
                        we = r1p_ref[0, c, eo_ph, pl.ds(aligned, nw),
                                     pl.ds(eo_base, _LANE)]
                        wo = r1p_ref[0, c, eo_ph + 1, pl.ds(aligned, nw),
                                     pl.ds(eo_base, _LANE)]
                        return (pltpu.roll(we, shift, axis=0)[:hm],
                                pltpu.roll(wo, shift, axis=0)[:hm])

                    def rows_of_c(c):
                        wa = r1p_ref[0, c, pl.ds(aligned, nw),
                                     pl.ds(x0, _LANE)]
                        wb = r1p_ref[0, c, pl.ds(aligned, nw),
                                     pl.ds(x0 + _LANE, _LANE)]
                        return (pltpu.roll(wa, shift, axis=0)[:hm],
                                pltpu.roll(wb, shift, axis=0)[:hm])
                    return rows_of_c_eo if eo else rows_of_c

                def s_body(sv, carry):
                    _s_accum(rows_for(sv), sv.astype(jnp.float32))
                    return carry

                jax.lax.fori_loop(s_lo, s_hi + 1, s_body, 0)
            else:
                for s in range(-d, d + 2):
                    @pl.when((vmin < s + 1) & (vmax > s - 1))
                    def _(s=s):
                        def rows_of_c(c):
                            return (r1p_ref[0, c, m + s:m + s + hm,
                                            pl.ds(x0, _LANE)],
                                    r1p_ref[0, c, m + s:m + s + hm,
                                            pl.ds(x0 + _LANE, _LANE)])
                        _s_accum(rows_of_c, jnp.float32(s))
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

    def phase2(bh_like, a2, th2):
        # ---- phase 2: box aggregation + 2x2 solve, full width, output
        # rows [a2, a2+th2) ----
        inv = jnp.float32(1.0 / float(winsize * winsize))
        if mxu:
            # Box aggregation as two banded matmuls per channel on the MXU:
            # sums[c] = (Bh @ M[c] @ Bw) * inv, with the border-replication
            # multiplicities folded into the 0/1/2/3 band weights (built on
            # the host in _box_mats).  Frees the VPU for phase 1 and replaces
            # ~50 full-plane shift-add ops with 2 matmuls per channel.
            bh = bh_like[...]
            bw = bw_ref[...]
            sums = []
            for c in range(_CH):
                vc = jax.lax.dot_general(
                    bh, m_ref[c], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                hc = jax.lax.dot_general(
                    vc, bw, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                sums.append(hc * inv)
        else:
            sums = []
            for c in range(_CH):
                vacc = None
                for o in range(-r, r + 1):
                    # output row i reads M plane rows
                    # clamp(a2+i+o, m0, m0+hm-1)
                    top = max(0, m0 - (a2 + o))
                    bot = max(0, (a2 + th2 + o) - (m0 + hm))
                    lo = max(0, a2 + o - m0)
                    rows_o = _replicated_rows(m_ref, c, lo, th2 - top - bot,
                                              top, bot, hm, w_out)
                    vacc = rows_o if vacc is None else vacc + rows_o
                hacc = None
                for o in range(-r, r + 1):
                    if o == 0:
                        sh = vacc
                    elif o < 0:
                        sh = jnp.concatenate(
                            [jnp.broadcast_to(vacc[:, 0:1], (th2, -o)),
                             vacc[:, 0:w_out + o]], axis=1)
                    else:
                        # anchor at the true width: columns beyond it hold
                        # garbage
                        fill = w_out - (w_true - o)
                        sh = jnp.concatenate(
                            [vacc[:, o:w_true],
                             jnp.broadcast_to(vacc[:, w_true - 1:w_true],
                                              (th2, fill))],
                            axis=1)
                    hacc = sh if hacc is None else hacc + sh
                sums.append(hacc * inv)

        g11, g12, g22, h1, h2 = sums
        idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
        fu = (g11 * h2 - g12 * h1) * idet
        fv = (g22 * h1 - g12 * h2) * idet
        if zero_tail:
            # keep pad lanes exactly zero so chained iterations see the
            # same inputs as the zero-padded one-shot API (bitwise)
            cok = jax.lax.broadcasted_iota(jnp.int32, (th2, w_out), 1) < w_true
            fu = jnp.where(cok, fu, zero)
            fv = jnp.where(cok, fv, zero)
        return fu, fv

    def read_in(x0):
        return u_ref[0, :, x0:x0 + _LANE], v_ref[0, :, x0:x0 + _LANE]

    def read_carry(x0):
        return f_ref[0, :, x0:x0 + _LANE], f_ref[1, :, x0:x0 + _LANE]

    for it in range(iters):
        phase1(read_in if it == 0 else read_carry)
        if _phases in ("p1", "p1nog"):
            # probe mode: skip box+solve, emit two M channels as the "flow"
            out_ref[0, 0] = m_ref[3, a - m0:a - m0 + th, :]
            out_ref[0, 1] = m_ref[4, a - m0:a - m0 + th, :]
            return
        if it < iters - 1:
            # intermediate iteration: solve the FULL hm-row range into the
            # VMEM flow carry (rows within r*(iters-1-it) of a synthetic
            # tile edge go wrong here and are never read by the output rows)
            fu, fv = phase2(bhf_ref, m0, hm)
            f_ref[0] = fu
            f_ref[1] = fv
        else:
            fu, fv = phase2(bh_ref, a, th)
            out_ref[0, 0] = fu
            out_ref[0, 1] = fv


@functools.lru_cache(maxsize=None)
def _box_mats(th: int, hm: int, w_out: int, w_true: int, a: int, m0: int,
              r: int):
    """Banded box-sum matrices with border replication folded in.

    Bh (th, hm): output row i sums M plane rows clamp(a+i+o, m0, m0+hm-1)
    over o in [-r, r].  Bw (w_out, w_out): column x sums columns
    max(x+o, 0) for o<=0 and min-anchored at the true width for o>0
    (columns beyond w_true hold garbage), exactly the semantics of the
    VPU shift-add path.  Entries are small ints -- exact in bf16, so the
    MXU's decomposed f32 matmul reproduces the f32 sums to float rounding.
    """
    import numpy as np
    bh = np.zeros((th, hm), np.float32)
    for i in range(th):
        for o in range(-r, r + 1):
            j = min(max(a + i + o, m0), m0 + hm - 1) - m0
            bh[i, j] += 1.0
    bw = np.zeros((w_out, w_out), np.float32)
    for x in range(w_out):
        for o in range(-r, r + 1):
            if o <= 0:
                x2 = max(x + o, 0)
            else:
                x2 = x + o if x + o < w_true else w_true - 1
            bw[x2, x] += 1.0
    return bh, bw


def prepare_r0_cf(r0cf, w: int):
    """r0 operand form: channel-first, zero lane padding to w_out.  A no-op
    (alias) when the plane width is already lane-aligned."""
    w_out = _round_up(w, _LANE)
    r0cf = r0cf.astype(jnp.float32)
    if w_out == w:
        return r0cf
    return jnp.pad(r0cf, ((0, 0),) * (r0cf.ndim - 1) + ((0, w_out - w),))


def prepare_r1_cf(r1cf, d: int, w: int, packed: bool, dyn: bool,
                  eo: int = 0):
    """r1 operand form: channel-first with m=d+1 edge-replicated context
    rows/cols (plus a lane of right padding for the two-window gather),
    optionally bf16-pair packed, plus throwaway rows for dyn mode's
    8-aligned dynamic windows.

    ``eo``: instead of the interleaved plane, four half-width deinterleaved
    planes stacked on a new axis before the rows: [E0, O0, E64, O64]
    (even/odd columns and their 64-entry-shifted phase copies; see
    _umuf_kernel docstring).  ~2x the operand bytes, half the gathers.
    """
    m = d + 1
    w_out = _round_up(w, _LANE)
    w_src = w_out + _LANE
    lead = ((0, 0),) * (r1cf.ndim - 3)
    r1p = jnp.pad(r1cf.astype(jnp.float32),
                  lead + ((0, 0), (m, m), (m, w_src - w - m)), mode="edge")
    if eo:
        assert not packed, "eo sampling is the f32 path"
        w_hp = _round_up(w_src // 2, _LANE)

        def _padw(x):
            pw = w_hp - x.shape[-1]
            return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pw),))

        planes = [_padw(r1p[..., 0::2]), _padw(r1p[..., 1::2])]
        if eo == 1:
            planes += [_padw(r1p[..., 128::2]), _padw(r1p[..., 129::2])]
        r1p = jnp.stack(planes, axis=-3)
    elif packed:
        r1p = pack_pairs(r1p)
    if dyn:
        # throwaway rows so the 8-aligned dynamic window (rounded up to a
        # sublane multiple, <= hm+14 rows) never overruns
        pad = ((0, 0),) * (r1p.ndim - 2) + ((0, _DYN_PAD), (0, 0))
        r1p = jnp.pad(r1p, pad)
    return r1p


def _prepare_cf(r0cf, r1cf, d: int, w: int, packed: bool, dyn: bool,
                eo: int = 0):
    """One-time per (tap, level) data prep shared by every iteration:
    channel-first lane-padded r0 and row+lane edge-padded (optionally
    bf16-pair packed or eo-deinterleaved) r1.  Hoisting this out of the
    iteration loop removes ~2/3 of the XLA-side data movement of the old
    per-call API."""
    return (prepare_r0_cf(r0cf, w),
            prepare_r1_cf(r1cf, d, w, packed, dyn, eo))


def _umuf_call(r0_t, r1_t, u_t, v_t, *, d: int, winsize: int, th: int,
               a: int, m0: int, h_true: int, w: int, interpret: bool,
               iters: int = 1, packed: bool = False, xwin: bool = False,
               dyn: bool = False, mxu: bool = False, rg: int = 0,
               eo: int = 0, r1_start=None, _phases: str = "both"):
    """One row tile, PRE-PREPARED operands (see _prepare_cf): r0_t
    (b, 5, hm, w_out); r1_t (b, 5, hm+2m[+pad], w_src) [packed dtype when
    packed]; u_t, v_t (b, hm, w_out) with zeroed pad lanes.  ``iters``
    chained iterations run inside the program (caller must size the row
    context for r*iters).

    ``r1_start``: optional TRACED batch offset into r1_t.  When set, r1_t
    may hold MORE batch elements than r0_t (the whole padded stack's
    prepared expansion) and each program DMAs its block from batch element
    ``r1_start + bb`` via a scalar-prefetch index map -- the per-tap
    dynamic-slice copy of the reference window never materializes.
    """
    b, c, hm, w_out = r0_t.shape
    m = d + 1
    assert iters == 1 or _phases == "both"
    # The dense column box matrix Bw is (w_out, w_out); beyond 512 lanes it
    # would crowd VMEM (and the matmul grows quadratically), so wide planes
    # fall back to the VPU shift-add phase 2.
    mxu = mxu and w_out <= 512
    r1_rows = r1_t.shape[-2]
    prefetch = r1_start is not None

    def _spec(shape, imap):
        if prefetch:
            # index maps receive (*grid, *scalar_refs)
            return pl.BlockSpec(shape, lambda bb, s, _f=imap: _f(bb),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    # eo r1 carries an extra plane axis (eo=1: E0/O0/E64/O64; eo=2: E/O)
    # before the rows
    r1_blk = ((1, _CH, 4 if eo == 1 else 2, r1_rows, r1_t.shape[-1]) if eo
              else (1, _CH, r1_rows, r1_t.shape[-1]))
    r1_zeros = (0,) * (len(r1_blk) - 1)
    if prefetch:
        r1_spec = pl.BlockSpec(r1_blk,
                               lambda bb, s: (s[0] + bb,) + r1_zeros,
                               memory_space=pltpu.VMEM)
    else:
        r1_spec = _spec(r1_blk, lambda bb: (bb,) + r1_zeros)

    in_specs = [
        _spec((1, _CH, hm, w_out), lambda bb: (bb, 0, 0, 0)),
        r1_spec,
        _spec((1, hm, w_out), lambda bb: (bb, 0, 0)),
        _spec((1, hm, w_out), lambda bb: (bb, 0, 0)),
    ]
    inputs = [r0_t, r1_t, u_t, v_t]
    if mxu:
        bh, bw = _box_mats(th, hm, w_out, w, a, m0, winsize // 2)
        inputs += [jnp.asarray(bh)]
        in_specs += [_spec((th, hm), lambda bb: (0, 0))]
        if iters > 1:
            # full-range Bh for the intermediate in-kernel iterations
            bhf, _ = _box_mats(hm, hm, w_out, w, m0, m0, winsize // 2)
            inputs += [jnp.asarray(bhf)]
            in_specs += [_spec((hm, hm), lambda bb: (0, 0))]
        inputs += [jnp.asarray(bw)]
        in_specs += [_spec((w_out, w_out), lambda bb: (0, 0))]
    scratch = [pltpu.VMEM((_CH, hm, w_out), jnp.float32),
               pltpu.VMEM((_CH, hm, _LANE), jnp.float32)]
    if iters > 1:
        scratch.append(pltpu.VMEM((2, hm, w_out), jnp.float32))
    kernel = functools.partial(
        _umuf_kernel, d=d, winsize=winsize, th=th, hm=hm,
        w_out=w_out, w_true=w, a=a, m0=m0, h_true=h_true,
        iters=iters, packed=packed, xwin=xwin, dyn=dyn,
        mxu=mxu, rg=rg, eo=eo, zero_tail=w_out > w, _phases=_phases)
    out_shape = jax.ShapeDtypeStruct((b, 2, th, w_out), jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if prefetch:
        def kernel_pf(s_ref, *refs):
            del s_ref
            kernel(*refs)
        return pl.pallas_call(
            kernel_pf,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, 2, th, w_out),
                                       lambda bb, s: (bb, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=scratch),
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(jnp.asarray(r1_start, jnp.int32).reshape(1), *inputs)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2, th, w_out), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.jit,
                   static_argnames=("max_displacement", "winsize", "iters",
                                    "interpret", "packed", "xwin", "dyn",
                                    "mxu", "rg", "eo", "fused", "_phases"))
def _umuf_pallas_cf(r0: jnp.ndarray, r1: jnp.ndarray, flow_cf: jnp.ndarray,
                    max_displacement: int, winsize: int, iters: int = 1,
                    interpret: bool = False, packed: bool = False,
                    xwin: bool = False, dyn: bool = False, mxu: bool = False,
                    rg: int = 0, eo: int = 0, fused: bool = True,
                    _phases: str = "both"):
    """Channel-first fused iterationS.  r0, r1: (B, 5, H, W); flow_cf:
    (B, 2, H, w_out) lane-padded with ZERO pad lanes -> updated flow_cf of
    the same shape.  Data prep happens once.  With ``fused`` all iterations
    run inside ONE Pallas program per row tile (flow carry in VMEM; the
    tile's row context grows by r per iteration so the output rows stay
    bitwise-identical to per-iteration programs -- r0/r1 are DMAed once
    instead of per iteration); otherwise one program per iteration with
    exact M-row context."""
    b, c, h, w = r0.shape
    assert c == _CH
    d = int(max_displacement)
    m = d + 1
    r = winsize // 2

    r0_p, r1p = _prepare_cf(r0, r1, d, w, packed, dyn, eo)
    in_k = iters if (fused and _phases == "both") else 1
    margin = r * in_k
    tiles = plane_row_tiles(
        h, lambda th: umuf_fits_vmem(th, w, d, winsize, in_k, eo))
    for _ in range(iters // in_k):
        outs = []
        for a, th in tiles:
            m0 = max(0, a - margin)
            m1 = min(h, a + th + margin)
            r1_hi = m1 + 2 * m + (_DYN_PAD if dyn else 0)
            outs.append(_umuf_call(
                r0_p[:, :, m0:m1], r1p[..., m0:r1_hi, :],
                flow_cf[:, 0, m0:m1], flow_cf[:, 1, m0:m1],
                d=d, winsize=winsize, th=th, a=a, m0=m0, h_true=h, w=w,
                interpret=interpret, iters=in_k, packed=packed, xwin=xwin,
                dyn=dyn, mxu=mxu, rg=rg, eo=eo, _phases=_phases))
        flow_cf = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=2)
    return flow_cf


def _lane_pad_flow_cf(flow_cf, w):
    w_out = _round_up(w, _LANE)
    if w_out == w:
        return flow_cf
    return jnp.pad(flow_cf, ((0, 0), (0, 0), (0, 0), (0, w_out - w)))


def prep_tiles_cf(rcf_full, d: int, w: int, winsize: int, iters: int, *,
                  packed: bool = False, dyn: bool = False, eo: int = 0,
                  fused: bool = True,
                  interior: tuple[int, int] | None = None):
    """Per-(pass, level) one-time operand prep of a FULL padded-stack
    expansion, row-tiled.

    rcf_full: (B, 5, H, W) channel-first polynomial expansion of every slice
    of a padded stack.  Returns (r0_tiles, r1_tiles, tiles): per row tile,
    the target-form rows (r0: lane-padded, batch cut to ``interior`` =
    (start, n)) and the reference-form rows (r1: edge-padded/packed, FULL
    batch -- umuf_iterate_prepped windows into it per tap with a traced
    ``r1_start``, so the per-tap reference copy never materializes).

    Running this once per pass (instead of re-preparing per tap) is what
    removes the per-(tap, level) transposes/pads that dominated the old
    per-call prep (scripts/pass_breakdown.py)."""
    h = rcf_full.shape[-2]
    m = d + 1
    r = winsize // 2
    in_k = iters if fused else 1
    margin = r * in_k
    tiles = plane_row_tiles(
        h, lambda th: umuf_fits_vmem(th, w, d, winsize, in_k, eo))
    r0_p = prepare_r0_cf(rcf_full, w)
    if interior is not None:
        s0, n = interior
        r0_p = jax.lax.slice_in_dim(r0_p, s0, s0 + n, axis=0)
    r1p = prepare_r1_cf(rcf_full, d, w, packed, dyn, eo)
    r0_tiles, r1_tiles = [], []
    for a, th in tiles:
        m0 = max(0, a - margin)
        m1 = min(h, a + th + margin)
        r1_hi = m1 + 2 * m + (_DYN_PAD if dyn else 0)
        r0_tiles.append(r0_p[:, :, m0:m1])
        r1_tiles.append(r1p[..., m0:r1_hi, :])
    return r0_tiles, r1_tiles, tiles


def umuf_iterate_prepped(r0_tiles, r1_tiles, tiles, flow_cf, iters: int,
                         d: int, winsize: int, *, h: int, w: int, r1_start,
                         packed: bool = False, dyn: bool = False,
                         mxu: bool = False, rg: int = 0, eo: int = 0,
                         fused: bool = True,
                         interpret: bool = False) -> jnp.ndarray:
    """``iters`` chained fused Farneback iterations over PRE-TILED operands
    (see ``prep_tiles_cf``), channel-first.

    flow_cf: (b, 2, h, w_out) with ZERO pad lanes; r1_start: traced int32
    batch offset of the reference window inside the full-stack r1 tiles.
    Returns the updated flow, bitwise-identical to ``umuf_iterate`` on the
    materialized window."""
    in_k = iters if fused else 1
    margin = (winsize // 2) * in_k
    for _ in range(iters // in_k):
        outs = []
        for (a, th), r0_t, r1_t in zip(tiles, r0_tiles, r1_tiles):
            m0 = max(0, a - margin)
            m1 = min(h, a + th + margin)
            outs.append(_umuf_call(
                r0_t, r1_t, flow_cf[:, 0, m0:m1], flow_cf[:, 1, m0:m1],
                d=d, winsize=winsize, th=th, a=a, m0=m0, h_true=h, w=w,
                interpret=interpret, iters=in_k, packed=packed,
                dyn=dyn, mxu=mxu, rg=rg, eo=eo, r1_start=r1_start))
        flow_cf = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=2)
    return flow_cf


def umuf_iterate(r0: jnp.ndarray, r1: jnp.ndarray, flow: jnp.ndarray,
                 iters: int, max_displacement: int, winsize: int,
                 interpret: bool = False, packed: bool = False,
                 xwin: bool = False, dyn: bool = False,
                 mxu: bool = False, rg: int = 0, eo: int = 0,
                 fused: bool = True) -> jnp.ndarray:
    """``iters`` chained fused Farneback iterations, channels-last API.

    Bitwise-identical to calling ``umuf_pallas`` ``iters`` times, but the
    operand prep (channel transposes, edge pads, bf16 packing) runs once
    instead of per iteration, and with ``fused`` (default) all iterations
    run inside one Pallas program per row tile -- r0/r1 enter VMEM once
    per tap-level instead of once per iteration, and the intermediate
    flows never round-trip HBM.
    """
    lead = r0.shape[:-3]
    h, w = r0.shape[-3], r0.shape[-2]
    r0cf = jnp.moveaxis(r0, -1, -3).reshape((-1, _CH, h, w))
    r1cf = jnp.moveaxis(r1, -1, -3).reshape((-1, _CH, h, w))
    fcf = jnp.moveaxis(flow, -1, -3).reshape((-1, 2, h, w))
    fcf = _lane_pad_flow_cf(fcf, w)
    fcf = _umuf_pallas_cf(r0cf, r1cf, fcf, max_displacement, winsize, iters,
                          interpret, packed, xwin, dyn, mxu, rg, eo, fused)
    f = fcf[:, :, :, :w].reshape(lead + (2, h, w))
    return jnp.moveaxis(f, -3, -1)


def umuf_pallas(r0: jnp.ndarray, r1: jnp.ndarray, flow: jnp.ndarray,
                max_displacement: int, winsize: int,
                interpret: bool = False, packed: bool = False,
                xwin: bool = False, dyn: bool = False, mxu: bool = False,
                rg: int = 0, eo: int = 0,
                _phases: str = "both") -> jnp.ndarray:
    """ONE fused Farneback iteration, channels-last API.

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
    fcf = jnp.moveaxis(flow, -1, -3).reshape((-1, 2, h, w))
    fcf = _lane_pad_flow_cf(fcf, w)
    fcf = _umuf_pallas_cf(r0cf, r1cf, fcf, max_displacement, winsize, 1,
                          interpret, packed, xwin, dyn, mxu, rg, eo,
                          _phases=_phases)
    f = fcf[:, :, :, :w].reshape(lead + (2, h, w))
    return jnp.moveaxis(f, -3, -1)
