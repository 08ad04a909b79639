"""Pallas TPU kernel: fused compose-mode tap step.

One tap of the composed-flow pass (core/axis_filter.py::_of_pass_composed)
is  ``F' = F + warp(link, F);  acc' = acc + w * warp(neighbor, F')`` --
three kernel launches in the unfused form (2-channel link warp, 1-channel
neighbor warp, fma) with the intermediate F' and the warped neighbor
round-tripping HBM.  This kernel performs the whole step per 128-lane
x-block with everything in VMEM: sample the link field at F, add, sample
the neighbor at the updated flow, fma into the accumulator.

Sampling forms (per y-shift, per channel):
- default f32 ``eo``: even/odd column-deinterleaved source planes with
  64-lane phase copies (``eo_planes``) -- each bilinear x-neighbor is one
  single-vreg aligned gather: 2 gathers, no window selects;
- bf16 ``packed``: pack_pairs lanes, one 32-bit gather yields both
  x-neighbors of a 128-lane window pair: 2 gathers + 1 window select;
- base (FDTPU_COMPOSE_EO=0): two-window lane gather around Mosaic's
  single-vreg gather limit (see ops/pallas/sample.py): 4 gathers + 2
  window selects.

Sampling semantics match ``ops.warp.displace_sample`` exactly
(displacements clamped to +-D for sampling only, replicate borders); the
carried flow is the unclamped sum, as in the unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowdenoising_tpu.ops.pallas.sample import (
    _round_up, _LANE, plane_row_tiles, pack_pairs, unpack_pair)

_VMEM_BUDGET_BYTES = 13 * 1024 * 1024
# dyn mode: extra source pad rows so the 8-aligned dynamic window (rounded
# up to a sublane multiple) never overruns (same scheme as ops/pallas/umuf)
_DYN_PAD = 16


def compose_fits_vmem(th: int, w: int, d: int, eo: bool = False,
                      budget: int = _VMEM_BUDGET_BYTES) -> bool:
    """Whether one batch program's operands fit the VMEM budget."""
    m = d + 1
    hm = th + 2 * m + _DYN_PAD
    w_out = _round_up(w, _LANE)
    w_src = w_out + _LANE
    if eo:
        # four deinterleaved half-width planes per channel (E0/O0/E64/O64)
        w_src = 4 * _round_up(w_src // 2, _LANE)
    needed = 4 * (2 * hm * w_src        # link u, v (padded)
                  + hm * w_src          # neighbor (padded)
                  + 2 * th * w_out      # flow u, v
                  + th * w_out          # acc in
                  + 3 * th * w_out      # outputs
                  + 2 * th * _LANE)     # sampling scratch
    return needed <= budget


def eo_planes(padded: jnp.ndarray) -> jnp.ndarray:
    """Even/odd column-deinterleaved planes of an x-padded source.

    padded: (..., H, Wsrc) -> (..., 4, H, Whp) with planes [E0, O0, E64,
    O64]: even/odd columns plus their 64-entry-shifted phase copies, each
    lane-padded to Whp = round_up(Wsrc//2, 128).  Every 128-lane output
    block then finds a vreg-ALIGNED gather window (even blocks in E0/O0 at
    base (blk//2)*128, odd blocks in E64/O64 at the same base), and the
    bilinear x-pair (l, l+1) is one single-vreg gather per parity plane --
    2 gathers instead of 4, no window selects.  Same scheme as
    ops/pallas/umuf.py's prepare_r1_cf(eo=1).
    """
    w_hp = _round_up(padded.shape[-1] // 2, _LANE)

    def _padw(x):
        pw = w_hp - x.shape[-1]
        return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pw),))

    planes = [_padw(padded[..., 0::2]), _padw(padded[..., 1::2]),
              _padw(padded[..., 128::2]), _padw(padded[..., 129::2])]
    return jnp.stack(planes, axis=-3)


def _sample_rolled(rolled_a, rolled_b, i_a0, i_b0, use_b0,
                   i_a1, i_b1, use_b1, tu, wy, packed=False):
    """One y-shift's bilinear x-gather contribution from aligned rows.

    ``packed``: the rows hold bf16 column pairs (pack_pairs) -- a single
    32-bit gather at the left index yields both bilinear x-neighbors,
    halving the gather count at bfloat16 source precision."""
    ga0 = jnp.take_along_axis(rolled_a, i_a0, axis=1,
                              mode="promise_in_bounds")
    gb0 = jnp.take_along_axis(rolled_b, i_b0, axis=1,
                              mode="promise_in_bounds")
    g0 = jnp.where(use_b0, gb0, ga0)
    if packed:
        g0, g1 = unpack_pair(g0)
    else:
        ga1 = jnp.take_along_axis(rolled_a, i_a1, axis=1,
                                  mode="promise_in_bounds")
        gb1 = jnp.take_along_axis(rolled_b, i_b1, axis=1,
                                  mode="promise_in_bounds")
        g1 = jnp.where(use_b1, gb1, ga1)
    return wy * (g0 + (g1 - g0) * tu)


def _sample_block(src_ref, ci, s_lo, n_rows, x0, i_a0, i_b0, use_b0,
                  i_a1, i_b1, use_b1, tu, wy, packed=False):
    """One y-shift's bilinear x-gather contribution for channel ``ci``."""
    rows_a = src_ref[0, ci, s_lo:s_lo + n_rows, pl.ds(x0, _LANE)]
    rows_b = src_ref[0, ci, s_lo:s_lo + n_rows, pl.ds(x0 + _LANE, _LANE)]
    return _sample_rolled(rows_a, rows_b, i_a0, i_b0, use_b0,
                          i_a1, i_b1, use_b1, tu, wy, packed)


def _sample_rolled_eo(rows_e, rows_o, i_e, i_o, par, tu, wy):
    """One y-shift's contribution from deinterleaved parity planes.

    One single-vreg gather per parity plane; ``par`` routes
    (g0, g1) = even l ? (E, O) : (O, E).  Arithmetic identical to
    ``_sample_rolled`` so eo output is bitwise-equal to the base path.
    """
    ge = jnp.take_along_axis(rows_e, i_e, axis=1, mode="promise_in_bounds")
    go = jnp.take_along_axis(rows_o, i_o, axis=1, mode="promise_in_bounds")
    g0 = jnp.where(par, ge, go)
    g1 = jnp.where(par, go, ge)
    return wy * (g0 + (g1 - g0) * tu)


def _sample_block_eo(src_ref, ci, s_lo, n_rows, eo_ph, eo_base,
                     i_e, i_o, par, tu, wy):
    """eo twin of ``_sample_block``: aligned parity-plane windows."""
    rows_e = src_ref[0, ci, eo_ph, s_lo:s_lo + n_rows, pl.ds(eo_base, _LANE)]
    rows_o = src_ref[0, ci, eo_ph + 1, s_lo:s_lo + n_rows,
                     pl.ds(eo_base, _LANE)]
    return _sample_rolled_eo(rows_e, rows_o, i_e, i_o, par, tu, wy)


def _compose_kernel(link_ref, nb_ref, u_ref, v_ref, acc_ref, w_ref,
                    uo_ref, vo_ref, acco_ref, s0_ref, s1_ref, *,
                    d: int, th: int, w_out: int, dyn: bool = False,
                    packed: bool = False, eo: bool = False,
                    w_true: int = 0, zero_tail: bool = False):
    m = d + 1
    n_blk = w_out // _LANE
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    weight = w_ref[0, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (th, _LANE), 1)

    def _sample_dyn(src_ref, cis, refs, v, idx, x0, eo_ph, eo_base):
        # dynamic trip count over the block's TRUE y-shift range, 8-aligned
        # dynamic windows + sub-8 roll (same scheme as ops/pallas/umuf.py;
        # the static @pl.when form executes all 2d+2 shifts on Mosaic)
        s_lo = jnp.floor(jnp.min(v)).astype(jnp.int32)
        s_hi = jnp.floor(jnp.max(v)).astype(jnp.int32) + 1
        nw = _round_up(th + 7, 8)

        def body(sv, carry):
            base = m + sv
            aligned = pl.multiple_of((base // 8) * 8, 8)
            off = base - aligned
            shift = jax.lax.rem(nw - off, nw)
            wy = jnp.maximum(zero, one - jnp.abs(v - sv.astype(jnp.float32)))
            for ci, ref in zip(cis, refs):
                if eo:
                    tu, i_e, i_o, par = idx
                    we = src_ref[0, ci, eo_ph, pl.ds(aligned, nw),
                                 pl.ds(eo_base, _LANE)]
                    wo = src_ref[0, ci, eo_ph + 1, pl.ds(aligned, nw),
                                 pl.ds(eo_base, _LANE)]
                    re_ = pltpu.roll(we, shift, axis=0)[:th]
                    ro = pltpu.roll(wo, shift, axis=0)[:th]
                    ref[...] += _sample_rolled_eo(re_, ro, i_e, i_o, par,
                                                  tu, wy)
                else:
                    tu, i_a0, i_b0, use_b0, i_a1, i_b1, use_b1 = idx
                    wa = src_ref[0, ci, pl.ds(aligned, nw), pl.ds(x0, _LANE)]
                    wb = src_ref[0, ci, pl.ds(aligned, nw),
                                 pl.ds(x0 + _LANE, _LANE)]
                    ra = pltpu.roll(wa, shift, axis=0)[:th]
                    rb = pltpu.roll(wb, shift, axis=0)[:th]
                    ref[...] += _sample_rolled(ra, rb, i_a0, i_b0, use_b0,
                                               i_a1, i_b1, use_b1, tu, wy,
                                               packed)
            return carry

        jax.lax.fori_loop(s_lo, s_hi + 1, body, 0)

    for blk in range(n_blk):
        x0 = blk * _LANE
        # eo plane/window selection (static per block; see eo_planes)
        eo_ph = 2 * (blk & 1)
        eo_base = (blk // 2) * _LANE

        def gather_idx(u):
            iu = jnp.floor(u)
            tu = u - iu
            l_idx = col + m + iu.astype(jnp.int32)
            if eo:
                # per-parity single-vreg indices (span [0, 64+d] < 128)
                i_e = jnp.clip((l_idx + 1) >> 1, 0, _LANE - 1)
                i_o = jnp.clip(l_idx >> 1, 0, _LANE - 1)
                par = (l_idx & 1) == 0
                return tu, i_e, i_o, par
            i_a0 = jnp.clip(l_idx, 0, _LANE - 1)
            i_b0 = jnp.clip(l_idx - _LANE, 0, _LANE - 1)
            use_b0 = l_idx >= _LANE
            l1 = l_idx + 1
            i_a1 = jnp.clip(l1, 0, _LANE - 1)
            i_b1 = jnp.clip(l1 - _LANE, 0, _LANE - 1)
            use_b1 = l1 >= _LANE
            return tu, i_a0, i_b0, use_b0, i_a1, i_b1, use_b1

        # ---- phase A: sample the link field at F, update the flow ----
        fu = u_ref[0, :, x0:x0 + _LANE]
        fv = v_ref[0, :, x0:x0 + _LANE]
        u = jnp.clip(fu, -float(d), float(d))
        v = jnp.clip(fv, -float(d), float(d))
        idx = gather_idx(u)
        s0_ref[...] = jnp.zeros_like(s0_ref)
        s1_ref[...] = jnp.zeros_like(s1_ref)
        if dyn:
            _sample_dyn(link_ref, (0, 1), (s0_ref, s1_ref), v, idx, x0,
                        eo_ph, eo_base)
        else:
            vmin = jnp.min(v)
            vmax = jnp.max(v)
            for s in range(-d, d + 2):
                @pl.when((vmin < s + 1) & (vmax > s - 1))
                def _(s=s, idx=idx, v=v):
                    wy = jnp.maximum(zero, one - jnp.abs(v - s))
                    if eo:
                        tu, i_e, i_o, par = idx
                        s0_ref[...] += _sample_block_eo(
                            link_ref, 0, m + s, th, eo_ph, eo_base,
                            i_e, i_o, par, tu, wy)
                        s1_ref[...] += _sample_block_eo(
                            link_ref, 1, m + s, th, eo_ph, eo_base,
                            i_e, i_o, par, tu, wy)
                    else:
                        s0_ref[...] += _sample_block(
                            link_ref, 0, m + s, th, x0,
                            *idx[1:], idx[0], wy, packed)
                        s1_ref[...] += _sample_block(
                            link_ref, 1, m + s, th, x0,
                            *idx[1:], idx[0], wy, packed)
        fu2 = fu + s0_ref[...]
        fv2 = fv + s1_ref[...]
        # keep pad lanes exactly zero when the flow/acc carry lives in
        # lane-padded form across taps (prepped path): chained taps then see
        # the same inputs as the per-tap zero-padded API (bitwise)
        tail = zero_tail and blk == n_blk - 1
        if tail:
            cok = col + x0 < w_true
            fu2 = jnp.where(cok, fu2, zero)
            fv2 = jnp.where(cok, fv2, zero)
        uo_ref[0, :, x0:x0 + _LANE] = fu2
        vo_ref[0, :, x0:x0 + _LANE] = fv2

        # ---- phase B: sample the neighbor at the updated flow, fma ----
        u2 = jnp.clip(fu2, -float(d), float(d))
        v2 = jnp.clip(fv2, -float(d), float(d))
        idx2 = gather_idx(u2)
        s0_ref[...] = jnp.zeros_like(s0_ref)
        if dyn:
            _sample_dyn(nb_ref, (0,), (s0_ref,), v2, idx2, x0,
                        eo_ph, eo_base)
        else:
            vmin2 = jnp.min(v2)
            vmax2 = jnp.max(v2)
            for s in range(-d, d + 2):
                @pl.when((vmin2 < s + 1) & (vmax2 > s - 1))
                def _(s=s, idx2=idx2, v2=v2):
                    wy = jnp.maximum(zero, one - jnp.abs(v2 - s))
                    if eo:
                        tu, i_e, i_o, par = idx2
                        s0_ref[...] += _sample_block_eo(
                            nb_ref, 0, m + s, th, eo_ph, eo_base,
                            i_e, i_o, par, tu, wy)
                    else:
                        s0_ref[...] += _sample_block(
                            nb_ref, 0, m + s, th, x0,
                            *idx2[1:], idx2[0], wy, packed)
        accw = acc_ref[0, :, x0:x0 + _LANE] + weight * s0_ref[...]
        if tail:
            accw = jnp.where(cok, accw, zero)
        acco_ref[0, :, x0:x0 + _LANE] = accw


def _compose_call(link_t, nb_t, u_t, v_t, acc_t, weight, *, d: int, th: int,
                  w: int, interpret: bool, dyn: bool = False,
                  packed: bool = False, eo: bool = False):
    """Kernel invocation on a row tile.  link_t: (B, 2, TH+2M, W) with M true
    context rows per side; nb_t: (B, 1, TH+2M, W); u/v/acc: (B, TH, W)."""
    b = link_t.shape[0]
    m = d + 1
    w_out = _round_up(w, _LANE)
    w_src = w_out + _LANE
    dyn_rows = _DYN_PAD if dyn else 0
    pad_src = ((0, 0), (0, 0), (0, dyn_rows), (m, w_src - w - m))
    link_p = jnp.pad(link_t.astype(jnp.float32), pad_src, mode="edge")
    nb_p = jnp.pad(nb_t.astype(jnp.float32), pad_src, mode="edge")
    if packed:
        link_p = pack_pairs(link_p)
        nb_p = pack_pairs(nb_p)
    elif eo:
        link_p = eo_planes(link_p)
        nb_p = eo_planes(nb_p)
    pad_xy = ((0, 0), (0, 0), (0, w_out - w))
    u_p = jnp.pad(u_t.astype(jnp.float32), pad_xy)
    v_p = jnp.pad(v_t.astype(jnp.float32), pad_xy)
    acc_p = jnp.pad(acc_t.astype(jnp.float32), pad_xy)
    w_arr = jnp.broadcast_to(jnp.asarray(weight, jnp.float32), (1, 1))

    hm = th + 2 * m + dyn_rows
    w_hp = link_p.shape[-1]
    src_blk = ((1, 2, 4, hm, w_hp), (1, 1, 4, hm, w_hp)) if eo else \
        ((1, 2, hm, w_src), (1, 1, hm, w_src))
    src_zeros = (0,) * (len(src_blk[0]) - 1)
    out_shapes = (
        jax.ShapeDtypeStruct((b, th, w_out), jnp.float32),
        jax.ShapeDtypeStruct((b, th, w_out), jnp.float32),
        jax.ShapeDtypeStruct((b, th, w_out), jnp.float32),
    )
    uo, vo, acco = pl.pallas_call(
        functools.partial(_compose_kernel, d=d, th=th, w_out=w_out, dyn=dyn,
                          packed=packed, eo=eo),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(src_blk[0], lambda bb: (bb,) + src_zeros,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(src_blk[1], lambda bb: (bb,) + src_zeros,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w_out), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w_out), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w_out), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bb: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, w_out), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w_out), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w_out), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((th, _LANE), jnp.float32),
                        pltpu.VMEM((th, _LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(link_p, nb_p, u_p, v_p, acc_p, w_arr)
    return uo[:, :, :w], vo[:, :, :w], acco[:, :, :w]


@functools.partial(jax.jit,
                   static_argnames=("max_displacement", "interpret", "dyn",
                                    "packed", "eo"))
def _compose_tap_cf(link, neighbor, u, v, acc, weight,
                    max_displacement: int, interpret: bool = False,
                    dyn: bool = False, packed: bool = False,
                    eo: bool = False):
    """Channel-first fused tap step.  link: (B, 2, H, W); neighbor, acc:
    (B, H, W); u, v: (B, H, W) -> (u', v', acc')."""
    b, c, h, w = link.shape
    assert c == 2
    d = int(max_displacement)
    m = d + 1

    link_p = jnp.pad(link, ((0, 0), (0, 0), (m, m), (0, 0)), mode="edge")
    nb_p = jnp.pad(neighbor[:, None], ((0, 0), (0, 0), (m, m), (0, 0)),
                   mode="edge")
    tiles = plane_row_tiles(h, lambda th: compose_fits_vmem(th, w, d, eo))
    uos, vos, accos = [], [], []
    for a, th in tiles:
        uo, vo, acco = _compose_call(
            link_p[:, :, a:a + th + 2 * m], nb_p[:, :, a:a + th + 2 * m],
            u[:, a:a + th], v[:, a:a + th], acc[:, a:a + th], weight,
            d=d, th=th, w=w, interpret=interpret, dyn=dyn, packed=packed,
            eo=eo)
        uos.append(uo); vos.append(vo); accos.append(acco)
    if len(uos) == 1:
        return uos[0], vos[0], accos[0]
    return (jnp.concatenate(uos, axis=1), jnp.concatenate(vos, axis=1),
            jnp.concatenate(accos, axis=1))


def compose_plan(h: int, w: int, d: int, eo: bool) -> list[tuple[int, int]]:
    """Static row-tile plan shared by every tap of a prepped compose pass."""
    return plane_row_tiles(h, lambda th: compose_fits_vmem(th, w, d, eo))


def prep_compose_src(src_cf: jnp.ndarray, d: int, w: int, *,
                     packed: bool = False, eo: bool = False,
                     dyn: bool = False,
                     tiles: list[tuple[int, int]] | None = None):
    """One-time per (pass, direction) operand prep of a FULL source stack.

    src_cf: (B, C, H, W) channel-first full stack (C=2 adjacent-flow links,
    C=1 neighbor slices).  Applies the whole of ``_compose_call``'s per-tap
    XLA-side prep once -- edge row/lane padding plus the eo deinterleave or
    bf16 pair packing -- and row-tiles the result.  Each tap's kernel then
    windows into the batch axis at a traced offset via a scalar-prefetch
    index map (same scheme as ops/pallas/umuf.py::prep_tiles_cf), so the
    tap scan carries ZERO operand prep.

    Returns the per-tile operand list (full batch in every tile).
    """
    m = d + 1
    h = src_cf.shape[-2]
    w_out = _round_up(w, _LANE)
    w_src = w_out + _LANE
    dyn_rows = _DYN_PAD if dyn else 0
    if tiles is None:
        tiles = compose_plan(h, w, d, eo)
    pad_src = ((0, 0), (0, 0), (m, m + dyn_rows), (m, w_src - w - m))
    src_p = jnp.pad(src_cf.astype(jnp.float32), pad_src, mode="edge")
    if packed:
        src_p = pack_pairs(src_p)
    elif eo:
        src_p = eo_planes(src_p)
    # tile rows [a, a+th+2m+dyn): interior tiles window real rows where the
    # per-tap form had bottom dyn pad -- dyn's rolled overreads land in the
    # discarded [th:] positions either way, so outputs stay bitwise-equal
    return [src_p[..., a:a + th + 2 * m + dyn_rows, :] for a, th in tiles]


def _compose_call_prepped(link_t, nb_t, u_t, v_t, acc_t, weight,
                          link_start, nb_start, *, d: int, th: int, w: int,
                          interpret: bool, dyn: bool = False,
                          packed: bool = False, eo: bool = False):
    """Kernel invocation on one row tile of PRE-PREPARED full-stack operands.

    link_t: (B_link, 2, [4,] HM, W') and nb_t: (B_nb, 1, [4,] HM, W') hold
    EVERY slice of the prepared stacks; program bb DMAs batch elements
    ``link_start + bb`` / ``nb_start + bb`` via scalar-prefetch index maps.
    u/v/acc: (B, TH, W_OUT) lane-padded f32 with ZERO pad lanes (the kernel
    re-zeroes output tails, so the carry chain stays bitwise-identical to
    the per-tap zero-padded API).
    """
    b = u_t.shape[0]
    m = d + 1
    w_out = _round_up(w, _LANE)
    hm = link_t.shape[-2]
    w_arr = jnp.broadcast_to(jnp.asarray(weight, jnp.float32), (1, 1))

    link_blk = (1, 2, 4, hm, link_t.shape[-1]) if eo else \
        (1, 2, hm, link_t.shape[-1])
    nb_blk = (1, 1) + link_blk[2:]
    link_zeros = (0,) * (len(link_blk) - 1)

    out_shapes = (
        jax.ShapeDtypeStruct((b, th, w_out), jnp.float32),
        jax.ShapeDtypeStruct((b, th, w_out), jnp.float32),
        jax.ShapeDtypeStruct((b, th, w_out), jnp.float32),
    )
    kernel = functools.partial(_compose_kernel, d=d, th=th, w_out=w_out,
                               dyn=dyn, packed=packed, eo=eo,
                               w_true=w, zero_tail=w_out > w)

    def kernel_pf(s_ref, *refs):
        del s_ref
        kernel(*refs)

    starts = jnp.stack([jnp.asarray(link_start, jnp.int32),
                        jnp.asarray(nb_start, jnp.int32)])
    uo, vo, acco = pl.pallas_call(
        kernel_pf,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(link_blk,
                             lambda bb, s: (s[0] + bb,) + link_zeros,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(nb_blk,
                             lambda bb, s: (s[1] + bb,) + link_zeros,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, w_out), lambda bb, s: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, w_out), lambda bb, s: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, w_out), lambda bb, s: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda bb, s: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, th, w_out), lambda bb, s: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, w_out), lambda bb, s: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, w_out), lambda bb, s: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((th, _LANE), jnp.float32),
                            pltpu.VMEM((th, _LANE), jnp.float32)]),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(starts, link_t, nb_t, u_t, v_t, acc_t, w_arr)
    return uo, vo, acco


def init_compose_carry(vol: jnp.ndarray, center_weight,
                       tiles: list[tuple[int, int]], w: int, dtype):
    """Initial per-tile (u, v, acc) carry for a prepped compose run.

    vol: (N, H, W) interior slices (pass compute dtype).  Flow starts at
    zero; acc starts at the unwarped center tap, exactly like the per-tap
    path's ``acc0`` (flowdenoising.py:317 center-tap semantics).  All
    arrays are lane-padded f32 with zero tails; the flow zeros are derived
    from the volume so shard_map's varying-axes typing stays consistent.
    """
    w_out = _round_up(w, _LANE)
    cw = jnp.asarray(center_weight, dtype)
    out = []
    for a, th in tiles:
        vt = vol[:, a:a + th]
        acc0 = jnp.pad((vt * cw).astype(jnp.float32),
                       ((0, 0), (0, 0), (0, w_out - w)))
        zero = acc0 * 0
        out.append((zero, zero, acc0))
    return tuple(out)


def reset_compose_flow(carry_tiles):
    """Zero the flow components between the two outward tap runs."""
    return tuple((u * 0, v * 0, acc) for u, v, acc in carry_tiles)


def finish_compose_carry(carry_tiles, w: int) -> jnp.ndarray:
    """Concatenate the per-tile accumulators back to (N, H, W) f32."""
    accs = [acc[:, :, :w] for _, _, acc in carry_tiles]
    return accs[0] if len(accs) == 1 else jnp.concatenate(accs, axis=1)


def compose_tap_prepped(link_tiles, nb_tiles, carry_tiles,
                        tiles: list[tuple[int, int]], weight,
                        link_start, nb_start, *, d: int, w: int,
                        dtype=jnp.float32, interpret: bool = False,
                        dyn: bool = False, packed: bool = False,
                        eo: bool = False):
    """One fused compose tap over PRE-PREPARED operands (see
    ``prep_compose_src``): flow' = flow + warp(link, flow); acc' = acc +
    weight * warp(neighbor, flow').  link_start / nb_start are TRACED batch
    offsets of this tap's slice windows inside the full prepared stacks.

    Bitwise-identical to ``compose_tap_pallas`` on the materialized
    windows (including the bf16 carry round-trip the per-tap scan body
    applies between taps when the pass dtype is bfloat16).
    """
    out = []
    for (a, th), lt, nt, (u, v, acc) in zip(tiles, link_tiles, nb_tiles,
                                            carry_tiles):
        u2, v2, acc2 = _compose_call_prepped(
            lt, nt, u, v, acc, weight, link_start, nb_start,
            d=d, th=th, w=w, interpret=interpret, dyn=dyn, packed=packed,
            eo=eo)
        if dtype != jnp.float32:
            # match the per-tap scan's carry cast (flow/acc live in the
            # pass dtype between taps there)
            u2 = u2.astype(dtype).astype(jnp.float32)
            v2 = v2.astype(dtype).astype(jnp.float32)
            acc2 = acc2.astype(dtype).astype(jnp.float32)
        out.append((u2, v2, acc2))
    return tuple(out)


def compose_tap_pallas(link: jnp.ndarray, flow: jnp.ndarray,
                       neighbor: jnp.ndarray, acc: jnp.ndarray,
                       weight, max_displacement: int,
                       interpret: bool = False, dyn: bool = False,
                       packed: bool = False, eo: bool | None = None):
    """Fused compose-mode tap step, channels-last API.

    link, flow: (..., H, W, 2); neighbor, acc: (..., H, W); weight: scalar.
    Returns (flow', acc') with
      flow' = flow + warp(link, flow)
      acc'  = acc + weight * warp(neighbor, flow').

    ``packed``: sample the link field and neighbor at bfloat16 pair
    precision (pack_pairs) -- one 32-bit gather yields both bilinear
    x-neighbors, halving the tap step's gather count.  Used by the bf16
    fast mode; flow/acc arithmetic stays float32.
    ``eo``: f32 sampling from even/odd column-deinterleaved source planes
    with 64-lane phase copies (see eo_planes) -- every bilinear neighbor
    becomes a single aligned-vreg gather, so both sampling phases run 2
    gathers per channel-shift instead of 4 with no window selects, at FULL
    f32 source precision.  Bitwise-identical output to the base path.
    Default (None): on whenever ``packed`` is off (kill switch:
    FDTPU_COMPOSE_EO=0); mutually exclusive with ``packed``.
    ``dyn``: the y-shift sampling loops run over each block's TRUE dynamic
    flow range instead of all 2d+2 statically predicated shifts --
    bitwise-identical output.  OFF by default: on the noisy bench volume
    the composed tap flows activate ~12 of 18 shifts, and the dyn form's
    per-trip dynamic-window rolls cost about what the skipped shifts save
    (256^3 pass 0.508 s static vs 0.540 s dyn).  Opt in for smooth-drift
    data where per-block ranges stay low (FDTPU_COMPOSE_DYN=1 at the
    pipeline level).
    """
    import os
    if eo is None:
        eo = (not packed
              and os.environ.get("FDTPU_COMPOSE_EO", "1") != "0")
    assert not (eo and packed), "eo sampling is the f32 path"
    lead = neighbor.shape[:-2]
    h, w = neighbor.shape[-2], neighbor.shape[-1]
    link_cf = jnp.moveaxis(link, -1, -3).reshape((-1, 2, h, w))
    u = flow[..., 0].reshape((-1, h, w))
    v = flow[..., 1].reshape((-1, h, w))
    nb = neighbor.reshape((-1, h, w))
    ac = acc.reshape((-1, h, w))
    uo, vo, acco = _compose_tap_cf(link_cf, nb, u, v, ac, weight,
                                   max_displacement, interpret, dyn, packed,
                                   eo)
    flow_out = jnp.stack([uo, vo], axis=-1).reshape(lead + (h, w, 2))
    return flow_out, acco.reshape(lead + (h, w))
