"""Pallas TPU kernel: fused compose-mode tap step.

One tap of the composed-flow pass (core/axis_filter.py::_of_pass_composed)
is  ``F' = F + warp(link, F);  acc' = acc + w * warp(neighbor, F')`` --
three kernel launches in the unfused form (2-channel link warp, 1-channel
neighbor warp, fma) with the intermediate F' and the warped neighbor
round-tripping HBM.  This kernel performs the whole step per 128-lane
x-block with everything in VMEM: sample the link field at F (two-window
lane gather, see ops/pallas/sample.py), add, sample the neighbor at the
updated flow, fma into the accumulator.

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


def compose_fits_vmem(th: int, w: int, d: int) -> bool:
    """Whether one batch program's operands fit the VMEM budget."""
    m = d + 1
    hm = th + 2 * m + _DYN_PAD
    w_out = _round_up(w, _LANE)
    w_src = w_out + _LANE
    needed = 4 * (2 * hm * w_src        # link u, v (padded)
                  + hm * w_src          # neighbor (padded)
                  + 2 * th * w_out      # flow u, v
                  + th * w_out          # acc in
                  + 3 * th * w_out      # outputs
                  + 2 * th * _LANE)     # sampling scratch
    return needed <= _VMEM_BUDGET_BYTES


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


def _compose_kernel(link_ref, nb_ref, u_ref, v_ref, acc_ref, w_ref,
                    uo_ref, vo_ref, acco_ref, s0_ref, s1_ref, *,
                    d: int, th: int, w_out: int, dyn: bool = False,
                    packed: bool = False):
    m = d + 1
    n_blk = w_out // _LANE
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    weight = w_ref[0, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (th, _LANE), 1)

    def _sample_dyn(src_ref, cis, refs, v, idx, x0):
        # dynamic trip count over the block's TRUE y-shift range, 8-aligned
        # dynamic windows + sub-8 roll (same scheme as ops/pallas/umuf.py;
        # the static @pl.when form executes all 2d+2 shifts on Mosaic)
        tu, i_a0, i_b0, use_b0, i_a1, i_b1, use_b1 = idx
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

        def gather_idx(u):
            iu = jnp.floor(u)
            tu = u - iu
            l_idx = col + m + iu.astype(jnp.int32)
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
            _sample_dyn(link_ref, (0, 1), (s0_ref, s1_ref), v, idx, x0)
        else:
            vmin = jnp.min(v)
            vmax = jnp.max(v)
            for s in range(-d, d + 2):
                @pl.when((vmin < s + 1) & (vmax > s - 1))
                def _(s=s, idx=idx, v=v):
                    wy = jnp.maximum(zero, one - jnp.abs(v - s))
                    s0_ref[...] += _sample_block(link_ref, 0, m + s, th, x0,
                                                 *idx[1:], idx[0], wy,
                                                 packed)
                    s1_ref[...] += _sample_block(link_ref, 1, m + s, th, x0,
                                                 *idx[1:], idx[0], wy,
                                                 packed)
        fu2 = fu + s0_ref[...]
        fv2 = fv + s1_ref[...]
        uo_ref[0, :, x0:x0 + _LANE] = fu2
        vo_ref[0, :, x0:x0 + _LANE] = fv2

        # ---- phase B: sample the neighbor at the updated flow, fma ----
        u2 = jnp.clip(fu2, -float(d), float(d))
        v2 = jnp.clip(fv2, -float(d), float(d))
        idx2 = gather_idx(u2)
        s0_ref[...] = jnp.zeros_like(s0_ref)
        if dyn:
            _sample_dyn(nb_ref, (0,), (s0_ref,), v2, idx2, x0)
        else:
            vmin2 = jnp.min(v2)
            vmax2 = jnp.max(v2)
            for s in range(-d, d + 2):
                @pl.when((vmin2 < s + 1) & (vmax2 > s - 1))
                def _(s=s, idx2=idx2, v2=v2):
                    wy = jnp.maximum(zero, one - jnp.abs(v2 - s))
                    s0_ref[...] += _sample_block(nb_ref, 0, m + s, th, x0,
                                                 *idx2[1:], idx2[0], wy,
                                                 packed)
        acco_ref[0, :, x0:x0 + _LANE] = (
            acc_ref[0, :, x0:x0 + _LANE] + weight * s0_ref[...])


def _compose_call(link_t, nb_t, u_t, v_t, acc_t, weight, *, d: int, th: int,
                  w: int, interpret: bool, dyn: bool = False,
                  packed: bool = False):
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
    pad_xy = ((0, 0), (0, 0), (0, w_out - w))
    u_p = jnp.pad(u_t.astype(jnp.float32), pad_xy)
    v_p = jnp.pad(v_t.astype(jnp.float32), pad_xy)
    acc_p = jnp.pad(acc_t.astype(jnp.float32), pad_xy)
    w_arr = jnp.broadcast_to(jnp.asarray(weight, jnp.float32), (1, 1))

    hm = th + 2 * m + dyn_rows
    out_shapes = (
        jax.ShapeDtypeStruct((b, th, w_out), jnp.float32),
        jax.ShapeDtypeStruct((b, th, w_out), jnp.float32),
        jax.ShapeDtypeStruct((b, th, w_out), jnp.float32),
    )
    uo, vo, acco = pl.pallas_call(
        functools.partial(_compose_kernel, d=d, th=th, w_out=w_out, dyn=dyn,
                          packed=packed),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 2, hm, w_src), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hm, w_src), lambda bb: (bb, 0, 0, 0),
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
                                    "packed"))
def _compose_tap_cf(link, neighbor, u, v, acc, weight,
                    max_displacement: int, interpret: bool = False,
                    dyn: bool = False, packed: bool = False):
    """Channel-first fused tap step.  link: (B, 2, H, W); neighbor, acc:
    (B, H, W); u, v: (B, H, W) -> (u', v', acc')."""
    b, c, h, w = link.shape
    assert c == 2
    d = int(max_displacement)
    m = d + 1

    link_p = jnp.pad(link, ((0, 0), (0, 0), (m, m), (0, 0)), mode="edge")
    nb_p = jnp.pad(neighbor[:, None], ((0, 0), (0, 0), (m, m), (0, 0)),
                   mode="edge")
    tiles = plane_row_tiles(h, lambda th: compose_fits_vmem(th, w, d))
    uos, vos, accos = [], [], []
    for a, th in tiles:
        uo, vo, acco = _compose_call(
            link_p[:, :, a:a + th + 2 * m], nb_p[:, :, a:a + th + 2 * m],
            u[:, a:a + th], v[:, a:a + th], acc[:, a:a + th], weight,
            d=d, th=th, w=w, interpret=interpret, dyn=dyn, packed=packed)
        uos.append(uo); vos.append(vo); accos.append(acco)
    if len(uos) == 1:
        return uos[0], vos[0], accos[0]
    return (jnp.concatenate(uos, axis=1), jnp.concatenate(vos, axis=1),
            jnp.concatenate(accos, axis=1))


def compose_tap_pallas(link: jnp.ndarray, flow: jnp.ndarray,
                       neighbor: jnp.ndarray, acc: jnp.ndarray,
                       weight, max_displacement: int,
                       interpret: bool = False, dyn: bool = False,
                       packed: bool = False):
    """Fused compose-mode tap step, channels-last API.

    link, flow: (..., H, W, 2); neighbor, acc: (..., H, W); weight: scalar.
    Returns (flow', acc') with
      flow' = flow + warp(link, flow)
      acc'  = acc + weight * warp(neighbor, flow').

    ``packed``: sample the link field and neighbor at bfloat16 pair
    precision (pack_pairs) -- one 32-bit gather yields both bilinear
    x-neighbors, halving the tap step's gather count.  Used by the bf16
    fast mode; flow/acc arithmetic stays float32.
    ``dyn``: the y-shift sampling loops run over each block's TRUE dynamic
    flow range instead of all 2d+2 statically predicated shifts --
    bitwise-identical output.  OFF by default: on the noisy bench volume
    the composed tap flows activate ~12 of 18 shifts, and the dyn form's
    per-trip dynamic-window rolls cost about what the skipped shifts save
    (256^3 pass 0.508 s static vs 0.540 s dyn).  Opt in for smooth-drift
    data where per-block ranges stay low (FDTPU_COMPOSE_DYN=1 at the
    pipeline level).
    """
    lead = neighbor.shape[:-2]
    h, w = neighbor.shape[-2], neighbor.shape[-1]
    link_cf = jnp.moveaxis(link, -1, -3).reshape((-1, 2, h, w))
    u = flow[..., 0].reshape((-1, h, w))
    v = flow[..., 1].reshape((-1, h, w))
    nb = neighbor.reshape((-1, h, w))
    ac = acc.reshape((-1, h, w))
    uo, vo, acco = _compose_tap_cf(link_cf, nb, u, v, ac, weight,
                                   max_displacement, interpret, dyn, packed)
    flow_out = jnp.stack([uo, vo], axis=-1).reshape(lead + (h, w, 2))
    return flow_out, acco.reshape(lead + (h, w))
