"""Pallas TPU kernel: fused displacement sampling (bilinear warp).

The hot inner op of the whole pipeline is "sample an image at x+flow" --
used by Farneback's constraint-matrix update (~3 x levels x taps times per
pass) and by the final tap warp.  The XLA formulations are either a gather
(~1e8 elem/s on TPU -- catastrophic) or a (2D+2)^2-term windowed
shift-and-add whose fused form re-reads the source per term (HBM-bound).

Kernel design (per batch x channel program, source plane VMEM-resident):

- The y displacement is a static window of 2D+2 row shifts with bilinear hat
  weights (only the two rows around floor(v) get nonzero weight).
- The x displacement uses Mosaic's per-row dynamic lane gather
  (``tpu.DynamicGatherOp`` via ``take_along_axis(axis=1)``).  The gather can
  only address one 128-lane vreg, while an output block's sources span
  128 + 2(D+1) columns -- so each x-block gathers from TWO adjacent aligned
  128-column windows and selects by index range.

Cost per output element: (2D+2) x (4 lane-gathers + ~8 VPU ops) / 128 lanes,
with the source read from HBM exactly once.

Semantics match ``ops.warp.bilinear_displace_windowed`` exactly
(displacement clamped to +-D, replicate borders); validated in
tests/test_pallas_sample.py (interpreter mode) and on hardware against the
windowed path.

Backend notes discovered on v5e/axon:
- manual ``make_async_copy`` from a ``pl.ANY`` operand faults the TPU worker;
  plain VMEM BlockSpecs are used instead (whole plane per program), which
  bounds supported plane sizes (see ``fits_vmem``); larger planes fall back
  to the XLA windowed path.
- ``dynamic_gather`` rejects sources wider than one vreg along the gather
  dimension, hence the two-window decomposition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET_BYTES = 13 * 1024 * 1024
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_PAIR_MASK_HI = np.uint32(0xFFFF0000)


def pack_pairs(src: jnp.ndarray) -> jnp.ndarray:
    """Pack adjacent column pairs as two bfloat16s in one 32-bit lane.

    packed[..., i] = (bf16bits(src[..., i]) << 16) | bf16bits(src[..., i+1])
    (the last pair's right neighbor is edge-replicated), so a single 32-bit
    lane gather at index i yields BOTH bilinear x-neighbors -- halving the
    gather count of the sampling kernels at bfloat16 source precision.
    ``unpack_pair`` recovers the two values: a bfloat16's float32 bit
    pattern is its own 16 bits shifted into the high half.
    """
    b = src.astype(jnp.bfloat16)
    bits = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
    pad = [(0, 0)] * (bits.ndim - 1) + [(0, 1)]
    bits = jnp.pad(bits, pad, mode="edge")
    return (bits[..., :-1] << 16) | bits[..., 1:]


def unpack_pair(pk: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(left, right) float32 values from a ``pack_pairs`` lane."""
    g0 = jax.lax.bitcast_convert_type(pk & _PAIR_MASK_HI, jnp.float32)
    g1 = jax.lax.bitcast_convert_type(pk << 16, jnp.float32)
    return g0, g1


def pallas_supported() -> bool:
    """True when the default backend can run Mosaic TPU kernels."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def fits_vmem(c: int, h: int, w: int, d: int) -> bool:
    """Whether one (batch, channel) program's blocks fit the VMEM budget."""
    m = d + 1
    wsrc = _round_up(w + 2 * m, _LANE) + _LANE
    wout = _round_up(w, _LANE)
    bytes_needed = 4 * ((h + 2 * m) * wsrc + 3 * h * wout)
    return bytes_needed <= _VMEM_BUDGET_BYTES


def _sample_kernel(src_ref, u_ref, v_ref, out_ref, acc_ref, *, d: int, h: int,
                   w_out: int):
    """src_ref: (1, 1, H+2M, Wsrc) padded plane; u/v: (1, H, Wout); out: (1, 1, H, Wout)."""
    m = d + 1
    u = jnp.clip(u_ref[0], -float(d), float(d))
    v = jnp.clip(v_ref[0], -float(d), float(d))
    iu = jnp.floor(u)
    tu = u - iu
    iui = iu.astype(jnp.int32)

    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    n_blk = w_out // _LANE
    col = jax.lax.broadcasted_iota(jnp.int32, (h, _LANE), 1)

    for blk in range(n_blk):
        x0 = blk * _LANE
        # Local gather index into windowA = padded cols [x0, x0+128):
        # global sample col = x0 + j + floor(u); padded col = that + m.
        l_idx = col + m + iui[:, x0:x0 + _LANE]
        tub = tu[:, x0:x0 + _LANE]
        vb = v[:, x0:x0 + _LANE]

        iA0 = jnp.clip(l_idx, 0, _LANE - 1)
        iB0 = jnp.clip(l_idx - _LANE, 0, _LANE - 1)
        useB0 = l_idx >= _LANE
        l1 = l_idx + 1
        iA1 = jnp.clip(l1, 0, _LANE - 1)
        iB1 = jnp.clip(l1 - _LANE, 0, _LANE - 1)
        useB1 = l1 >= _LANE

        # Static shift unroll (Mosaic requires 8-aligned dynamic sublane
        # starts), with per-block dead-shift skipping: a shift's hat weight
        # is zero for every pixel unless vmin-1 < s < vmax+1.
        vmin = jnp.min(vb)
        vmax = jnp.max(vb)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for s in range(-d, d + 2):
            @pl.when((vmin < s + 1) & (vmax > s - 1))
            def _(s=s):
                wy = jnp.maximum(zero, one - jnp.abs(vb - s))
                rows_a = src_ref[0, 0, m + s:m + s + h, x0:x0 + _LANE]
                rows_b = src_ref[0, 0, m + s:m + s + h, x0 + _LANE:x0 + 2 * _LANE]
                ga0 = jnp.take_along_axis(rows_a, iA0, axis=1, mode="promise_in_bounds")
                gb0 = jnp.take_along_axis(rows_b, iB0, axis=1, mode="promise_in_bounds")
                g0 = jnp.where(useB0, gb0, ga0)
                ga1 = jnp.take_along_axis(rows_a, iA1, axis=1, mode="promise_in_bounds")
                gb1 = jnp.take_along_axis(rows_b, iB1, axis=1, mode="promise_in_bounds")
                g1 = jnp.where(useB1, gb1, ga1)
                acc_ref[...] += wy * (g0 + (g1 - g0) * tub)
        out_ref[0, 0, :, x0:x0 + _LANE] = acc_ref[...]


def plane_row_tiles(h: int, fits) -> list[tuple[int, int]]:
    """Split rows [0, h) into the fewest equal-ish tiles such that
    ``fits(tile_height)`` holds.  Used to keep per-program VMEM bounded for
    large planes; tiles get exact overlapping context rows from the padded
    source, so tiling never changes results."""
    k = 1
    while not fits(-(-h // k)) and k < h:
        k += 1
    t = -(-h // k)
    return [(a, min(t, h - a)) for a in range(0, h, t)]


def _sample_call(src_rows: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                 d: int, interpret: bool):
    """Kernel invocation on a row tile.

    src_rows: (B, C, TH + 2M, W) -- output rows plus M true context rows per
    side (already materialized by the caller); u, v: (B, TH, W).
    """
    b, c, hp, w = src_rows.shape
    m = d + 1
    h = hp - 2 * m
    w_out = _round_up(w, _LANE)
    # x padding: m replicate columns on the left, then enough on the right
    # that every x-block's window B (cols [x0+128, x0+256)) is in bounds.
    w_src = w_out + _LANE
    src_p = jnp.pad(src_rows.astype(jnp.float32),
                    ((0, 0), (0, 0), (0, 0), (m, w_src - w - m)), mode="edge")
    pad_uv = ((0, 0), (0, 0), (0, w_out - w))
    u_p = jnp.pad(u.astype(jnp.float32), pad_uv)
    v_p = jnp.pad(v.astype(jnp.float32), pad_uv)

    # Fold channels into the grid; u/v blocks are revisited per channel.
    out = pl.pallas_call(
        functools.partial(_sample_kernel, d=d, h=h, w_out=w_out),
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((1, 1, h + 2 * m, w_src), lambda bb, cc: (bb, cc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w_out), lambda bb, cc: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w_out), lambda bb, cc: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w_out), lambda bb, cc: (bb, cc, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, _LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(src_p, u_p, v_p)
    return out[:, :, :, :w]


@functools.partial(jax.jit, static_argnames=("max_displacement", "interpret"))
def _bilinear_displace_pallas_4d(src: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                                 max_displacement: int, interpret: bool = False):
    """src: (B, C, H, W); u, v: (B, H, W) -> (B, C, H, W).

    Planes too large for one VMEM-resident program are processed in row
    tiles; each tile's kernel call receives the true overlapping context
    rows (sliced from the y-padded array), so tiling never changes results.
    """
    b, c, h, w = src.shape
    d = int(max_displacement)
    m = d + 1
    src_p = jnp.pad(src, ((0, 0), (0, 0), (m, m), (0, 0)), mode="edge")

    tiles = plane_row_tiles(h, lambda th: fits_vmem(c, th, w, d))
    outs = []
    for a, th in tiles:
        sub = jax.lax.dynamic_slice_in_dim(src_p, a, th + 2 * m, axis=2)
        outs.append(_sample_call(sub, u[:, a:a + th], v[:, a:a + th],
                                 d, interpret))
    if len(outs) == 1:
        return outs[0]
    return jnp.concatenate(outs, axis=2)


def bilinear_displace_pallas(src: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                             max_displacement: int,
                             interpret: bool = False) -> jnp.ndarray:
    """Sample ``src`` at displacements (u, v) with the fused TPU kernel.

    src: (..., H, W) or (..., C, H, W) where u, v are (..., H, W).  Leading
    dims are flattened into the kernel grid's batch axis.
    """
    if src.ndim == u.ndim:          # no channel axis
        s4 = src.reshape((-1, 1) + src.shape[-2:])
        u3 = u.reshape((-1,) + u.shape[-2:])
        v3 = v.reshape((-1,) + v.shape[-2:])
        out = _bilinear_displace_pallas_4d(s4, u3, v3, max_displacement, interpret)
        return out.reshape(src.shape)
    # channel axis present at -3
    lead = src.shape[:-3]
    c = src.shape[-3]
    s4 = src.reshape((-1, c) + src.shape[-2:])
    u3 = u.reshape((-1,) + u.shape[-2:])
    v3 = v.reshape((-1,) + v.shape[-2:])
    out = _bilinear_displace_pallas_4d(s4, u3, v3, max_displacement, interpret)
    return out.reshape(lead + (c,) + src.shape[-2:])
