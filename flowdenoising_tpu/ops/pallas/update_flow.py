"""Pallas TPU kernel: fused Farneback flow solve.

Box-aggregates the five constraint-matrix channels over the winsize window
(replicate borders, OpenCV's 1/winsize^2 normalization) and solves the
regularized per-pixel 2x2 system -- all in VMEM, one HBM read of M and one
write of the flow.  Replaces ops.farneback.update_flow's XLA composition
(separable shift-add + solve), which round-trips the blurred channels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowdenoising_tpu.ops.pallas.sample import _round_up, _LANE

_VMEM_BUDGET_BYTES = 13 * 1024 * 1024
_CH = 5


def uf_fits_vmem(h: int, w: int, winsize: int) -> bool:
    r = winsize // 2
    wp = _round_up(_round_up(w, _LANE) + 2 * r, _LANE)
    needed = 4 * (_CH * (h + 2 * r) * wp + 2 * h * wp + 2 * (h + 2 * r) * wp)
    return needed <= _VMEM_BUDGET_BYTES


def _uf_kernel(mp_ref, out_ref, *, winsize: int, h: int, w: int):
    r = winsize // 2
    k = 2 * r + 1
    inv = jnp.float32(1.0 / float(winsize * winsize))

    sums = []
    for c in range(_CH):
        # vertical box sum (input rows pre-padded by r, replicate)
        acc = mp_ref[0, c, 0:h, :]
        for dy in range(1, k):
            acc = acc + mp_ref[0, c, dy:dy + h, :]
        # horizontal box sum (columns pre-padded by r)
        hacc = acc[:, 0:w]
        for dx in range(1, k):
            hacc = hacc + acc[:, dx:dx + w]
        sums.append(hacc * inv)

    g11, g12, g22, h1, h2 = sums
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    out_ref[0, 0] = (g11 * h2 - g12 * h1) * idet
    out_ref[0, 1] = (g22 * h1 - g12 * h2) * idet


def _uf_call(m_rows: jnp.ndarray, winsize: int, w: int, interpret: bool):
    """Kernel invocation on a row tile; m_rows carries r context rows/side."""
    b, c, hp, _ = m_rows.shape
    r = winsize // 2
    h = hp - 2 * r
    w_out = _round_up(w, _LANE)
    # horizontal window slices reach w_out + 2r columns
    wp = _round_up(w_out + 2 * r, _LANE)
    m_p = jnp.pad(m_rows.astype(jnp.float32),
                  ((0, 0), (0, 0), (0, 0), (r, wp - w - r)), mode="edge")

    out = pl.pallas_call(
        functools.partial(_uf_kernel, winsize=winsize, h=h, w=w_out),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, _CH, h + 2 * r, wp), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, h, w_out), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, h, w_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(m_p)
    return out[:, :, :, :w]


@functools.partial(jax.jit, static_argnames=("winsize", "interpret"))
def _update_flow_pallas_cf(m: jnp.ndarray, winsize: int, interpret: bool = False):
    """m: (B, 5, H, W) -> flow (B, 2, H, W).  Row-tiled for large planes."""
    from flowdenoising_tpu.ops.pallas.sample import plane_row_tiles

    b, c, h, w = m.shape
    assert c == _CH
    r = winsize // 2
    m_rows_p = jnp.pad(m, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    tiles = plane_row_tiles(h, lambda th: uf_fits_vmem(th, w, winsize))
    outs = []
    for a, th in tiles:
        m_rows = jax.lax.dynamic_slice_in_dim(m_rows_p, a, th + 2 * r, axis=2)
        outs.append(_uf_call(m_rows, winsize, w, interpret))
    if len(outs) == 1:
        return outs[0]
    return jnp.concatenate(outs, axis=2)


def update_flow_pallas(m: jnp.ndarray, winsize: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Channels-last API: M (..., H, W, 5) -> flow (..., H, W, 2)."""
    lead = m.shape[:-3]
    h, w = m.shape[-3], m.shape[-2]
    mcf = jnp.moveaxis(m, -1, -3).reshape((-1, _CH, h, w))
    f = _update_flow_pallas_cf(mcf, winsize, interpret)
    f = f.reshape(lead + (2, h, w))
    return jnp.moveaxis(f, -3, -1)
