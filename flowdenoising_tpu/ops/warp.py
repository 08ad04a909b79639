"""Batched bilinear slice warping (replaces cv2.remap).

Semantics follow the reference ``warp_slice``
(/root/reference/src/flowdenoising.py:55-63): sampling map is identity plus
flow -- ``out[y, x] = ref(x + flow[y,x,0], y + flow[y,x,1])`` -- bilinear
interpolation, border replicate (coordinates clamped to the valid range,
OFCA_EXTENSION_MODE == cv2.BORDER_REPLICATE).

Divergence (documented): cv2.remap quantizes fractional coordinates to 1/32
(its INTER_TAB_SIZE fixed-point tables); we interpolate at full float32
precision.  Tests bound the difference accordingly.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather2d(img_flat: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray, width: int) -> jnp.ndarray:
    """Gather img_flat (..., H*W) at integer (yi, xi) of shape (..., H', W').

    Leading (batch) dims of the index and image broadcast against each other.
    """
    idx = yi * width + xi
    hw = idx.shape[-2:]
    batch = jnp.broadcast_shapes(img_flat.shape[:-1], idx.shape[:-2])
    flat_idx = jnp.broadcast_to(idx, batch + hw).reshape(batch + (-1,))
    src = jnp.broadcast_to(img_flat, batch + img_flat.shape[-1:])
    out = jnp.take_along_axis(src, flat_idx, axis=-1)
    return out.reshape(batch + hw)


def bilinear_sample(img: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` (..., H, W) at float coords (fx, fy) of shape (..., H', W')
    with bilinear interpolation and replicate (clamp) borders."""
    h, w = img.shape[-2], img.shape[-1]
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    flat = img.reshape(img.shape[:-2] + (h * w,))
    v00 = _gather2d(flat, y0i, x0i, w)
    v01 = _gather2d(flat, y0i, x1i, w)
    v10 = _gather2d(flat, y1i, x0i, w)
    v11 = _gather2d(flat, y1i, x1i, w)

    top = v00 + (v01 - v00) * tx
    bot = v10 + (v11 - v10) * tx
    return top + (bot - top) * ty


def warp_slices(ref: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp ``ref`` (..., H, W) by ``flow`` (..., H, W, 2); flow channel 0 is
    the X displacement, channel 1 the Y displacement (cv2 convention)."""
    h, w = ref.shape[-2], ref.shape[-1]
    dtype = ref.dtype
    gx = jnp.arange(w, dtype=dtype)
    gy = jnp.arange(h, dtype=dtype).reshape(h, 1)
    fx = flow[..., 0] + gx
    fy = flow[..., 1] + gy
    return bilinear_sample(ref, fx, fy)
