"""Bilinear warp parity vs cv2.remap (reference warp_slice, flowdenoising.py:55-63).

With float32 maps (the reference's call shape) cv2.remap interpolates at
full float precision -- fixed-point 1/32 tables only apply to pre-converted
integer maps -- so parity here is tight (f32 rounding only).
"""

import cv2
import numpy as np
import jax.numpy as jnp

from flowdenoising_tpu.ops.warp import warp_slices
from conftest import make_blob_image


def cv2_warp_slice(reference, flow):
    """Literal reference warp_slice semantics."""
    height, width = flow.shape[:2]
    map_x = np.tile(np.arange(width), (height, 1))
    map_y = np.swapaxes(np.tile(np.arange(height), (width, 1)), 0, 1)
    map_xy = (flow + np.dstack((map_x, map_y))).astype("float32")
    return cv2.remap(reference, map_xy, None, interpolation=cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REPLICATE)


def test_zero_flow_identity():
    img = make_blob_image(33, 47, seed=3).astype(np.float32)[:33, :47]
    flow = np.zeros((33, 47, 2), np.float32)
    out = np.asarray(warp_slices(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_integer_shift():
    img = make_blob_image(32, 32, seed=4).astype(np.float32)[:32, :32]
    flow = np.zeros((32, 32, 2), np.float32)
    flow[..., 0] = 2.0  # sample from x+2
    out = np.asarray(warp_slices(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[:, :-2], img[:, 2:], atol=1e-5)
    # replicate border on the right
    np.testing.assert_allclose(out[:, -1], img[:, -1], atol=1e-5)


def test_matches_cv2_remap_random_flow():
    r = np.random.default_rng(7)
    img = make_blob_image(40, 52, seed=5).astype(np.float32)[:40, :52]
    flow = r.normal(scale=1.5, size=(40, 52, 2)).astype(np.float32)
    ours = np.asarray(warp_slices(jnp.asarray(img), jnp.asarray(flow)))
    ref = cv2_warp_slice(img, flow)
    # float-map remap is full precision; only f32 rounding remains
    assert np.abs(ours - ref).max() < 5e-4
    assert np.abs(ours - ref).mean() < 5e-5


def test_batched_matches_loop():
    r = np.random.default_rng(8)
    imgs = r.normal(size=(4, 24, 24)).astype(np.float32)
    flows = r.normal(scale=1.0, size=(4, 24, 24, 2)).astype(np.float32)
    batched = np.asarray(warp_slices(jnp.asarray(imgs), jnp.asarray(flows)))
    for b in range(4):
        single = np.asarray(warp_slices(jnp.asarray(imgs[b]), jnp.asarray(flows[b])))
        np.testing.assert_allclose(batched[b], single, atol=1e-6)


def test_cv2_parity_across_flow_scales():
    # Confirms the float-map remap path has no 1/32 quantization: parity
    # stays at f32-rounding level for tiny through frame-scale flows.
    for seed, scale in [(1, 0.02), (2, 0.5), (3, 3.0), (4, 9.0)]:
        r = np.random.default_rng(seed)
        img = (r.normal(size=(48, 80)).astype(np.float32) * 100)
        flow = r.normal(scale=scale, size=(48, 80, 2)).astype(np.float32)
        ref = cv2_warp_slice(img, flow)
        ours = np.asarray(warp_slices(jnp.asarray(img), jnp.asarray(flow)))
        assert np.abs(ours - ref).max() < 5e-4, (seed, scale)
