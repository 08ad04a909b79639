"""bf16 packed-pair gather fast path (``packed=True`` in the Pallas UM and
UMUF kernels; selected by FlowConfig.precision == "bfloat16").

Oracle: the identical computation with the reference expansion r1 quantized
to bfloat16 up front -- packing is then exact up to f32 interpolation
rounding, so tolerances stay tight and specifically isolate the pair
packing/unpacking, not the bf16 quantization itself.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowdenoising_tpu.ops import farneback as F
from flowdenoising_tpu.ops.pallas.sample import pack_pairs, unpack_pair
from flowdenoising_tpu.ops.pallas.update_matrices import update_matrices_pallas
from flowdenoising_tpu.ops.pallas.umuf import umuf_pallas


def _setup(b=2, h=24, w=40, seed=0, flow_scale=1.5):
    r = np.random.default_rng(seed)
    img0 = jnp.asarray(r.normal(size=(b, h, w)).astype(np.float32) * 40)
    img1 = jnp.asarray(r.normal(size=(b, h, w)).astype(np.float32) * 40)
    R0 = F.poly_expand(img0)
    R1 = F.poly_expand(img1)
    flow = jnp.asarray((r.normal(size=(b, h, w, 2)) * flow_scale).astype(np.float32))
    return R0, R1, flow


def _bf16(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def test_pack_unpack_roundtrip():
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=(8, 130)).astype(np.float32) * 100)
    pk = pack_pairs(x)
    left, right = unpack_pair(pk)
    np.testing.assert_array_equal(np.asarray(left), np.asarray(_bf16(x)))
    # right neighbor: shifted by one, last column edge-replicated
    exp = np.asarray(_bf16(jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)))
    np.testing.assert_array_equal(np.asarray(right), exp)


def test_um_packed_matches_bf16_oracle():
    R0, R1, flow = _setup()
    ref = np.asarray(F.update_matrices(R0, _bf16(R1), flow, 4,
                                       sampler="windowed"))
    out = np.asarray(update_matrices_pallas(R0, R1, flow, 4, interpret=True,
                                            packed=True))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-4)


def test_umuf_packed_matches_bf16_oracle():
    R0, R1, flow = _setup(seed=3)
    m = F.update_matrices(R0, _bf16(R1), flow, 4, sampler="windowed")
    ref = np.asarray(F.update_flow(m, 5, sampler="xla"))
    out = np.asarray(umuf_pallas(R0, R1, flow, 4, 5, interpret=True,
                                 packed=True))
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-3)


def test_packed_flow_close_to_exact():
    # End-to-end sanity: packed-vs-exact flow differences stay small in px.
    R0, R1, flow = _setup(seed=5, flow_scale=0.8)
    exact = np.asarray(umuf_pallas(R0, R1, flow, 3, 5, interpret=True))
    fast = np.asarray(umuf_pallas(R0, R1, flow, 3, 5, interpret=True,
                                  packed=True))
    assert np.abs(fast - exact).max() < 0.05, np.abs(fast - exact).max()
