#!/usr/bin/env python
"""Hardware self-check: runs each Pallas kernel on the attached TPU and
asserts exact agreement with its XLA reference formulation.  Complements the
interpreter-mode unit tests (which run on CPU).

Usage: python scripts/verify_tpu.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from flowdenoising_tpu.ops import farneback as F
from flowdenoising_tpu.ops.warp import bilinear_displace_windowed, warp_slices
from flowdenoising_tpu.ops.pallas.sample import bilinear_displace_pallas, pallas_supported
from flowdenoising_tpu.ops.pallas.update_matrices import update_matrices_pallas
from flowdenoising_tpu.ops.pallas.update_flow import update_flow_pallas


def check(name, a, b, tol):
    d = float(jnp.abs(a - b).max())
    status = "OK " if d <= tol else "FAIL"
    print(f"[{status}] {name}: maxdiff {d:.3e} (tol {tol:.0e})")
    return d <= tol


def main():
    if not pallas_supported():
        print("no TPU backend; nothing to verify")
        return 0
    r = np.random.default_rng(0)
    ok = True

    img = jnp.asarray(r.normal(size=(8, 192, 160)).astype(np.float32) * 50)
    u = jnp.asarray((r.normal(size=(8, 192, 160)) * 2.5).astype(np.float32))
    v = jnp.asarray((r.normal(size=(8, 192, 160)) * 2.5).astype(np.float32))
    ok &= check("sample kernel",
                bilinear_displace_pallas(img, u, v, 6),
                bilinear_displace_windowed(img, u, v, 6), 2e-4)

    img0 = jnp.asarray(r.normal(size=(6, 128, 192)).astype(np.float32) * 40)
    img1 = jnp.asarray(r.normal(size=(6, 128, 192)).astype(np.float32) * 40)
    R0 = F.poly_expand(img0)
    R1 = F.poly_expand(img1)
    flow = jnp.asarray((r.normal(size=(6, 128, 192, 2)) * 1.5).astype(np.float32))
    ok &= check("update_matrices kernel",
                update_matrices_pallas(R0, R1, flow, 4),
                F.update_matrices(R0, R1, flow, 4, sampler="windowed"), 5e-4)

    m = F.update_matrices(R0, R1, flow, 4, sampler="windowed")
    ok &= check("update_flow kernel",
                update_flow_pallas(m, 5),
                F.update_flow(m, 5, sampler="windowed"), 1e-4)

    ok &= check("warp dispatch (auto==windowed)",
                warp_slices(img, jnp.stack([u, v], -1), 6, "auto"),
                bilinear_displace_windowed(img, u, v, 6), 2e-4)

    from flowdenoising_tpu.ops.pallas.umuf import umuf_pallas
    ok &= check("fused UM+UF kernel",
                umuf_pallas(R0, R1, flow, 4, 5),
                F.update_flow(
                    F.update_matrices(R0, R1, flow, 4, sampler="windowed"),
                    5, sampler="windowed"), 5e-4)

    bf = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
    ok &= check("packed bf16-pair UM+UF kernel",
                umuf_pallas(R0, R1, flow, 4, 5, packed=True),
                F.update_flow(
                    F.update_matrices(R0, bf(R1), flow, 4, sampler="windowed"),
                    5, sampler="windowed"), 5e-3)

    print("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
