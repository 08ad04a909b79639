#!/usr/bin/env python
"""Hardware self-check: Pallas kernels UNDER shard_map on the real TPU.

The CPU-mesh sharding tests route to XLA fallbacks (pallas_supported() is
false there) and the single-TPU CLI takes the unsharded path, so the
composition of the scalar-prefetch / fused iteration kernels with shard_map
partitioning only executes here: a 1-device TPU mesh must reproduce the
unsharded pipeline exactly, with the default (Pallas) sampler, in solve and
compose modes, and with per-shard slabbing active.

Usage: python scripts/verify_tpu_sharded.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from flowdenoising_tpu.config import Boundary, FilterConfig, FlowConfig
from flowdenoising_tpu.core.pipeline import denoise
from flowdenoising_tpu.ops.pallas.sample import pallas_supported
from flowdenoising_tpu.parallel.mesh import denoise_sharded, make_mesh


def make_vol(z, h, w, seed=0):
    """Drifting smooth blob volume (same family as the quality tiers)."""
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    centers = r.uniform(0.2, 0.8, size=(10, 2)).astype(np.float32)
    rads = r.uniform(4, 12, size=10).astype(np.float32)
    amps = r.uniform(60, 180, size=10).astype(np.float32)
    vol = np.zeros((z, h, w), np.float32)
    for k in range(z):
        dy, dx = 0.35 * k, -0.22 * k
        for (cy, cx), rad, amp in zip(centers, rads, amps):
            vol[k] += amp * np.exp(-(((yy - cy * h - dy) ** 2)
                                     + ((xx - cx * w - dx) ** 2))
                                   / (2 * rad * rad))
    vol += r.normal(scale=6.0, size=vol.shape).astype(np.float32)
    return vol


def check(name, a, b, tol):
    d = float(np.abs(np.asarray(a) - np.asarray(b)).max())
    status = "OK " if d <= tol else "FAIL"
    print(f"[{status}] {name}: maxdiff {d:.3e} (tol {tol:.0e})", flush=True)
    return d <= tol


def main():
    if not pallas_supported():
        print("no TPU backend; nothing to verify")
        return 0
    print(f"devices: {jax.devices()}", flush=True)
    vol = make_vol(24, 128, 128, seed=3)
    mesh = make_mesh(1)
    ok = True

    # solve mode, levels=3, default sampler (Pallas fused iteration kernels)
    cfg = FilterConfig(sigma=(2.0, 2.0, 2.0), boundary=Boundary.WRAP,
                       flow=FlowConfig(levels=3, winsize=5))
    single = np.asarray(denoise(vol, cfg))
    sharded = denoise_sharded(vol, cfg, mesh=mesh)
    ok &= check("solve f32 pallas sharded(1) == single", sharded, single, 5e-3)

    # compose + symmetric fast mode (prepped compose tap kernel)
    cfgc = FilterConfig(sigma=(2.0, 2.0, 2.0), boundary=Boundary.WRAP,
                        flow=FlowConfig(levels=3, winsize=5,
                                        tap_mode="compose",
                                        symmetric_adjacent=True))
    singlec = np.asarray(denoise(vol, cfgc))
    shardedc = denoise_sharded(vol, cfgc, mesh=mesh)
    ok &= check("compose+sym pallas sharded(1) == single", shardedc, singlec,
                5e-3)

    # bf16 fast precision
    cfgb = FilterConfig(sigma=(2.0, 2.0, 2.0), boundary=Boundary.WRAP,
                        flow=FlowConfig(levels=3, winsize=5,
                                        precision="bfloat16"))
    singleb = np.asarray(denoise(vol, cfgb))
    shardedb = denoise_sharded(vol, cfgb, mesh=mesh)
    ok &= check("bf16 pallas sharded(1) == single", shardedb, singleb, 5e-3)

    # slabbing active INSIDE shard_map (explicit slab smaller than the axis)
    cfgs = FilterConfig(sigma=(2.0, 2.0, 2.0), boundary=Boundary.WRAP,
                        flow=FlowConfig(levels=3, winsize=5), slab_size=10)
    shardeds = denoise_sharded(vol, cfgs, mesh=mesh)
    ok &= check("solve f32 pallas sharded(1) slab=10 == single", shardeds,
                single, 5e-3)

    # estimation presmooth under shard_map
    cfgp = FilterConfig(sigma=(2.0, 2.0, 2.0), boundary=Boundary.WRAP,
                        flow=FlowConfig(levels=3, winsize=5, presmooth=1.5))
    singlep = np.asarray(denoise(vol, cfgp))
    shardedp = denoise_sharded(vol, cfgp, mesh=mesh)
    ok &= check("presmooth pallas sharded(1) == single", shardedp, singlep,
                5e-3)

    print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
