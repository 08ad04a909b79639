#!/usr/bin/env python
"""Measure the dyn sampling kernel's ACTUAL y-shift trip counts on real
tap flows (the quantity bench.py's gather-issue floor depends on).

Chains seeded tap solves outward like a real pass (backward run), then for
each tap's flow reports the average dynamic trip count
floor(max v) - floor(min v) + 2 per (row-region x 128-lane) block, for
whole-plane regions and rg64 row groups.

  python scripts/trip_stats.py [--n 48] [--hw 256] [--taps 8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FDTPU_CACHE_DIR", "/tmp/fdtpu_probe_cache")

import numpy as np


def trips(v, rows, d):
    """Mean trip count over (row-region, 128-lane) blocks of v (n, h, w)."""
    n, h, w = v.shape
    v = np.clip(v, -d, d)
    tot, cnt = 0.0, 0
    for r0 in range(0, h, rows):
        r1 = min(r0 + rows, h)
        for x0 in range(0, w, 128):
            blk = v[:, r0:r1, x0:x0 + 128]
            lo = np.floor(blk.min(axis=(1, 2)))
            hi = np.floor(blk.max(axis=(1, 2)))
            tot += float((hi - lo + 2).sum())
            cnt += n
    return tot / cnt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--taps", type=int, default=8)
    args = ap.parse_args()

    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import importlib.util
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.config import FlowConfig
    from flowdenoising_tpu.core.axis_filter import pad_stack, Boundary
    from flowdenoising_tpu.ops.farneback import (
        polyexp_pyramid, flow_from_pyramids, _level_displacement)

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)

    n, hw = args.n, args.hw
    cfg = FlowConfig(levels=3, winsize=5, use_initial_flow=True)
    d0 = _level_displacement(cfg, 0)
    vol = jnp.asarray(benchmod.make_volume(n, hw, hw, seed=0))
    ks2 = args.taps
    padded = pad_stack(vol, ks2, Boundary.WRAP)

    r_levels = jax.jit(lambda p: polyexp_pyramid(p, cfg))(padded)
    r0_lv = [r[ks2:ks2 + n] for r in r_levels]

    solve = jax.jit(lambda r1s, f: flow_from_pyramids(
        r0_lv, r1s, cfg, f).astype(jnp.float32))

    prev = jnp.zeros((n, hw, hw, 2), jnp.float32)
    print(f"n={n} hw={hw} d0={d0}  (backward tap run, seeded)", flush=True)
    stats = []
    for j in range(1, ks2 + 1):
        start = ks2 - j
        r1_lv = [jax.lax.dynamic_slice_in_dim(r, start, n, axis=0)
                 for r in r_levels]
        prev = solve(r1_lv, prev)
        v = np.asarray(prev[..., 1])
        u = np.asarray(prev[..., 0])
        t_full = trips(v, 10 ** 9, d0)
        t_rg64 = trips(v, 64, d0)
        stats.append((t_full, t_rg64))
        print(f"tap -{j}: |v| std {v.std():.2f} max {np.abs(v).max():5.1f}  "
              f"trips/block full-plane {t_full:5.2f}  rg64 {t_rg64:5.2f}  "
              f"(u std {u.std():.2f})", flush=True)
    f = np.mean([s[0] for s in stats])
    g = np.mean([s[1] for s in stats])
    print(f"avg over taps: full {f:.2f}  rg64 {g:.2f} "
          f"(of max {2 * d0 + 2})", flush=True)


if __name__ == "__main__":
    main()
