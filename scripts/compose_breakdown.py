#!/usr/bin/env python
"""Attribute the wall time of one COMPOSE-mode OF pass to its stages, ON
HARDWARE (fast-path twin of pass_breakdown.py, which covers solve mode).

Stages of _of_pass_composed (core/axis_filter.py):
  1. polyexp_pyramid over the padded stack (once per pass)
  2. adjacent-pair pyramid solve (one direction; symmetric mode negates it)
  3. tap scan: 2*ks2 fused compose_tap_pallas steps

  python scripts/compose_breakdown.py [--n 256] [--hw 256] [--bf16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FDTPU_CACHE_DIR", "/tmp/fdtpu_probe_cache")

import numpy as np


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(leaf[(0,) * leaf.ndim])


def timed(fn, *args, reps=8, outer=2):
    import jax

    @jax.jit
    def many(c, *cs):
        def body(cc, _):
            return fn(cc, *cs), None
        out, _ = jax.lax.scan(body, c, None, length=reps)
        return out

    out = many(*args)
    sync(out)
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        out = many(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--sigma", type=float, default=2.0)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--no-sym", action="store_true")
    args = ap.parse_args()

    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.config import FlowConfig
    from flowdenoising_tpu.core.axis_filter import (
        of_pass_padded, pad_stack, Boundary)
    from flowdenoising_tpu.kernels import get_gaussian_kernels
    from flowdenoising_tpu.ops.farneback import (
        polyexp_pyramid, flow_from_pyramids, matmul_precision)
    from flowdenoising_tpu.ops.pallas.compose import compose_tap_pallas

    n, hw = args.n, args.hw
    taps = get_gaussian_kernels((args.sigma,) * 3)[0]
    ks2 = len(taps) // 2
    ntaps = 2 * ks2
    precision = "bfloat16" if args.bf16 else "float32"
    cfg = FlowConfig(levels=3, winsize=5, use_initial_flow=True,
                     precision=precision, tap_mode="compose",
                     symmetric_adjacent=not args.no_sym)
    d = cfg.max_displacement
    packed = precision == "bfloat16"
    dtype = jnp.dtype(cfg.dtype)

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    vol = jnp.asarray(benchmod.make_volume(n, hw, hw, seed=0))
    padded = pad_stack(vol.astype(dtype), ks2, Boundary.WRAP)

    print(f"compose pass: n={n} plane={hw}x{hw} taps={ntaps} "
          f"levels={cfg.levels} d={d} precision={precision} "
          f"sym={cfg.symmetric_adjacent}", flush=True)

    # --- full pass ---
    t_pass = timed(lambda c, p: of_pass_padded(p, taps, cfg) + c * 0,
                   vol, padded, reps=2, outer=2)
    print(f"full of_pass_padded (compose): {t_pass:8.3f} s", flush=True)

    # --- stage 1: polyexp pyramid over the padded stack ---
    t_pe = timed(lambda c, p: polyexp_pyramid(p, cfg)[0][ks2:ks2 + n, ..., 0]
                 + c * 0, vol, padded, reps=4, outer=2)
    print(f"polyexp_pyramid (once):        {t_pe:8.3f} s", flush=True)

    # --- stage 2: adjacent-pair solve (one direction) ---
    adj_cfg = cfg
    if cfg.adjacent_displacement is not None and d is not None:
        adj_cfg = dataclasses.replace(
            cfg, max_displacement=min(d, cfg.adjacent_displacement))

    def adj_solve(c, p):
        with matmul_precision(cfg):
            r_levels = polyexp_pyramid(p, cfg)
            lo = [r[:-1] for r in r_levels]
            hi = [r[1:] for r in r_levels]
            f = flow_from_pyramids(lo, hi, adj_cfg, None)
        return f[:c.shape[0], ..., 0] + c * 0

    t_adj = timed(adj_solve, vol, padded, reps=2, outer=2)
    t_adj_only = t_adj - t_pe
    ndir = 1 if cfg.symmetric_adjacent else 2
    print(f"polyexp + adjacent solve:      {t_adj:8.3f} s "
          f"(solve alone ~{t_adj_only:6.3f} s x{ndir} dir)", flush=True)

    # --- stage 3: one fused compose tap step (x ntaps) ---
    rng = np.random.default_rng(0)
    link = jnp.asarray(rng.uniform(-0.5, 0.5, (n, hw, hw, 2)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-2, 2, (n, hw, hw, 2)).astype(np.float32))
    nb = vol
    acc = vol * 0.1

    def tap_step(a, lk, fl, v):
        f2, a2 = compose_tap_pallas(lk, fl, v, a, 0.05, d, packed=packed)
        return a2 + f2[..., 0] * 0

    t_tap = timed(tap_step, acc, link, flow, nb, reps=4, outer=2)
    print(f"fused tap step (x{ntaps}):         {t_tap:8.4f} s "
          f"-> {t_tap * ntaps:8.3f} s", flush=True)

    attributed = t_pe + t_adj_only * ndir + t_tap * ntaps
    print(f"\nattributed: polyexp {t_pe:.3f} + adj {t_adj_only * ndir:.3f} + "
          f"taps {t_tap * ntaps:.3f} = {attributed:8.3f} s", flush=True)
    print(f"full pass:  {t_pass:8.3f} s   "
          f"unattributed: {t_pass - attributed:8.3f} s "
          f"({100 * (t_pass - attributed) / t_pass:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
