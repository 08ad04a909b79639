#!/usr/bin/env python
"""Attribute the wall time of one OF solve pass to its stages, ON HARDWARE.

Times each stage of of_pass_padded (ops measured standalone at the pass's
real shapes, high-rep to amortize the ~32 ms remote-dispatch overhead) and
compares the sum against the measured full pass, so unattributed overhead
(XLA data movement between kernels, scan structure, transposes) becomes
visible instead of guessed.

  python scripts/pass_breakdown.py [--n 256] [--hw 256] [--taps 16]
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
    # index the first element without reshape(-1): a reshape of a
    # channels-last (B,H,W,5) array forces a fully padded T(8,128) copy
    # (25x memory) and OOMs at 1024-wide shapes
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
    args = ap.parse_args()

    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.config import FlowConfig
    from flowdenoising_tpu.core.axis_filter import of_pass_padded, pad_stack, Boundary
    from flowdenoising_tpu.kernels import get_gaussian_kernels
    from flowdenoising_tpu.ops.farneback import (
        polyexp_pyramid, flow_from_pyramids, _level_displacement)
    from flowdenoising_tpu.ops.pallas.umuf import umuf_iterate
    from flowdenoising_tpu.ops.warp import warp_slices
    from flowdenoising_tpu.ops.resize import pyramid_sizes

    n, hw = args.n, args.hw
    taps = get_gaussian_kernels((args.sigma,) * 3)[0]
    ks2 = len(taps) // 2
    ntaps = 2 * ks2
    cfg = FlowConfig(levels=3, winsize=5, use_initial_flow=True)
    d0 = cfg.max_displacement

    rng = np.random.default_rng(0)
    if os.environ.get("PROBE_NOISE", "0") == "1":
        # pure-noise volume: flows are garbage-large, upper-bounds the dyn
        # kernel's shift window
        vol = jnp.asarray(rng.normal(size=(n, hw, hw)).astype(np.float32) * 50)
        flow_amp = 1.0
        smooth = False
    else:
        # drifting-blob volume (bench.py's make_volume): realistic flow
        # magnitudes, the regime the dyn kernel is tuned for
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "benchmod", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench.py"))
        benchmod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(benchmod)
        vol = jnp.asarray(benchmod.make_volume(n, hw, hw, seed=0))
        flow_amp = 3.0
        smooth = True

    def synth_flow(shape):
        f = rng.normal(size=shape).astype(np.float32)
        if smooth:
            from scipy.ndimage import gaussian_filter
            for i in range(shape[0]):
                for c in range(shape[-1]):
                    f[i, ..., c] = gaussian_filter(f[i, ..., c], 8.0)
            f *= flow_amp / (np.abs(f).max() + 1e-9)
        return jnp.asarray(f)
    padded = pad_stack(vol, ks2, Boundary.WRAP)
    npad = n + 2 * ks2

    print(f"pass: n={n} plane={hw}x{hw} taps={ntaps} levels={cfg.levels} "
          f"d={d0}", flush=True)

    # --- full pass ---
    t_pass = timed(lambda c, p: of_pass_padded(p, taps, cfg) + c * 0,
                   vol, padded, reps=1, outer=2)
    print(f"full of_pass_padded: {t_pass:8.3f} s", flush=True)

    # --- stage: polyexp pyramid over the padded stack (once per pass) ---
    t_pe = timed(lambda c, p: polyexp_pyramid(p, cfg)[0][ks2:ks2 + n, ..., 0]
                 + c * 0, vol, padded, reps=4, outer=2)
    print(f"polyexp_pyramid (once):           {t_pe:8.3f} s", flush=True)

    # --- stage: one full pyramid solve (per tap) ---
    r_levels = jax.jit(lambda p: polyexp_pyramid(p, cfg))(padded)
    r0_lv = [r[ks2:ks2 + n] for r in r_levels]
    r1_lv = [r[0:n] for r in r_levels]
    for r in r0_lv:
        sync(r)
    flow0 = synth_flow((n, hw, hw, 2))

    t_solve = timed(
        lambda f, a, b: flow_from_pyramids(a, b, cfg, f).astype(jnp.float32),
        flow0, r0_lv, r1_lv, reps=4, outer=2)
    print(f"pyramid solve (x{ntaps} taps):        {t_solve:8.4f} s "
          f"-> {t_solve * ntaps:8.3f} s", flush=True)

    # --- sub-stage: umuf chains per level ---
    sizes = pyramid_sizes(hw, hw, cfg.levels, cfg.pyr_scale)
    t_umuf_total = 0.0
    for k in range(cfg.levels + 1):
        hk, wk = sizes[k]
        dk = _level_displacement(cfg, k)
        r0k = r0_lv[k]
        r1k = r1_lv[k]
        fk = synth_flow((n, hk, wk, 2))
        reps = 8 if k == 0 else 32
        t = timed(lambda f, a, b: umuf_iterate(a, b, f, cfg.iterations, dk,
                                               cfg.winsize, dyn=True, mxu=True),
                  fk, r0k, r1k, reps=reps, outer=2)
        t_umuf_total += t
        print(f"  umuf_iterate L{k} ({hk}x{wk}, d={dk}):   {t:8.4f} s",
              flush=True)
    print(f"umuf all levels (x{ntaps} taps):      {t_umuf_total:8.4f} s "
          f"-> {t_umuf_total * ntaps:8.3f} s", flush=True)

    # --- stage: warp at full res (per tap) ---
    flw = jnp.asarray(rng.uniform(-1, 1, size=(n, hw, hw, 2)).astype(np.float32))
    t_warp = timed(lambda c, f: warp_slices(c, f, d0, cfg.sampler),
                   vol, flw, reps=16, outer=2)
    print(f"warp_slices (x{ntaps} taps):          {t_warp:8.4f} s "
          f"-> {t_warp * ntaps:8.3f} s", flush=True)

    attributed = (t_pe + (t_solve + t_warp) * ntaps)
    print(f"\nattributed: polyexp {t_pe:.3f} + taps*(solve {t_solve:.4f} + "
          f"warp {t_warp:.4f}) = {attributed:8.3f} s", flush=True)
    print(f"full pass:  {t_pass:8.3f} s   "
          f"unattributed: {t_pass - attributed:8.3f} s "
          f"({100 * (t_pass - attributed) / t_pass:.1f}%)", flush=True)
    print(f"solve-side breakdown: umuf {t_umuf_total * ntaps:.3f} s of "
          f"solve {t_solve * ntaps:.3f} s -> non-umuf (resize/seed/XLA glue) "
          f"{(t_solve - t_umuf_total) * ntaps:.3f} s", flush=True)


if __name__ == "__main__":
    main()
