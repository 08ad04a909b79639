#!/usr/bin/env python
"""Calibrate a sampling-issue FLOOR for the fast (compose) path, the way
solve mode's was calibrated (bench.py::sampling_issue_model_s).

The fused compose tap kernel (ops/pallas/compose.py) executes, per
(row-tile x 128-lane) block, only the y-shifts its flow range activates
(static @pl.when predication): phase A samples the 2-channel link field at
the carried flow F, phase B samples the 1-channel neighbor at the updated
flow F'.  Its issue cost is therefore

    t_tap ~= voxels * (a + c * (2 * tripsA + 1 * tripsB))

with ``trips`` the mean active-shift count per block and ``c`` the
per-channel-trip issue cost.  This probe

1. measures the REAL per-tap trip counts of the fast mode's composed
   flows on the bench volume (chaining adjacent fields exactly like
   _of_pass_composed, counting active shifts per compose_plan block),
2. calibrates (a, c) from a hardware ladder of prepped tap scans at
   controlled flow-noise levels (link=0 keeps the carry -- and thus the
   trip count -- constant across taps, isolating the per-trip slope), and
3. assembles the pass floor: sum over taps/phases of the issue model,
   plus the adjacent-solve sampling floor (solve-mode calibration at the
   adjacent flows' measured trip counts).

  python scripts/compose_floor.py [--n 64] [--hw 256] [--sigma 2.0]

Anchor: /root/reference/src/flowdenoising_GPU.py:760-766 (the reference's
own per-phase attribution discipline).
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


def block_ranges(v, tiles):
    """Per-(slice, tile, 128-lane-block) (vmin, vmax), computed ON DEVICE
    (fetching full flow fields over the tunnel's ~16 MB/s D2H would
    dominate the probe); returns small host arrays."""
    import jax.numpy as jnp
    outs = []
    for a, th in tiles:
        vt = v[:, a:a + th]
        n, _, w = vt.shape
        vb = vt.reshape(n, th, w // 128, 128)
        outs.append((np.asarray(jnp.min(vb, axis=(1, 3))),
                     np.asarray(jnp.max(vb, axis=(1, 3)))))
    return outs


def block_trips(v, tiles, d: int) -> float:
    """Mean active-shift count over (tile-rows x 128-lane) blocks: the
    number of s in [-d, d+1] with (vmin < s+1) & (vmax > s-1), i.e. the
    static predication of _compose_kernel."""
    tot, cnt = 0.0, 0
    for vmin, vmax in block_ranges(v, tiles):
        vmin = np.clip(vmin, -d, d)
        vmax = np.clip(vmax, -d, d)
        for s in range(-d, d + 2):
            tot += float(((vmin < s + 1) & (vmax > s - 1)).sum())
        cnt += vmin.size
    return tot / cnt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--sigma", type=float, default=2.0)
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.config import FlowConfig
    from flowdenoising_tpu.core.axis_filter import pad_stack, Boundary
    from flowdenoising_tpu.kernels import get_gaussian_kernels
    from flowdenoising_tpu.ops.farneback import (
        polyexp_pyramid, flow_from_pyramids, matmul_precision)
    from flowdenoising_tpu.ops.pallas import compose as PC
    from flowdenoising_tpu.ops.warp import displace_sample

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)

    n, hw = args.n, args.hw
    taps = get_gaussian_kernels((args.sigma,) * 3)[0]
    ks2 = len(taps) // 2
    cfg = FlowConfig(levels=3, winsize=5, use_initial_flow=True,
                     precision="bfloat16", tap_mode="compose",
                     symmetric_adjacent=True)
    d = cfg.max_displacement
    tiles = PC.compose_plan(hw, hw, d, eo=False)  # packed mode: eo off
    voxels = n * hw * hw

    vol = benchmod.device_volume(n, hw, hw, seed=0)
    padded = pad_stack(vol, ks2, Boundary.WRAP)

    print(f"fast-mode floor probe: n={n} plane={hw}x{hw} taps={2 * ks2} "
          f"d={d} adj_d={cfg.adjacent_displacement} tiles={tiles}",
          flush=True)

    # ---- 1. real trip counts along the composed-flow chain ----
    import dataclasses
    adj_cfg = dataclasses.replace(
        cfg, max_displacement=min(d, cfg.adjacent_displacement))

    @jax.jit
    def adj_field(p):
        with matmul_precision(cfg):
            r_levels = polyexp_pyramid(p, cfg)
            lo = [r[:-1] for r in r_levels]
            hi = [r[1:] for r in r_levels]
            return flow_from_pyramids(lo, hi, adj_cfg, None)

    adj_fwd = adj_field(padded)
    sync(adj_fwd)
    trips_adj = block_trips(adj_fwd[..., 1], tiles,
                            min(d, cfg.adjacent_displacement))
    print(f"adjacent-field trips (d_adj clip): {trips_adj:.2f}", flush=True)

    @jax.jit
    def chain_step(flow, link):
        # one compose step, XLA form (bitwise tap semantics: clamp for
        # sampling only, carry the unclamped sum)
        link_cf = jnp.moveaxis(link, -1, -3)
        # "auto" -> Pallas sampling (the windowed XLA form materializes all
        # 2d+2 shifted copies of the link stack: 29 GB at 256^3)
        warped = displace_sample(link_cf, flow[..., 0], flow[..., 1], d,
                                 "auto")
        return flow + jnp.moveaxis(warped, -3, -1)

    def run_trips(adj, adj_shift, offsets):
        rows = []
        flow = jnp.zeros((n, hw, hw, 2), jnp.float32)
        last_flow = flow
        for o in offsets:
            start = ks2 + o
            link = adj[start + adj_shift:start + adj_shift + n]
            ta = block_trips(flow[..., 1], tiles, d)
            flow = chain_step(flow, link)
            tb = block_trips(flow[..., 1], tiles, d)
            rows.append((ta, tb))
            last_flow = flow
        return rows, last_flow

    bwd, flow_sat = run_trips(-adj_fwd, 0, [-j for j in range(1, ks2 + 1)])
    fwd, _ = run_trips(adj_fwd, -1, [+j for j in range(1, ks2 + 1)])
    print("per-tap trips (phaseA, phaseB):", flush=True)
    for lbl, rows in (("bwd", bwd), ("fwd", fwd)):
        print(f"  {lbl}: " + " ".join(f"({a:.1f},{b:.1f})"
                                      for a, b in rows), flush=True)
    w_real = sum(2 * a + b for a, b in bwd + fwd)  # channel-trips per voxel
    print(f"total channel-trips per voxel per pass: {w_real:.1f}", flush=True)

    # ---- 1b. time the REAL prepped tap scan (both outward runs, real
    # link fields), exactly as _of_pass_composed runs it -- the isolated
    # single-tap form measured ~50% above the in-pass cost (DMA/compute
    # overlap across scan steps), so (a, c) must be fitted IN-PASS ----
    kw = dict(packed=True, eo=False, dyn=False)
    nb_tiles_real = PC.prep_compose_src(padded[:, None].astype(jnp.float32),
                                        d, hw, tiles=tiles, **kw)

    def real_scan_time(adj_f):
        """Wall time of the two 8-tap prepped runs on given adjacent
        fields (everything else identical to the real pass)."""
        link_b = PC.prep_compose_src(jnp.moveaxis(-adj_f, -1, -3), d, hw,
                                     tiles=tiles, **kw)
        link_f = PC.prep_compose_src(jnp.moveaxis(adj_f, -1, -3), d, hw,
                                     tiles=tiles, **kw)

        @jax.jit
        def scan(vol_in, lb, lf, nbt):
            carry = PC.init_compose_carry(vol_in, taps[ks2], tiles, hw,
                                          jnp.float32)

            def run(carry, links, offsets, shift):
                xs = (jnp.asarray([ks2 + o for o in offsets], jnp.int32),
                      jnp.asarray([taps[ks2 + o] for o in offsets],
                                  jnp.float32))

                def body(c, xs_t):
                    start, wgt = xs_t
                    return PC.compose_tap_prepped(
                        links, nbt, c, tiles, wgt, start + shift,
                        start, d=d, w=hw, dtype=jnp.float32, **kw), None

                c, _ = jax.lax.scan(body, carry, xs)
                return c

            carry = run(carry, lb, [-j for j in range(1, ks2 + 1)], 0)
            carry = PC.reset_compose_flow(carry)
            carry = run(carry, lf, [+j for j in range(1, ks2 + 1)], -1)
            return PC.finish_compose_carry(carry, hw)

        out = scan(vol, link_b, link_f, nb_tiles_real)
        sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = scan(vol, link_b, link_f, nb_tiles_real)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    def chain_chtrips(adj_f):
        """Total channel-trips per voxel over both runs' taps for given
        adjacent fields (phase A: 2 link channels, phase B: 1)."""
        tot = 0.0
        for a_dir, shift, offs in ((-1, 0, range(-ks2, 0)),
                                   (+1, -1, range(1, ks2 + 1))):
            flow = jnp.zeros((n, hw, hw, 2), jnp.float32)
            for o in (sorted(offs, reverse=True) if a_dir < 0
                      else sorted(offs)):
                start = ks2 + o
                link = (a_dir * adj_f)[start + shift:start + shift + n]
                tot += 2 * block_trips(flow[..., 1], tiles, d)
                flow = chain_step(flow, link)
                tot += block_trips(flow[..., 1], tiles, d)
        return tot

    t_scan_raw = real_scan_time(adj_fwd)
    w_raw = w_real  # computed above
    print(f"REAL tap scan (16 taps, raw links):    {t_scan_raw:7.3f} s "
          f"({t_scan_raw / voxels / 16 * 1e9:6.4f} ns/vox/tap, "
          f"ch-trips {w_raw:.0f})", flush=True)
    # low-trip point: links estimated from a presmoothed stack (collapses
    # flow noise, the real --flow_presmooth lever)
    from flowdenoising_tpu.core.axis_filter import _estimation_stack
    cfg_ps = dataclasses.replace(cfg, presmooth=1.5)
    adj_ps = adj_field(_estimation_stack(padded, cfg_ps))
    sync(adj_ps)
    w_ps = chain_chtrips(adj_ps)
    t_scan_ps = real_scan_time(adj_ps)
    print(f"REAL tap scan (presmoothed links):     {t_scan_ps:7.3f} s "
          f"({t_scan_ps / voxels / 16 * 1e9:6.4f} ns/vox/tap, "
          f"ch-trips {w_ps:.0f})", flush=True)
    c_in = (t_scan_raw - t_scan_ps) / voxels / max(w_raw - w_ps, 1e-9) * 1e9
    a_in = (t_scan_raw / voxels * 1e9 - c_in * w_raw) / 16
    print(f"in-pass fit: a={a_in:.4f} ns/vox/tap, "
          f"c={c_in:.5f} ns/vox/channel-trip", flush=True)

    # ---- 2. calibrate (a, c) with prepped tap scans, link = 0 ----
    rng = np.random.default_rng(0)
    kw = dict(packed=True, eo=False, dyn=False)
    link0 = jnp.zeros((n, 2, hw, hw), jnp.float32)
    link_tiles = PC.prep_compose_src(link0, d, hw, tiles=tiles, **kw)
    nb_tiles = PC.prep_compose_src(padded[:n, None].astype(jnp.float32), d,
                                   hw, tiles=tiles, **kw)
    ntaps_cal = 8

    def timed_scan(flow0_np):
        u0 = jnp.asarray(flow0_np[..., 0])
        v0 = jnp.asarray(flow0_np[..., 1])
        carry0 = tuple(
            (u0[:, a:a + th], v0[:, a:a + th],
             jnp.zeros((n, th, hw), jnp.float32))
            for a, th in tiles)

        @jax.jit
        def scan(carry):
            def body(c, _):
                c2 = PC.compose_tap_prepped(
                    link_tiles, nb_tiles, c, tiles, 0.05,
                    jnp.int32(0), jnp.int32(0), d=d, w=hw,
                    dtype=jnp.float32, **kw)
                return c2, None
            c, _ = jax.lax.scan(body, carry, None, length=ntaps_cal)
            return c

        out = scan(carry0)
        sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = scan(carry0)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best / ntaps_cal

    pts = []
    for noise in (0.25, 0.8, 1.6, 3.0):
        f = jnp.asarray((rng.normal(0, noise, (n, hw, hw, 2))
                         + rng.uniform(-2, 2, (n, 1, 1, 2)))
                        .astype(np.float32))
        ta = block_trips(f[..., 1], tiles, d)
        w_ch = 3 * ta  # link=0: phase B sees the same flow -> tB = tA
        t = timed_scan(f)
        pts.append((w_ch, t))
        print(f"  noise={noise:4.2f}: trips={ta:5.2f} "
              f"ch-trips={w_ch:5.1f} t_tap={t * 1e3:7.3f} ms "
              f"({t / voxels * 1e9:6.4f} ns/vox)", flush=True)

    # real saturated chain flow (the regime taps >= 4 actually run in)
    ta_sat = block_trips(flow_sat[..., 1], tiles, d)
    t_sat = timed_scan(flow_sat)
    pts.append((3 * ta_sat, t_sat))
    print(f"  REAL chain flow: trips={ta_sat:5.2f} ch-trips={3 * ta_sat:5.1f} "
          f"t_tap={t_sat * 1e3:7.3f} ms ({t_sat / voxels * 1e9:6.4f} ns/vox)",
          flush=True)

    A = np.array([[1.0, wch] for wch, _ in pts])
    y = np.array([t / voxels * 1e9 for _, t in pts])
    (a_ns, c_ns), res, *_ = np.linalg.lstsq(A, y, rcond=None)
    fitted = A @ np.array([a_ns, c_ns])
    print(f"fit: a={a_ns:.4f} ns/vox/tap, c={c_ns:.5f} ns/vox/channel-trip "
          f"(resid {np.abs(fitted - y).max():.4f} ns)", flush=True)

    # ---- 3. assemble the per-pass floor at the REAL trip counts ----
    tap_floor = voxels * sum(a_ns + c_ns * (2 * ta + tb)
                             for ta, tb in bwd + fwd) * 1e-9
    pyr = 4.0 / 3.0
    adj_floor = voxels * 1 * pyr * cfg.iterations * trips_adj * 0.069e-9
    print(f"\nper-pass floors at n={n}, {hw}x{hw}:", flush=True)
    print(f"  tap kernels : {tap_floor * 1e3:8.2f} ms", flush=True)
    print(f"  adj solve   : {adj_floor * 1e3:8.2f} ms "
          f"(solve calibration 0.069 ns/vox/trip x {trips_adj:.1f} trips, "
          f"1 direction, {cfg.iterations} iters, pyramid x{pyr:.2f})",
          flush=True)
    print(f"  -> 3-pass volume floor per voxel: "
          f"{3 * (tap_floor + adj_floor) / voxels * 1e9:.3f} ns", flush=True)
    print(f"bench model check: fast_issue_model_s coefficients "
          f"a={a_ns:.4f} c={c_ns:.5f} trips_w={w_real:.1f} "
          f"trips_adj={trips_adj:.2f}", flush=True)


if __name__ == "__main__":
    main()
