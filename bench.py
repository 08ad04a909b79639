#!/usr/bin/env python
"""Benchmark: TPU OF-compensated denoise throughput vs the CPU reference path.

Prints ONE JSON line whose headline `value`/`vs_baseline` is the
REFERENCE-PARITY mode (per-tap Farneback solves, float32 -- the exact
semantics of /root/reference/src/flowdenoising.py:285-290), with the
documented fast mode (adjacent-pair compose + bf16 + symmetric links; see
QUALITY.md for its quality deltas) reported alongside under `fast`:

  {"metric": ..., "value": <solve Mvox/s>, "unit": "Mvoxel/s",
   "vs_baseline": <solve / measured cv2 single-core>,
   "fast": {...}, "roofline": {...}}

- TPU side: jit-compiled full 3-pass OF denoise (sigma=2 -> 17 taps/axis,
  levels=3, winsize=5, wrap boundary -- the reference main CLI defaults) on a
  synthetic drifting-blob volume, timed after warmup.
- Baseline side: the reference algorithm (cv2.calcOpticalFlowFarneback +
  cv2.remap, identical tap/chaining semantics) timed on a few slices of the
  same plane size and converted to Mvoxel/s.  The reference repo publishes no
  numbers (BASELINE.md) and this host exposes ONE CPU core, so the multicore
  comparison in BASELINE.md maps through an assumed linear thread scale-up --
  flagged in `cpu_baseline_note`.
- Roofline: an analytic HBM-traffic model of the 3-pass program (channel
  counts per stage x voxels) against the v5e HBM peak, so the headroom the
  kernels still have is visible in every bench record.

Env knobs: BENCH_SIZE (default 256), BENCH_BASELINE_Z (default 4; 0 skips
the cv2 measurement, leaving vs_baseline null), BENCH_MODE (of|gauss|batch),
BENCH_SKIP_FAST=1 to bench only parity mode, BENCH_REPS (default 3 timed
reps after warmup; best-of is reported).
"""

import json
import os
import sys
import time

import numpy as np

V5E_HBM_GBPS = 819.0  # v5e peak HBM bandwidth


def make_volume(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    pad = 16
    yy, xx = np.mgrid[0:h + 2 * pad, 0:w + 2 * pad]
    base = np.zeros((h + 2 * pad, w + 2 * pad), np.float32)
    for _ in range(30):
        cy = rng.uniform(pad, h + pad)
        cx = rng.uniform(pad, w + pad)
        rad = rng.uniform(4, 18)
        amp = rng.uniform(50, 200)
        base += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * rad * rad))
    vol = np.zeros((n, h, w), np.float32)
    oy = ox = float(pad)
    for z in range(n):
        iy, ix = int(round(oy)), int(round(ox))
        vol[z] = base[iy:iy + h, ix:ix + w]
        oy = min(max(oy + rng.uniform(-0.7, 0.7), 0), 2 * pad - 1)
        ox = min(max(ox + rng.uniform(-0.7, 0.7), 0), 2 * pad - 1)
    # float32 noise stream: ~4x faster than normal()+astype on this host
    # (vol gen was 147s of a 512^3 bench run with the float64 stream)
    vol += 8.0 * rng.standard_normal(size=vol.shape, dtype=np.float32)
    return vol


def bench_tpu(vol, cfg):
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.core.pipeline import denoise

    def fn(v):
        return denoise(v, cfg)

    jfn = jax.jit(fn)
    v = jax.device_put(jnp.asarray(vol))
    # warmup + compile; a scalar fetch forces synchronization (more robust
    # than block_until_ready across PJRT transports)
    out = jfn(v)
    float(out[0, 0, 0])
    best = float("inf")
    # best-of-N: the shared TPU tunnel shows multi-x slowdowns on single
    # reps (observed 4-5x on 2026-08-19); three reps ride out most spikes
    for _ in range(int(os.environ.get("BENCH_REPS", "3"))):
        t0 = time.perf_counter()
        out = jfn(v)
        float(out[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def bench_tpu_batch(vols, cfg):
    """Throughput mode (BASELINE config 5): denoise a stream of volumes via
    denoise_many -- a background thread stages volume i+1 (host copy + H2D)
    while volume i computes.  Returns per-volume seconds including the
    staged host->device transfers.

    Warmup is ONE single-volume run (compiles all pass executables); the
    batch itself is then timed once, streaming from host memory.  Repeating
    large batch calls in one process degrades on the remote-PJRT transport
    (deferred deallocation churn), so the first post-warm batch is the
    representative steady-state figure.
    """
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.core.pipeline import denoise, denoise_many

    out = denoise(jnp.asarray(vols[0]), cfg)   # warmup + compile
    float(out[0, 0, 0])
    del out
    t0 = time.perf_counter()
    outs = denoise_many(list(vols), cfg)
    float(outs[-1][0, 0, 0])
    return (time.perf_counter() - t0) / len(vols)


def bench_cpu_reference(z, h, w, sigma, levels, winsize):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import ref_pipeline as R
    from flowdenoising_tpu.kernels import get_gaussian_kernels
    vol = make_volume(z, h, w, seed=1)
    ks = get_gaussian_kernels((sigma,) * 3)
    t0 = time.perf_counter()
    # one Z-pass over z slices = z/(Z) of a full Z pass; scale to the 3-pass
    # cost analytically: passes are symmetric in slice count x tap count.
    R.of_filter_axis_wrap(vol, ks[0], 0, levels, winsize, seeded=True)
    dt_pass = time.perf_counter() - t0
    voxels = vol.size
    # full pipeline = 3 such passes over the same voxel count
    rate = voxels / (3 * dt_pass) / 1e6
    return rate


def sampling_issue_model_s(voxels, ks2, iters, trips=10.6,
                           per_trip_voxel_ns=0.069):
    """CALIBRATED floor of the fused Farneback iteration's sampling loop.

    Round-2 hardware decomposition (scripts/prepped_probe.py with real-
    statistics flows, scripts/trip_stats.py on real seeded tap flows of
    this bench volume):

    - The kernel's cost is the dynamic y-shift trip loop.  Pre-eo the
      issue cost was ~0.100 ns/voxel/trip (measured 0.84 ms per trip on
      a 128x256^2 tile at d=9; ~47% lane gathers, ~37% rolls/selects/
      weights/fma, ~16% overlapped operand DMA).  The default eo
      (even/odd-deinterleaved) sampling halves the gathers and drops the
      window selects; its per-trip cost is derived from the measured
      bitwise A/B (full 256^3 solve 4.82 -> 3.36 s at ~97% kernel share):
      0.100 x 0.69 ~= 0.069 ns/voxel/trip.
    - Trips are DATA-bound: per-pixel flow noise (std ~1.4 px on this
      noisy volume) keeps any (rows x 128-lane) block's y-range wide.
      Measured per-block average: 12.2 trips whole-plane, 10.6 with the
      default 64-row groups (max 2d+2 = 20).

    Floor = voxels x 3 passes x taps x pyramid-factor x iters x trips x
    per-trip cost.  Operand DMA is overlapped (the no-compute pipeline
    floor was ~16% of kernel time pre-eo, ~2.2x that share with eo's
    phase-copy operands -- still hidden) and excluded.
    """
    taps = 2 * ks2
    pyr = 4.0 / 3.0
    return (voxels * 3 * taps * pyr * iters * trips
            * per_trip_voxel_ns * 1e-9)


def hbm_model_bytes_per_voxel(ks2, iters, tap_mode, precision):
    """Analytic HBM traffic per voxel for the FULL 3-pass program.

    Channel-counts per stage at level 0, with the pyramid geometric factor
    (sum of 0.25^k ~ 4/3) applied to per-level work.  f32 channels; bf16
    halves the sampled-read traffic of the iteration.
    """
    taps = 2 * ks2
    pyr = 4.0 / 3.0
    # polynomial expansion: read image (1) + write 5ch expansion, per level
    polyexp = (1 + 5) * pyr
    # fused UM+UF iteration: read r0(5) + r1 sampled + flow(2) -> write
    # flow(2); per tap-solve, per iteration, per level.  The default f32
    # eo sampling reads the deinterleaved phase-copy reference form
    # (~2.2x the 5 interleaved channels); bf16 packed keeps the 1x form.
    r1_ch = 5 * 2.2 if precision != "bfloat16" else 5
    it_read = 5 + r1_ch + 2
    it = (it_read + 2) * iters * pyr
    warp = (1 + 2 + 1)  # read neighbor + flow, write warped/acc
    if tap_mode == "solve":
        solves = taps
        compose = 0.0
    else:
        solves = 2  # two adjacent directions over the stack
        compose = taps * (2 + 2 + 2)  # read link+flow, write composed flow
    per_pass = polyexp + solves * it + taps * warp + compose
    scale = 0.75 if precision == "bfloat16" else 1.0
    return 3 * per_pass * 4 * scale


def main():
    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    size = int(os.environ.get("BENCH_SIZE", "256"))
    mode = os.environ.get("BENCH_MODE", "of")
    baseline_z = int(os.environ.get("BENCH_BASELINE_Z", "4"))
    skip_fast = os.environ.get("BENCH_SKIP_FAST", "0") == "1"
    sigma = 2.0
    levels, winsize = 3, 5
    ks2 = 8  # sigma=2 -> 17 taps

    from flowdenoising_tpu.config import Boundary, FilterConfig, FlowConfig

    def make_cfg(tap_flow, precision, symmetric=False):
        return FilterConfig(
            sigma=(sigma,) * 3, boundary=Boundary.WRAP,
            use_flow=(mode != "gauss"),
            flow=FlowConfig(levels=levels, winsize=winsize,
                            use_initial_flow=True, precision=precision,
                            tap_mode=tap_flow, symmetric_adjacent=symmetric),
            slab_size=None)

    vol = make_volume(size, size, size, seed=0)
    voxels = vol.size

    if mode == "batch":
        cfg = make_cfg("compose", "bfloat16", True)
        # Derive the stream from ONE generated volume and ONE noise array
        # (rolled differently per volume): contents stay distinct (no
        # device-side aliasing, realistic flow stats) while avoiding
        # ~2 min/volume of host-side RNG on this 1-core machine.
        rng = np.random.default_rng(99)
        noise = rng.standard_normal(size=vol.shape, dtype=np.float32) * 4.0
        vols = [np.roll(vol, 5 * s, axis=0) + np.roll(noise, 31 * s, axis=2)
                for s in range(int(os.environ.get("BENCH_BATCH_N", "4")))]
        dt = bench_tpu_batch(vols, cfg)
        print(json.dumps({
            "metric": f"OF denoise batch-of-4 throughput, {size}^3 "
                      f"compose bf16 sym, sigma=2, levels=3, winsize=5",
            "value": round(voxels / dt / 1e6, 3), "unit": "Mvoxel/s",
            "vs_baseline": None, "tpu_seconds_per_volume": round(dt, 3)}))
        return
    if mode == "gauss":
        cfg = make_cfg("solve", "float32")
        dt = bench_tpu(vol, cfg)
        print(json.dumps({
            "metric": f"Gaussian denoise throughput, {size}^3 f32",
            "value": round(voxels / dt / 1e6, 3), "unit": "Mvoxel/s",
            "vs_baseline": None, "tpu_seconds": round(dt, 3)}))
        return

    # --- reference-parity mode (headline) ---
    dt_solve = bench_tpu(vol, make_cfg("solve", "float32"))
    solve_rate = voxels / dt_solve / 1e6

    # --- presmoothed solve: same per-tap solve semantics, flows estimated
    # from a lightly blurred operand copy (quality >= parity on the noisy
    # tiers, QUALITY.md); suppressing flow noise cuts the sampling kernels'
    # data-bound trip counts on the noisy first pass ---
    presmooth = None
    if not skip_fast:
        import dataclasses
        cfg_ps = make_cfg("solve", "float32")
        cfg_ps = dataclasses.replace(
            cfg_ps, flow=dataclasses.replace(cfg_ps.flow, presmooth=1.5))
        dt_ps = bench_tpu(vol, cfg_ps)
        presmooth = {"flow_presmooth": 1.5,
                     "value": round(voxels / dt_ps / 1e6, 3),
                     "tpu_seconds": round(dt_ps, 3)}

    # --- documented fast mode ---
    fast = None
    if not skip_fast:
        dt_fast = bench_tpu(vol, make_cfg("compose", "bfloat16", True))
        fast = {"tap_flow": "compose", "precision": "bfloat16",
                "symmetric_adjacent": True,
                "value": round(voxels / dt_fast / 1e6, 3),
                "tpu_seconds": round(dt_fast, 3)}

    cpu_rate = None
    if baseline_z > 0:
        cpu_rate = bench_cpu_reference(baseline_z, size, size, sigma, levels,
                                       winsize)
    if fast is not None and cpu_rate:
        fast["vs_baseline"] = round(fast["value"] / cpu_rate, 2)
    if presmooth is not None and cpu_rate:
        presmooth["vs_baseline"] = round(presmooth["value"] / cpu_rate, 2)

    # --- roofline ---
    bpv_solve = hbm_model_bytes_per_voxel(ks2, 3, "solve", "float32")
    achieved = voxels * bpv_solve / dt_solve / 1e9
    issue_floor = sampling_issue_model_s(voxels, ks2, 3)
    roofline = {
        "hbm_model_bytes_per_voxel_solve": round(bpv_solve, 1),
        "achieved_GBps_solve": round(achieved, 1),
        "hbm_roofline_pct_solve": round(100.0 * achieved / V5E_HBM_GBPS, 1),
        # the binding resource: the sampling trip loop's measured issue
        # cost at measured real-flow trip counts (see
        # sampling_issue_model_s); solve time over this calibrated floor
        "sampling_issue_floor_s_solve": round(issue_floor, 2),
        "sampling_issue_floor_pct_solve": round(
            100.0 * issue_floor / dt_solve, 1),
    }
    if fast is not None:
        bpv_fast = hbm_model_bytes_per_voxel(ks2, 3, "compose", "bfloat16")
        ach_f = voxels * bpv_fast / fast["tpu_seconds"] / 1e9
        roofline.update({
            "hbm_model_bytes_per_voxel_fast": round(bpv_fast, 1),
            "achieved_GBps_fast": round(ach_f, 1),
            "hbm_roofline_pct_fast": round(100.0 * ach_f / V5E_HBM_GBPS, 1),
        })

    result = {
        "metric": f"OF denoise throughput, {size}^3, REFERENCE-PARITY mode "
                  f"(per-tap solve, f32), sigma=2 (17 taps/axis), "
                  f"levels={levels}, winsize={winsize}",
        "value": round(solve_rate, 3),
        "unit": "Mvoxel/s",
        "vs_baseline": round(solve_rate / cpu_rate, 2) if cpu_rate else None,
        "tpu_seconds": round(dt_solve, 3),
        "cpu_reference_Mvoxel_s": round(cpu_rate, 4) if cpu_rate else None,
        "cpu_baseline_note": "cv2 reference measured on 1 core of this host "
                             f"over {baseline_z} slices; multicore figures in "
                             "BASELINE.md assume linear thread scaling "
                             "(host has a single core)",
        "presmooth": presmooth,
        "fast": fast,
        "roofline": roofline,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
