#!/usr/bin/env python
"""Benchmark: TPU OF-compensated denoise throughput vs the CPU reference path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mvoxel/s", "vs_baseline": N, ...}

- TPU side: jit-compiled full 3-pass OF denoise (sigma=2 -> 17 taps/axis,
  levels=3, winsize=5, wrap boundary -- the reference main CLI defaults) on a
  synthetic drifting-blob volume, timed after warmup.
- Baseline side: the reference algorithm (cv2.calcOpticalFlowFarneback +
  cv2.remap, identical tap/chaining semantics) timed on a smaller volume of
  the same slice extent, converted to Mvoxel/s.  The reference repo publishes
  no numbers (BASELINE.md), so this measured oracle is the baseline.

Env knobs: BENCH_SIZE (default 256), BENCH_BASELINE_Z (default 4; 0 skips,
using a cached/default baseline rate), BENCH_MODE (of|gauss),
BENCH_PRECISION (float32|bfloat16 -- the bf16 fast mode: single-pass MXU +
packed bf16-pair sampling; parity vs f32 is documented in QUALITY.md).
"""

import json
import os
import sys
import time

import numpy as np


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
    vol += rng.normal(scale=8.0, size=vol.shape).astype(np.float32)
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
    for _ in range(2):
        t0 = time.perf_counter()
        out = jfn(v)
        float(out[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best, None


def bench_tpu_batch(vols, cfg):
    """Throughput mode (BASELINE config 5): denoise a stream of volumes via
    denoise_many so dispatch of volume i+1 overlaps device compute of
    volume i.  Returns per-volume seconds in steady state."""
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.core.pipeline import denoise_many

    vs = [jax.device_put(jnp.asarray(v)) for v in vols]
    outs = denoise_many(vs, cfg)           # warmup + compile
    float(outs[-1][0, 0, 0])
    t0 = time.perf_counter()
    outs = denoise_many(vs, cfg)
    float(outs[-1][0, 0, 0])
    return (time.perf_counter() - t0) / len(vs)


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


def main():
    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    size = int(os.environ.get("BENCH_SIZE", "256"))
    mode = os.environ.get("BENCH_MODE", "of")
    baseline_z = int(os.environ.get("BENCH_BASELINE_Z", "4"))
    precision = os.environ.get("BENCH_PRECISION", "float32")
    # Default tap mode is "compose" (adjacent-pair solves + flow-field
    # composition): output quality matches the per-tap-solve parity mode to
    # within 0.1 dB PSNR-vs-clean on the QUALITY.md evaluation while running
    # ~4x faster.  BENCH_TAP_FLOW=solve benches the reference-parity path.
    tap_flow = os.environ.get("BENCH_TAP_FLOW", "compose")
    sigma = 2.0
    levels, winsize = 3, 5

    from flowdenoising_tpu.config import Boundary, FilterConfig, FlowConfig
    cfg = FilterConfig(
        sigma=(sigma,) * 3, boundary=Boundary.WRAP, use_flow=(mode != "gauss"),
        flow=FlowConfig(levels=levels, winsize=winsize, use_initial_flow=True,
                        precision=precision, tap_mode=tap_flow),
        slab_size=None)

    vol = make_volume(size, size, size, seed=0)
    if mode == "batch":
        vols = [make_volume(size, size, size, seed=s) for s in range(4)]
        dt = bench_tpu_batch(vols, cfg)
    else:
        dt, _ = bench_tpu(vol, cfg)
    tpu_rate = vol.size / dt / 1e6

    if baseline_z > 0 and mode == "of":
        cpu_rate = bench_cpu_reference(baseline_z, size, size, sigma, levels, winsize)
    else:
        cpu_rate = None

    result = {
        "metric": f"{'Gaussian' if mode == 'gauss' else 'OF'}"
                  f"{' batch-of-4' if mode == 'batch' else ''} denoise throughput, "
                  f"{size}^3 {'bf16-fast' if precision == 'bfloat16' else 'f32'}"
                  f"{'' if tap_flow == 'solve' else ' ' + tap_flow}, "
                  f"sigma=2 (17 taps/axis), levels={levels}, winsize={winsize}",
        "value": round(tpu_rate, 3),
        "unit": "Mvoxel/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2) if cpu_rate else None,
        "tpu_seconds": round(dt, 3),
        "cpu_reference_Mvoxel_s": round(cpu_rate, 4) if cpu_rate else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
