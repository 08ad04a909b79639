#!/usr/bin/env python
"""Benchmark: TPU OF-compensated denoise throughput vs the CPU reference path.

Prints one or more JSON lines, EACH a complete, valid bench record whose
headline `value`/`vs_baseline` is the REFERENCE-PARITY mode (per-tap
Farneback solves, float32 -- the exact semantics of
/root/reference/src/flowdenoising.py:285-290).  The record is re-emitted
(flushed) as each optional section completes, so a timeout at ANY point
leaves the most recent complete record on stdout:

  {"metric": ..., "value": <solve Mvox/s>, "unit": "Mvoxel/s",
   "vs_baseline": <solve / measured cv2 single-core>,
   "presmooth": {...}, "fast": {...}, "roofline": {...},
   "sections_done": [...], "sections_skipped": [...]}

Loss-proofing (round-3 bench record was lost to a driver timeout):
- the headline line is printed+flushed the moment the FIRST timed solve rep
  finishes; later reps/sections only enrich it,
- a wall-clock deadline (env BENCH_DEADLINE_S, default 900 s from process
  start) gates STARTING each optional section; skipped sections are listed
  in `sections_skipped`,
- the measured cv2 single-core baseline rate is cached in .bench_cache.json
  (keyed by shape/params) so reruns have `vs_baseline` in their very first
  emitted line without re-paying the cv2 measurement.

Measurement semantics (unchanged from round 3):
- TPU side: jit-compiled full 3-pass OF denoise (sigma=2 -> 17 taps/axis,
  levels=3, winsize=5, wrap boundary -- the reference main CLI defaults) on a
  synthetic drifting-blob volume, timed after warmup; best-of-N reps.
- Baseline side: the reference algorithm (cv2.calcOpticalFlowFarneback +
  cv2.remap, identical tap/chaining semantics) timed on a few slices of the
  same plane size and converted to Mvoxel/s.  The reference repo publishes no
  numbers (BASELINE.md) and this host exposes ONE CPU core, so the multicore
  comparison in BASELINE.md maps through an assumed linear thread scale-up --
  flagged in `cpu_baseline_note`.
- Roofline: an analytic HBM-traffic model of the 3-pass program (channel
  counts per stage x voxels) against the v5e HBM peak, plus the calibrated
  sampling-issue floor, so the headroom the kernels still have is visible in
  every bench record.

Env knobs: BENCH_SIZE (default 256), BENCH_BASELINE_Z (default 4; 0 skips
the cv2 measurement, leaving vs_baseline null), BENCH_MODE (of|gauss|batch),
BENCH_SKIP_FAST=1 to bench only parity mode, BENCH_REPS (default 3 timed
reps after warmup; best-of is reported), BENCH_DEADLINE_S (default 900),
BENCH_NO_CACHE=1 to ignore/skip the cv2 baseline cache file.
"""

import functools
import json
import os
import sys
import time

import numpy as np

_T0 = time.perf_counter()

V5E_HBM_GBPS = 819.0  # v5e peak HBM bandwidth

_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_cache.json")


def _deadline_s() -> float:
    return float(os.environ.get("BENCH_DEADLINE_S", "900"))


def _remaining() -> float:
    return _deadline_s() - (time.perf_counter() - _T0)


def emit(record: dict) -> None:
    """Print one complete bench record and flush immediately.

    Every call prints a full, valid record; a consumer taking the LAST
    parseable stdout line gets the richest one, a consumer killed between
    emits still has the previous complete record."""
    print(json.dumps(record), flush=True)


def _cache_load() -> dict:
    if os.environ.get("BENCH_NO_CACHE") == "1":
        return {}
    try:
        with open(_CACHE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _cache_store(key: str, value: dict) -> None:
    if os.environ.get("BENCH_NO_CACHE") == "1":
        return
    cache = _cache_load()
    cache[key] = value
    try:
        with open(_CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
            f.write("\n")
    except Exception:
        pass


def _blob_params(n, h, w, seed=0):
    """Host-side scalar parameters of the drifting-blob volume: blob
    centers/radii/amplitudes and the per-slice integer drift path.  Tiny
    (KBs), so both the host and the device generator share them."""
    rng = np.random.default_rng(seed)
    pad = 16
    blobs = [(rng.uniform(pad, h + pad), rng.uniform(pad, w + pad),
              rng.uniform(4, 18), rng.uniform(50, 200)) for _ in range(30)]
    iys, ixs = np.zeros(n, np.int32), np.zeros(n, np.int32)
    oy = ox = float(pad)
    for z in range(n):
        iys[z], ixs[z] = int(round(oy)), int(round(ox))
        oy = min(max(oy + rng.uniform(-0.7, 0.7), 0), 2 * pad - 1)
        ox = min(max(ox + rng.uniform(-0.7, 0.7), 0), 2 * pad - 1)
    return pad, blobs, iys, ixs


def make_volume(n, h, w, seed=0):
    pad, blobs, iys, ixs = _blob_params(n, h, w, seed)
    yy, xx = np.mgrid[0:h + 2 * pad, 0:w + 2 * pad]
    base = np.zeros((h + 2 * pad, w + 2 * pad), np.float32)
    for cy, cx, rad, amp in blobs:
        base += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * rad * rad))
    vol = np.zeros((n, h, w), np.float32)
    for z in range(n):
        vol[z] = base[iys[z]:iys[z] + h, ixs[z]:ixs[z] + w]
    # float32 noise stream: ~4x faster than normal()+astype on this host
    # (vol gen was 147s of a 512^3 bench run with the float64 stream)
    rng = np.random.default_rng(seed + 1000)
    vol += 8.0 * rng.standard_normal(size=vol.shape, dtype=np.float32)
    return vol


@functools.lru_cache(maxsize=8)
def _device_volume_gen(n, h, w, seed):
    """Jitted on-device generator, cached per (shape, seed) so repeated
    calls (e.g. big_run's per-rep regeneration after donation) don't
    re-trace the 30-blob unrolled program each time."""
    import jax
    import jax.numpy as jnp

    pad, blobs, iys, ixs = _blob_params(n, h, w, seed)

    @jax.jit
    def gen(iys, ixs):
        yy = jnp.arange(h + 2 * pad, dtype=jnp.float32)[:, None]
        xx = jnp.arange(w + 2 * pad, dtype=jnp.float32)[None, :]
        base = jnp.zeros((h + 2 * pad, w + 2 * pad), jnp.float32)
        for cy, cx, rad, amp in blobs:
            base = base + amp * jnp.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * rad * rad))
        vol = jax.vmap(lambda oy, ox: jax.lax.dynamic_slice(
            base, (oy, ox), (h, w)))(iys, ixs)
        noise = jax.random.normal(jax.random.PRNGKey(seed), (n, h, w),
                                  jnp.float32)
        return vol + 8.0 * noise

    return gen, iys, ixs


def device_volume(n, h, w, seed=0):
    """Generate the bench volume ON the device: same blob field and drift
    path as :func:`make_volume` (scalar params from the host RNG), noise
    from the device PRNG.

    The bulk H2D transfer this replaces is the bench's single biggest
    loss risk: the tunneled TPU's H2D degrades by orders of magnitude
    under load (measured 16 MiB in 236 s on 2026-08-21 vs ~1 s healthy;
    round 3's official bench died to exactly this).  Only O(KB) of drift
    indices leave the host.
    """
    import jax.numpy as jnp

    gen, iys, ixs = _device_volume_gen(n, h, w, seed)
    out = gen(jnp.asarray(iys), jnp.asarray(ixs))
    out.block_until_ready()
    return out


class TpuBench:
    """Warmup once, then yield one timed rep at a time so the caller can
    emit a record between reps (loss-proofing: a kill mid-rep still leaves
    the previous best on stdout)."""

    def __init__(self, vol, cfg):
        import jax
        import jax.numpy as jnp
        from flowdenoising_tpu.core.pipeline import denoise

        self._jfn = jax.jit(lambda v: denoise(v, cfg))
        self._v = (vol if isinstance(vol, jax.Array)
                   else jax.device_put(jnp.asarray(vol)))
        # warmup + compile; a scalar fetch forces synchronization (more
        # robust than block_until_ready across PJRT transports)
        out = self._jfn(self._v)
        float(out[0, 0, 0])
        self.best = float("inf")

    def rep(self) -> float:
        t0 = time.perf_counter()
        out = self._jfn(self._v)
        float(out[0, 0, 0])
        self.best = min(self.best, time.perf_counter() - t0)
        return self.best


def bench_tpu(vol, cfg, reps=None):
    b = TpuBench(vol, cfg)
    for _ in range(reps or int(os.environ.get("BENCH_REPS", "3"))):
        b.rep()
    return b.best


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
    import jax.numpy as jnp
    from flowdenoising_tpu.core.pipeline import denoise, denoise_many

    out = denoise(jnp.asarray(vols[0]), cfg)   # warmup + compile
    float(out[0, 0, 0])
    del out
    t0 = time.perf_counter()
    outs = denoise_many(list(vols), cfg)
    float(outs[-1][0, 0, 0])
    return (time.perf_counter() - t0) / len(vols)


def _membranes_volume(z, h, w, seed=1):
    """Membranes/filament phantom (second content family for the cv2
    denominator; scripts/quality_eval.py::make_membranes)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    import quality_eval as Q
    vol = Q.make_membranes(z, h, w, seed=seed)
    rng = np.random.default_rng(seed + 500)
    return vol + 30.0 * rng.standard_normal(size=vol.shape,
                                            dtype=np.float32)


def bench_cpu_reference(z, h, w, sigma, levels, winsize, family="blobs"):
    """Measured single-core rate of the reference algorithm (cv2 C++ path,
    identical tap/chaining semantics) on ``z`` slices of one volume family.

    The denominator is deliberately measured over MULTIPLE content
    families (blobs + membranes): cv2 Farneback's cost varies with image
    content, and a one-family denominator understates that spread
    (VERDICT r4 weak #6)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import ref_pipeline as R
    from flowdenoising_tpu.kernels import get_gaussian_kernels
    vol = (make_volume(z, h, w, seed=1) if family == "blobs"
           else _membranes_volume(z, h, w, seed=1))
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


def fast_issue_model_s(voxels, ks2, w_chtrips=None,
                       a_ns=0.150, c_ns=0.01046):
    """CALIBRATED sampling-issue floor of the fast (compose) path's tap
    scan -- the fast-mode twin of :func:`sampling_issue_model_s`
    (VERDICT r4 missing #2).

    The fused compose tap kernel executes, per (row-tile x 128-lane)
    block, only the y-shifts its flow range activates (static @pl.when
    predication; phase A samples the 2-channel link field at the carried
    flow F, phase B the 1-channel neighbor at F').  Round-5 hardware
    calibration (scripts/compose_floor.py, 2026-08-21, 256^3):

    - REAL composed flows SATURATE the shift window: the chain accumulates
      per-pixel flow noise each step, so taps 1..3 ramp (1, 12, 16 trips)
      and every later tap runs all 2d+2 = 18 shifts (17.0 measured).
      Total channel-trips per voxel per pass at sigma=2 (16 taps):
      W = 715.4 raw operands, 459 with presmoothed estimation
      (--flow_presmooth 1.5 collapses the flow noise; the lever).
    - (a, c) fitted IN-PASS from two real 16-tap prepped scans (raw vs
      presmoothed links): a = 0.150 ns/vox/tap fixed issue cost,
      c = 0.01046 ns/vox/channel-trip.  (Isolated single-tap timing runs
      ~50% hotter -- cross-step DMA/compute overlap only exists in the
      real scan -- which is why the fit must be in-pass.)
    - The measured full fast pass (194.7 ms/pass at 256^3) sits ~17%
      above this taps-only floor; the adjacent solve + polyexp + operand
      prep largely hide behind the tap scan (stage sum 239 ms standalone
      vs 194.7 ms in-program).  The fast path is ISSUE-bound, not
      HBM-bound -- its 8.9%-of-HBM-roofline figure (r4) was measuring a
      non-binding resource.
    """
    taps = 2 * ks2
    w = w_chtrips if w_chtrips is not None else (715.4 / 16.0) * taps
    return voxels * 3 * (a_ns * taps + c_ns * w) * 1e-9


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
    reps = int(os.environ.get("BENCH_REPS", "3"))
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

    voxels = size ** 3

    if mode in ("of", "gauss"):
        # Generated on-device: the tunneled TPU's bulk H2D can degrade to
        # ~KB/s under load (round 3's bench record died to it); only KBs of
        # drift indices are transferred.
        vol = device_volume(size, size, size, seed=0)
    else:
        vol = make_volume(size, size, size, seed=0)

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
        emit({
            "metric": f"OF denoise batch-of-4 throughput, {size}^3 "
                      f"compose bf16 sym, sigma=2, levels=3, winsize=5",
            "value": round(voxels / dt / 1e6, 3), "unit": "Mvoxel/s",
            "vs_baseline": None, "tpu_seconds_per_volume": round(dt, 3)})
        return
    if mode == "gauss":
        cfg = make_cfg("solve", "float32")
        dt = bench_tpu(vol, cfg)
        emit({
            "metric": f"Gaussian denoise throughput, {size}^3 f32",
            "value": round(voxels / dt / 1e6, 3), "unit": "Mvoxel/s",
            "vs_baseline": None, "tpu_seconds": round(dt, 3)})
        return

    # --- cv2 single-core baseline: cache hit means vs_baseline is present
    # in the very first emitted line.  Keyed by host too: the rate is a
    # property of THIS machine's core, and a rerun elsewhere must
    # re-measure instead of reporting a foreign rate as locally measured.
    # TWO content families x baseline_z slices each (cv2 Farneback cost is
    # content-dependent; the spread is part of the denominator's honesty) ---
    import platform
    _FAMILIES = ("blobs", "membranes")

    def _fam_key(fam):
        return (f"cv2_{fam}_{size}x{size}_z{baseline_z}_s{sigma}_l{levels}"
                f"_w{winsize}@{platform.node()}")

    fam_rates = {}
    for _fam in _FAMILIES:
        _c = _cache_load().get(_fam_key(_fam))
        if _c:
            fam_rates[_fam] = _c["rate_Mvoxel_s"]

    def _cpu_note():
        meas = {f: round(r, 4) for f, r in fam_rates.items()}
        return ("cv2 reference measured on 1 core of this host, "
                f"{baseline_z} slices per content family: {meas} Mvox/s "
                "(vs_baseline divides by the family mean); multicore "
                "figures in BASELINE.md assume linear thread scaling "
                "(host has a single core)")

    cpu_rate = (sum(fam_rates.values()) / len(fam_rates) if fam_rates
                else None)
    cpu_note = _cpu_note()

    done, skipped = [], []
    result = {
        "metric": f"OF denoise throughput, {size}^3, REFERENCE-PARITY mode "
                  f"(per-tap solve, f32), sigma=2 (17 taps/axis), "
                  f"levels={levels}, winsize={winsize}",
        "value": None,
        "unit": "Mvoxel/s",
        "vs_baseline": None,
        "tpu_seconds": None,
        "cpu_reference_Mvoxel_s": round(cpu_rate, 4) if cpu_rate else None,
        "cpu_baseline_note": cpu_note,
        "presmooth": None,
        "fast": None,
        "roofline": None,
        "sections_done": done,
        "sections_skipped": skipped,
    }

    def set_solve(dt_solve):
        rate = voxels / dt_solve / 1e6
        result["value"] = round(rate, 3)
        result["tpu_seconds"] = round(dt_solve, 3)
        if cpu_rate:
            result["vs_baseline"] = round(rate / cpu_rate, 2)
        bpv = hbm_model_bytes_per_voxel(ks2, 3, "solve", "float32")
        achieved = voxels * bpv / dt_solve / 1e9
        floor = sampling_issue_model_s(voxels, ks2, 3)
        result["roofline"] = {
            "hbm_model_bytes_per_voxel_solve": round(bpv, 1),
            "achieved_GBps_solve": round(achieved, 1),
            "hbm_roofline_pct_solve": round(100.0 * achieved / V5E_HBM_GBPS, 1),
            # the binding resource: the sampling trip loop's measured issue
            # cost at measured real-flow trip counts (sampling_issue_model_s)
            "sampling_issue_floor_s_solve": round(floor, 2),
            "sampling_issue_floor_pct_solve": round(100.0 * floor / dt_solve, 1),
        }

    # --- reference-parity mode (headline): emit after the FIRST timed rep,
    # enrich with the remaining reps ---
    b = TpuBench(vol, make_cfg("solve", "float32"))
    set_solve(b.rep())
    done.append("solve_rep1")
    emit(result)
    for _ in range(reps - 1):
        if _remaining() < 4 * b.best:
            skipped.append("solve_reps")
            break
        set_solve(b.rep())
    else:
        done.append("solve_reps")
    dt_solve = b.best
    del b
    emit(result)

    def refresh_vs_baseline():
        # runs before the presmooth/fast sections, which compute their own
        # vs_baseline inline from the by-then-measured cpu_rate
        result["cpu_reference_Mvoxel_s"] = round(cpu_rate, 4)
        result["vs_baseline"] = round(result["value"] / cpu_rate, 2)

    # --- cv2 baseline, if not cached (measure it EARLY: it is the headline's
    # denominator, and at ~20-60 s per family it is cheaper than the TPU
    # sections).  Families are measured/flushed one at a time ---
    if cpu_rate is None and baseline_z > 0:
        for _fam in _FAMILIES:
            if _fam in fam_rates:
                continue
            if _remaining() <= 120:
                skipped.append(f"cv2_baseline_{_fam}")
                continue
            fam_rates[_fam] = bench_cpu_reference(
                baseline_z, size, size, sigma, levels, winsize, family=_fam)
            _cache_store(_fam_key(_fam), {
                "rate_Mvoxel_s": fam_rates[_fam],
                "measured_at": time.strftime("%Y-%m-%d"),
            })
            done.append(f"cv2_baseline_{_fam}")
        if fam_rates:
            cpu_rate = sum(fam_rates.values()) / len(fam_rates)
            result["cpu_baseline_note"] = _cpu_note()
            refresh_vs_baseline()
            emit(result)

    # --- presmoothed solve: same per-tap solve semantics, flows estimated
    # from a lightly blurred operand copy (quality >= parity on the noisy
    # tiers, QUALITY.md); suppressing flow noise cuts the sampling kernels'
    # data-bound trip counts on the noisy first pass ---
    if not skip_fast and _remaining() > (reps + 2) * dt_solve + 60:
        import dataclasses
        cfg_ps = make_cfg("solve", "float32")
        cfg_ps = dataclasses.replace(
            cfg_ps, flow=dataclasses.replace(cfg_ps.flow, presmooth=1.5))
        dt_ps = bench_tpu(vol, cfg_ps, reps)
        result["presmooth"] = {
            "flow_presmooth": 1.5,
            "value": round(voxels / dt_ps / 1e6, 3),
            "tpu_seconds": round(dt_ps, 3),
            "vs_baseline": round(voxels / dt_ps / 1e6 / cpu_rate, 2)
                           if cpu_rate else None,
        }
        done.append("presmooth")
        emit(result)
    elif not skip_fast:
        skipped.append("presmooth")

    # --- documented fast mode ---
    if not skip_fast and _remaining() > reps * dt_solve / 2 + 60:
        dt_fast = bench_tpu(vol, make_cfg("compose", "bfloat16", True), reps)
        rate_f = voxels / dt_fast / 1e6
        result["fast"] = {
            "tap_flow": "compose", "precision": "bfloat16",
            "symmetric_adjacent": True,
            "value": round(rate_f, 3),
            "tpu_seconds": round(dt_fast, 3),
            "vs_baseline": round(rate_f / cpu_rate, 2) if cpu_rate else None,
        }
        bpv_fast = hbm_model_bytes_per_voxel(ks2, 3, "compose", "bfloat16")
        ach_f = voxels * bpv_fast / dt_fast / 1e9
        floor_f = fast_issue_model_s(voxels, ks2)
        result["roofline"].update({
            "hbm_model_bytes_per_voxel_fast": round(bpv_fast, 1),
            "achieved_GBps_fast": round(ach_f, 1),
            "hbm_roofline_pct_fast": round(100.0 * ach_f / V5E_HBM_GBPS, 1),
            # the binding resource (fast mode is issue-bound, not HBM-
            # bound): the tap scan's calibrated sampling-issue floor at
            # the measured real-chain trip counts (fast_issue_model_s)
            "issue_floor_fast_s": round(floor_f, 3),
            "issue_floor_fast_pct": round(100.0 * floor_f / dt_fast, 1),
        })
        done.append("fast")
    elif not skip_fast:
        skipped.append("fast")
    emit(result)

    # --- 512^3 ladder (BASELINE.json config 2 scale-up), captured in the
    # driver's own run (VERDICT r4 missing #1).  Deadline-gated and flushed
    # per section like everything above ---
    skip_512 = os.environ.get("BENCH_SKIP_512", "0") == "1" or size != 256
    if not skip_512:
        del vol  # free the 256^3 operands before the 512^3 sections
        vox512 = 512 ** 3
        vol512 = None
        if _remaining() > 360:
            vol512 = device_volume(512, 512, 512, seed=0)
            b5 = TpuBench(vol512, make_cfg("solve", "float32"))
            dt5 = b5.rep()
            floor5 = sampling_issue_model_s(vox512, ks2, 3)
            result["solve_512"] = {
                "value": round(vox512 / dt5 / 1e6, 3),
                "tpu_seconds": round(dt5, 3),
                "vs_baseline": round(vox512 / dt5 / 1e6 / cpu_rate, 2)
                               if cpu_rate else None,
                "sampling_issue_floor_s": round(floor5, 2),
                "sampling_issue_floor_pct": round(100.0 * floor5 / dt5, 1),
            }
            done.append("solve_512_rep1")
            emit(result)
            if _remaining() > 2.5 * dt5:
                dt5 = b5.rep()
                result["solve_512"]["value"] = round(vox512 / dt5 / 1e6, 3)
                result["solve_512"]["tpu_seconds"] = round(dt5, 3)
                if cpu_rate:
                    result["solve_512"]["vs_baseline"] = round(
                        vox512 / dt5 / 1e6 / cpu_rate, 2)
                result["solve_512"]["sampling_issue_floor_pct"] = round(
                    100.0 * floor5 / dt5, 1)
                done.append("solve_512_rep2")
            del b5
            emit(result)
        else:
            skipped.append("solve_512")
        if _remaining() > 150:
            if vol512 is None:
                vol512 = device_volume(512, 512, 512, seed=0)
            dt_f5 = bench_tpu(vol512, make_cfg("compose", "bfloat16", True),
                              reps=2)
            result["fast_512"] = {
                "tap_flow": "compose", "precision": "bfloat16",
                "symmetric_adjacent": True,
                "value": round(vox512 / dt_f5 / 1e6, 3),
                "tpu_seconds": round(dt_f5, 3),
                "vs_baseline": round(vox512 / dt_f5 / 1e6 / cpu_rate, 2)
                               if cpu_rate else None,
            }
            done.append("fast_512")
        else:
            skipped.append("fast_512")
        if vol512 is not None:
            del vol512
        emit(result)

    # --- batch streaming steady-state (BASELINE.json config 5): a batch of
    # 256^3 volumes through denoise_many, staged H2D included (the
    # double-buffer window overlaps the next volume's transfer with the
    # current volume's compute) ---
    if os.environ.get("BENCH_SKIP_BATCH", "0") != "1" and _remaining() > 180:
        bn, bs = 3, 256
        vol_np = make_volume(bs, bs, bs, seed=0)
        rng = np.random.default_rng(99)
        noise = rng.standard_normal(size=vol_np.shape, dtype=np.float32) * 4.0
        bvols = [np.roll(vol_np, 5 * s, axis=0)
                 + np.roll(noise, 31 * s, axis=2) for s in range(bn)]
        dt_v = bench_tpu_batch(bvols, make_cfg("compose", "bfloat16", True))
        result["batch"] = {
            "config": f"batch-of-{bn} {bs}^3 compose bf16 sym, "
                      "staged H2D included",
            "seconds_per_volume": round(dt_v, 3),
            "value": round(bs ** 3 / dt_v / 1e6, 3),
            "unit": "Mvoxel/s",
        }
        done.append("batch")
    else:
        skipped.append("batch")

    result["elapsed_s"] = round(time.perf_counter() - _T0, 1)
    emit(result)


if __name__ == "__main__":
    main()
