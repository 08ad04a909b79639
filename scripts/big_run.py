#!/usr/bin/env python
"""Timed full-volume denoise at arbitrary shape/mode on the real device.

The BASELINE.json config-4 harness: runs the CLI's per-pass execution path
(pipeline.denoise, donated pass buffers, auto slab) at HBM-limit sizes.

Env: BIG_SHAPE="512,1024,1024" (Z,Y,X), BIG_TAP=solve|compose,
BIG_PREC=float32|bfloat16, BIG_SYM=1, BIG_SLAB=<int> (override auto slab),
BIG_REPS (default 1 timed rep after warmup... warmup IS the timed rep for
one-shot sizes: set BIG_REPS=2 for a steady-state number).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_volume(shape, seed=0):
    """Drifting smooth structure + noise, built slab-wise to bound host RAM."""
    rng = np.random.default_rng(seed)
    n, h, w = shape
    pad = 16
    yy, xx = np.mgrid[0:h + 2 * pad, 0:w + 2 * pad].astype(np.float32)
    base = np.zeros((h + 2 * pad, w + 2 * pad), np.float32)
    for _ in range(40):
        cy = rng.uniform(pad, h + pad)
        cx = rng.uniform(pad, w + pad)
        rad = rng.uniform(6, 40)
        amp = rng.uniform(50, 200)
        base += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * rad * rad))
    vol = np.empty(shape, np.float32)
    oy = ox = float(pad)
    for z in range(n):
        iy, ix = int(round(oy)), int(round(ox))
        vol[z] = base[iy:iy + h, ix:ix + w]
        vol[z] += rng.normal(scale=8.0, size=(h, w)).astype(np.float32)
        oy = min(max(oy + rng.uniform(-0.7, 0.7), 0), 2 * pad - 1)
        ox = min(max(ox + rng.uniform(-0.7, 0.7), 0), 2 * pad - 1)
    return vol


def main():
    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.config import Boundary, FilterConfig, FlowConfig
    from flowdenoising_tpu.core.pipeline import denoise

    shape = tuple(int(s) for s in os.environ.get("BIG_SHAPE", "512,1024,1024").split(","))
    tap = os.environ.get("BIG_TAP", "solve")
    prec = os.environ.get("BIG_PREC", "float32")
    sym = os.environ.get("BIG_SYM", "0") == "1"
    slab = os.environ.get("BIG_SLAB")
    presmooth = float(os.environ.get("BIG_PRESMOOTH", "0"))
    reps = int(os.environ.get("BIG_REPS", "1"))
    cfg = FilterConfig(
        sigma=(2.0,) * 3, boundary=Boundary.WRAP, use_flow=True,
        flow=FlowConfig(levels=3, winsize=5, use_initial_flow=True,
                        precision=prec, tap_mode=tap, symmetric_adjacent=sym,
                        presmooth=presmooth),
        slab_size=int(slab) if slab else None)

    print(f"shape={shape} tap={tap} prec={prec} sym={sym} slab={slab} "
          f"presmooth={presmooth}", flush=True)

    if os.environ.get("BIG_DEVGEN", "0") == "1":
        # Compute-only profile: generate the volume ON-device (bench.py's
        # generator) and hand it to denoise as owned (donated, no defensive
        # copy) -- same residency as the host-input path after its one H2D.
        # The tunnel's bulk H2D degrades to ~100 KB/s under load (2 GiB
        # would take hours), which poisons host-input absolutes; production
        # TPU hosts move 2 GiB over PCIe in <1 s, so compute-only IS the
        # representative per-chip figure there.  Regenerated per rep
        # (generation is milliseconds) because each rep donates it.
        from bench import device_volume
        voxels = shape[0] * shape[1] * shape[2]
        marks = []
        on_pass = None
        if os.environ.get("BIG_PASS_TIMES", "0") == "1":
            def on_pass(i, out):
                # scalar fetch: block_until_ready is a no-op on this
                # tunneled PJRT transport
                float(out.reshape(-1)[0])
                marks.append((i, time.perf_counter()))
        for rep in range(max(1, reps)):
            v = device_volume(*shape, seed=0)
            marks.clear()
            t0 = time.perf_counter()
            out = denoise(v, cfg, owned=True, on_pass=on_pass)
            s = float(out.reshape(-1)[0])
            dt = time.perf_counter() - t0
            prev = t0
            for i, tm in marks:
                print(f"  pass {i}: {tm - prev:.1f}s", flush=True)
                prev = tm
            print(f"rep {rep}: {dt:.1f}s = {voxels / dt / 1e6:.2f} Mvoxel/s "
                  f"(device-resident input; probe {s:.3f})", flush=True)
        print("OK", flush=True)
        return

    t0 = time.perf_counter()
    # Volume generation takes minutes on a 1-core host; cache it on tmpfs
    # so repeated timing attempts (e.g. riding the XLA compile cache
    # through a bounded wall-clock window) skip the rebuild.
    cache = f"/dev/shm/bigvol_{shape[0]}x{shape[1]}x{shape[2]}.npy"
    if os.path.exists(cache):
        vol = np.load(cache)
        print(f"volume loaded from {cache} in {time.perf_counter()-t0:.1f}s",
              flush=True)
    else:
        vol = make_volume(shape)
        np.save(cache, vol)
        print(f"volume built in {time.perf_counter()-t0:.1f}s "
              f"({vol.nbytes/2**30:.2f} GiB)", flush=True)

    v = vol
    if reps > 1 and os.environ.get("BIG_STAGE", "0") == "1":
        # Optional: pre-stage the volume on device.  NOT the default -- the
        # staged copy stays resident across the run and at HBM-limit sizes
        # (solve mode, 1024x1024x512) that extra 2 GiB OOMs the pass; the
        # CLI's real profile is host input -> per-pass H2D, which is what
        # the unstaged rep measures.
        t0 = time.perf_counter()
        v = jax.device_put(jnp.asarray(vol))
        float(v.reshape(-1)[0])
        print(f"H2D in {time.perf_counter()-t0:.1f}s", flush=True)

    on_pass = None
    if os.environ.get("BIG_PASS_TIMES", "0") == "1":
        marks = []

        def on_pass(i, out):
            out.block_until_ready()
            marks.append((i, time.perf_counter()))

    for rep in range(max(1, reps)):
        if on_pass is not None:
            marks.clear()
        t0 = time.perf_counter()
        out = denoise(v, cfg, on_pass=on_pass)
        s = float(out.reshape(-1)[0])
        dt = time.perf_counter() - t0
        rate = vol.size / dt / 1e6
        if on_pass is not None:
            prev = t0
            for i, tm in marks:
                print(f"  pass {i}: {tm - prev:.1f}s", flush=True)
                prev = tm
        print(f"rep {rep}: {dt:.1f}s = {rate:.2f} Mvoxel/s  (probe {s:.3f})",
              flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
