#!/usr/bin/env python
"""ON-HARDWARE parity + timing of the prepped compose pass vs the per-tap
fused scan (FDTPU_COMPOSE_PREPPED=1 vs 0).  Both paths must be bitwise
identical; the prepped one should be faster (zero per-tap operand prep).

  python scripts/prepped_compose_check.py [--n 128] [--hw 256] [--bf16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FDTPU_CACHE_DIR", "/tmp/fdtpu_probe_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--sigma", type=float, default=2.0)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.config import FlowConfig
    from flowdenoising_tpu.core.axis_filter import (
        of_pass_padded, pad_stack, Boundary)
    from flowdenoising_tpu.kernels import get_gaussian_kernels

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)

    n, hw = args.n, args.hw
    taps = get_gaussian_kernels((args.sigma,) * 3)[0]
    ks2 = len(taps) // 2
    precision = "bfloat16" if args.bf16 else "float32"
    cfg = FlowConfig(levels=3, winsize=5, use_initial_flow=True,
                     precision=precision, tap_mode="compose",
                     symmetric_adjacent=True)
    dtype = jnp.dtype(cfg.dtype)
    vol = jnp.asarray(benchmod.make_volume(n, hw, hw, seed=0))
    padded = pad_stack(vol.astype(dtype), ks2, Boundary.WRAP)

    def run(prepped: bool):
        os.environ["FDTPU_COMPOSE_PREPPED"] = "1" if prepped else "0"

        @jax.jit
        def passes(p):
            # two chained reps inside one program: device-resident timing
            a = of_pass_padded(p, taps, cfg)
            b = of_pass_padded(pad_stack(a.astype(dtype), ks2,
                                         Boundary.WRAP), taps, cfg)
            return a, b

        out, _ = passes(padded)
        out = np.asarray(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            a, b = passes(padded)
            float(b[0, 0, 0])  # fetch-sync (remote PJRT)
            best = min(best, time.perf_counter() - t0)
        return out, best / 2

    print(f"compose pass parity: n={n} plane={hw}x{hw} "
          f"precision={precision}", flush=True)
    ref, t0 = run(False)
    print(f"per-tap fused scan:  {t0:7.3f} s", flush=True)
    out, t1 = run(True)
    print(f"prepped tap scan:    {t1:7.3f} s ({t1 / t0:.3f}x)", flush=True)
    if np.array_equal(out, ref):
        print("BITWISE EQUAL", flush=True)
    else:
        diff = np.abs(out - ref)
        print(f"MISMATCH: max abs diff {diff.max():.3e} at "
              f"{np.unravel_index(diff.argmax(), diff.shape)} "
              f"({(diff > 0).mean() * 100:.2f}% voxels differ)", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
