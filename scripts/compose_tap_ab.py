#!/usr/bin/env python
"""A/B the fused compose tap kernel's sampling forms ON HARDWARE.

Times one fused tap step (link warp + flow update + neighbor warp + fma)
for the base two-window form, the eo deinterleaved form, and (optionally)
the bf16 packed form, on realistic flow statistics.

  python scripts/compose_tap_ab.py [--n 128] [--hw 256] [--d 8] [--noise 1.4]
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
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--drift", type=float, default=2.0)
    ap.add_argument("--noise", type=float, default=1.4,
                    help="per-pixel flow noise std (px); 1.4 matches the "
                         "noisy bench volume's measured statistics")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.ops.pallas.compose import compose_tap_pallas

    n, hw, d = args.n, args.hw, args.d
    rng = np.random.default_rng(0)
    link = jnp.asarray(
        rng.normal(0, 0.3, (n, hw, hw, 2)).astype(np.float32))
    flow = jnp.asarray(
        (rng.normal(0, args.noise, (n, hw, hw, 2))
         + rng.uniform(-args.drift, args.drift, (n, 1, 1, 2)))
        .astype(np.float32))
    neighbor = jnp.asarray(rng.normal(0, 1, (n, hw, hw)).astype(np.float32))
    acc = neighbor * 0.1

    def sync(x):
        # an actual D2H scalar fetch: block_until_ready is unreliable on
        # the remote-PJRT transport (see PROGRESS.md microbench notes)
        float(x[(0,) * x.ndim])

    def timed(fn, reps=args.reps, outer=3):
        @jax.jit
        def many(a, lk, fl, nb):
            def body(c, _):
                f2, a2 = fn(lk, fl, nb, c)
                return a2 + f2[..., 0] * 0, None
            out, _ = jax.lax.scan(body, a, None, length=reps)
            return out
        out = many(acc, link, flow, neighbor)
        sync(out)
        best = float("inf")
        for _ in range(outer):
            t0 = time.perf_counter()
            out = many(acc, link, flow, neighbor)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best / reps

    def run(label, **kw):
        t = timed(lambda lk, fl, nb, a: compose_tap_pallas(
            lk, fl, nb, a, 0.05, d, **kw))
        print(f"{label:24s} {t * 1e3:8.3f} ms/tap "
              f"({n * hw * hw / t / 1e9:6.2f} Gvox/s)", flush=True)
        return t

    print(f"fused compose tap: n={n} plane={hw}x{hw} d={d} "
          f"drift±{args.drift} noise={args.noise}", flush=True)
    tb = run("base (two-window)", eo=False)
    te = run("eo (deinterleaved)", eo=True)
    run("packed bf16", packed=True, eo=False)
    print(f"eo vs base: {te / tb:.3f}x", flush=True)


if __name__ == "__main__":
    main()
