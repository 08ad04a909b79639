#!/usr/bin/env python
"""A/B harness for the compose_refine trust-region fix (VERDICT r3 weak #3).

Round 3 measured compose_refine BELOW plain compose on most tiers -- a mode
whose purpose is quality re-anchoring should never lose to its own seed.
Hypothesis: the unclipped full-res re-solve swaps a chain-smoothed flow for
a noisy single-level estimate.  This script measures PSNR/SSIM vs clean for
compose, round-3 refine (clip=0), and clipped refine variants, on the
blobs and membranes tiers.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
sys.path.insert(0, "scripts")

from flowdenoising_tpu.config import Boundary, FilterConfig, FlowConfig
from flowdenoising_tpu.utils.metrics import psnr, ssim


def main():
    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from quality_eval import PATTERNS
    from flowdenoising_tpu.core.pipeline import denoise

    sig = (2.0,) * 3
    L, W = 3, 5

    def run(noisy, tap_mode, clip, iters):
        cfg = FilterConfig(sigma=sig, boundary=Boundary.WRAP,
                           flow=FlowConfig(levels=L, winsize=W,
                                           tap_mode=tap_mode,
                                           refine_clip=clip,
                                           refine_iters=iters))
        out = jax.jit(lambda x: denoise(x, cfg))(jnp.asarray(noisy))
        return np.asarray(out)

    variants = [
        ("compose", ("compose", 0, 1)),
        ("refine r3 (clip=0)", ("compose_refine", 0, 1)),
        ("refine clip=0.5", ("compose_refine", 0.5, 1)),
        ("refine clip=0.75", ("compose_refine", 0.75, 1)),
        ("refine clip=1.5", ("compose_refine", 1.5, 1)),
        ("refine clip=0.75 iters=2", ("compose_refine", 0.75, 2)),
    ]
    for pattern in ("blobs", "membranes"):
        clean = PATTERNS[pattern](32, 128, 128, seed=0)
        for noise in (15.0, 30.0, 60.0):
            rng = np.random.default_rng(1234 + int(noise))
            noisy = clean + rng.normal(scale=noise,
                                       size=clean.shape).astype(np.float32)
            print(f"\n== {pattern} n={noise}", flush=True)
            for name, (tm, clip, iters) in variants:
                t0 = time.perf_counter()
                out = run(noisy, tm, clip, iters)
                print(f"  {name:<26} PSNR {psnr(clean, out):.2f} dB  "
                      f"SSIM {ssim(clean, out):.4f}  ({time.perf_counter()-t0:.1f}s)",
                      flush=True)


if __name__ == "__main__":
    main()
