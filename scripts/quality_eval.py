#!/usr/bin/env python
"""Quality parity evaluation: TPU pipeline vs the cv2 reference algorithm.

Builds a clean drifting-structure volume, adds Gaussian noise, denoises with
(a) the cv2-based reference oracle and (b) this framework under several
configurations, and reports PSNR/SSIM of each result against the clean
volume plus cross-PSNR against the reference output.  Writes QUALITY.md.

Run on the TPU host:  python scripts/quality_eval.py [-n 32] [--hw 128]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from flowdenoising_tpu.config import Boundary, FilterConfig, FlowConfig
from flowdenoising_tpu.kernels import get_gaussian_kernels
from flowdenoising_tpu.utils.metrics import psnr, ssim


def make_clean_noisy(n, h, w, seed=0, noise=30.0):
    import importlib.util
    spec = importlib.util.spec_from_file_location("mtv", "scripts/make_test_volume.py")
    mtv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mtv)
    clean = mtv.make_volume(n, h, w, seed=seed, noise=0.0)
    rng = np.random.default_rng(seed + 1)
    noisy = clean + rng.normal(scale=noise, size=clean.shape).astype(np.float32)
    return clean, noisy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-n", type=int, default=32)
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--sigma", type=float, default=2.0)
    p.add_argument("--noise", type=float, default=30.0)
    p.add_argument("--skip-reference", action="store_true")
    args = p.parse_args()

    clean, noisy = make_clean_noisy(args.n, args.hw, args.hw, noise=args.noise)
    sig = (args.sigma,) * 3
    kernels = get_gaussian_kernels(sig)
    L, W = 3, 5

    rows = []

    ref_out = None
    if not args.skip_reference:
        import ref_pipeline as R
        t0 = time.perf_counter()
        ref_out = R.of_denoise_wrap(noisy, kernels, L, W, seeded=True)
        t_ref = time.perf_counter() - t0
        rows.append(("cv2 reference (1-core)", t_ref, ref_out))

    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.core.pipeline import denoise

    configs = [
        ("tpu f32 D=8 (default)", dict()),
        ("tpu f32 D=4", dict(max_displacement=4)),
        ("tpu f32 exact-gather", dict(max_displacement=None)),
        ("tpu f32 recompute_flow", dict(use_initial_flow=False)),
        ("tpu bf16 D=8", dict(dtype="bfloat16", precision="bfloat16")),
        ("tpu f32 compose", dict(tap_mode="compose")),
        ("tpu f32 compose_refine", dict(tap_mode="compose_refine")),
        ("tpu bf16 compose (fastest)", dict(tap_mode="compose",
                                            precision="bfloat16")),
        ("tpu f32 compose symmetric", dict(tap_mode="compose",
                                           symmetric_adjacent=True)),
    ]
    v = jax.device_put(jnp.asarray(noisy))
    for name, over in configs:
        cfg = FilterConfig(sigma=sig, boundary=Boundary.WRAP,
                           flow=FlowConfig(levels=L, winsize=W, **over))
        jfn = jax.jit(lambda x, c=cfg: denoise(x, c))
        out = jfn(v)
        _ = float(out[0, 0, 0])
        t0 = time.perf_counter()
        out = jfn(v)
        _ = float(out[0, 0, 0])
        dt = time.perf_counter() - t0
        rows.append((name, dt, np.asarray(out)))

    lines = [
        "# Quality parity (synthetic drifting-blob volume + Gaussian noise)",
        "",
        f"Volume {args.n}x{args.hw}x{args.hw}, noise sigma={args.noise}, filter sigma={args.sigma}, levels={L}, "
        f"winsize={W}, wrap boundary, seeded flow chaining.",
        "",
        f"Noisy input: PSNR {psnr(clean, noisy):.2f} dB, SSIM {ssim(clean, noisy):.4f} vs clean.",
        "",
        "| Pipeline | time (s) | PSNR vs clean | SSIM vs clean | PSNR vs cv2 ref |",
        "|---|---|---|---|---|",
    ]
    for name, dt, out in rows:
        cross = psnr(ref_out, out) if ref_out is not None and out is not ref_out else float("inf")
        lines.append(f"| {name} | {dt:.2f} | {psnr(clean, out):.2f} dB | "
                     f"{ssim(clean, out):.4f} | "
                     f"{'--' if out is ref_out else f'{cross:.2f} dB'} |")
    text = "\n".join(lines) + "\n"
    with open("QUALITY.md", "w") as f:
        f.write(text)
    print(text)


if __name__ == "__main__":
    main()
