#!/usr/bin/env python
"""Generate synthetic FIB-SEM-like test volumes (drifting blob fields +
noise) as MRC files.  Zero-egress substitute for the reference harnesses'
downloads (test_me.sh: small_vol.mrc; stress_me.sh: big_vol.mrc)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from flowdenoising_tpu.io.mrc import write_mrc


def make_volume(n, h, w, seed=0, noise=8.0, drift=0.7, blobs=30):
    rng = np.random.default_rng(seed)
    pad = 16
    yy, xx = np.mgrid[0:h + 2 * pad, 0:w + 2 * pad]
    base = np.zeros((h + 2 * pad, w + 2 * pad), np.float32)
    for _ in range(blobs):
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
        oy = min(max(oy + rng.uniform(-drift, drift), 0), 2 * pad - 1)
        ox = min(max(ox + rng.uniform(-drift, drift), 0), 2 * pad - 1)
    vol += rng.normal(scale=noise, size=vol.shape).astype(np.float32)
    return vol


def make_tomogram(n, h, w, seed=0, noise=8.0):
    """Tomogram-like phantom: textured membranes/filaments (the structures
    the EMPIAR-10988 TS_026.rec tier exercises in the reference's
    pamper_me.sh, /root/reference/src/pamper_me.sh:1-5) + noise."""
    from quality_eval import make_membranes
    rng = np.random.default_rng(seed)
    vol = make_membranes(n, h, w, seed=seed)
    vol += rng.normal(scale=noise, size=vol.shape).astype(np.float32)
    return vol


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--output", default="/tmp/small_vol.mrc")
    p.add_argument("-z", type=int, default=64)
    p.add_argument("-y", type=int, default=128)
    p.add_argument("-x", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--noise", type=float, default=8.0)
    p.add_argument("--pattern", choices=["blobs", "membranes"], default="blobs",
                   help="blobs: smooth drifting blob field; membranes: "
                        "textured FIB-SEM-like sheets+filaments")
    p.add_argument("--dtype", choices=["float32", "int16"], default="float32",
                   help="int16 mimics .rec tomograms (MRC mode 1) and "
                        "exercises the fused i16->f32 native decode path")
    a = p.parse_args()
    if a.pattern == "membranes":
        vol = make_tomogram(a.z, a.y, a.x, a.seed, a.noise)
    else:
        vol = make_volume(a.z, a.y, a.x, a.seed, a.noise)
    if a.dtype == "int16":
        vol = np.clip(np.round(vol), -32768, 32767).astype(np.int16)
    write_mrc(a.output, vol)
    print(f"wrote {a.output} ({a.z}x{a.y}x{a.x} {a.dtype})")
