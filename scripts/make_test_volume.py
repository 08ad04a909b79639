#!/usr/bin/env python
"""Generate synthetic FIB-SEM-like test volumes (drifting blob fields +
noise) as MRC files.  Zero-egress substitute for the reference harnesses'
downloads (test_me.sh: small_vol.mrc; stress_me.sh: big_vol.mrc)."""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
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


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--output", default="/tmp/small_vol.mrc")
    p.add_argument("-z", type=int, default=64)
    p.add_argument("-y", type=int, default=128)
    p.add_argument("-x", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--noise", type=float, default=8.0)
    a = p.parse_args()
    write_mrc(a.output, make_volume(a.z, a.y, a.x, a.seed, a.noise))
    print(f"wrote {a.output} ({a.z}x{a.y}x{a.x})")
