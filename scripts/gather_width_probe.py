#!/usr/bin/env python
"""Probe: Mosaic capabilities needed by the even/odd-deinterleave sampling
scheme: (a) lane gather with output wider than the 128-lane source
(idx (r,256) into src (r,128)); (b) dynamic sublane roll of a 256-wide
array."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FDTPU_CACHE_DIR", "/tmp/fdtpu_probe_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_wide_gather(src_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(
        src_ref[...], idx_ref[...], axis=1, mode="promise_in_bounds")


def k_wide_roll(src_ref, s_ref, out_ref):
    out_ref[...] = pltpu.roll(src_ref[...], s_ref[0], axis=0)


def main():
    rng = np.random.default_rng(0)
    r = 64
    src = jnp.asarray(rng.normal(size=(r, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, size=(r, 256)).astype(np.int32))
    try:
        out = pl.pallas_call(
            k_wide_gather,
            out_shape=jax.ShapeDtypeStruct((r, 256), jnp.float32),
        )(src, idx)
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
        err = float(np.abs(np.asarray(out) - ref).max())
        print(f"wide gather: OK err={err:.2e}", flush=True)
    except Exception as e:
        print(f"wide gather: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # same-shape 256-wide gather, full-width indices
    srcw = jnp.asarray(rng.normal(size=(r, 256)).astype(np.float32))
    idxw = jnp.asarray(rng.integers(0, 256, size=(r, 256)).astype(np.int32))
    try:
        out = pl.pallas_call(
            k_wide_gather,
            out_shape=jax.ShapeDtypeStruct((r, 256), jnp.float32),
        )(srcw, idxw)
        ref = np.take_along_axis(np.asarray(srcw), np.asarray(idxw), axis=1)
        err = float(np.abs(np.asarray(out) - ref).max())
        print(f"256 gather full-idx: OK err={err:.2e}", flush=True)
    except Exception as e:
        print(f"256 gather full-idx: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # same-shape 256-wide gather, vreg-local indices (<128)
    idxl = jnp.asarray(rng.integers(0, 128, size=(r, 256)).astype(np.int32))
    try:
        out = pl.pallas_call(
            k_wide_gather,
            out_shape=jax.ShapeDtypeStruct((r, 256), jnp.float32),
        )(srcw, idxl)
        ref = np.take_along_axis(np.asarray(srcw), np.asarray(idxl), axis=1)
        err = float(np.abs(np.asarray(out) - ref).max())
        print(f"256 gather local-idx: OK err={err:.2e}", flush=True)
    except Exception as e:
        print(f"256 gather local-idx: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    src2 = jnp.asarray(rng.normal(size=(r, 256)).astype(np.float32))
    sh = jnp.asarray([5], jnp.int32)
    try:
        out = pl.pallas_call(
            k_wide_roll,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r, 256), jnp.float32),
        )(src2, sh)
        ref = np.roll(np.asarray(src2), -5 % r, axis=0)
        ref = np.roll(np.asarray(src2), 5, axis=0)
        err = float(np.abs(np.asarray(out) - ref).max())
        print(f"wide roll:   OK err={err:.2e}", flush=True)
    except Exception as e:
        print(f"wide roll:   FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
