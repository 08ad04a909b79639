#!/usr/bin/env python
"""Probe: raw DynamicGatherOp throughput on v5e.

A kernel issuing K independent lane-gathers over a VMEM-resident source,
accumulating with cheap adds, measures cycles per (8,128)-vreg gather.
Variants vary the dependency structure to expose the issue rate vs latency.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FDTPU_CACHE_DIR", "/tmp/fdtpu_probe_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def timed(jfn, *args, reps=16, outer=3):
    @jax.jit
    def many(c0, *rest):
        def body(c, _):
            out = jfn(rest[0] + c, *rest[1:])
            return (c + out.reshape(-1)[0] * jnp.float32(1e-30)).astype(
                jnp.float32), None
        out, _ = jax.lax.scan(body, c0, None, length=reps)
        return out
    z = np.float32(0)
    out = many(z, *args); _sync(out)
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter(); out = many(z, *args); _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps


def kernel(src_ref, idx_ref, out_ref, *, k: int, rows: int, mode: str):
    acc = jnp.zeros((rows, 128), jnp.float32)
    idx = idx_ref[...]
    src = src_ref[...]
    for i in range(k):
        if mode == "same":
            g = jnp.take_along_axis(src, idx, axis=1,
                                    mode="promise_in_bounds")
        elif mode == "rotidx":
            # fresh index vector per gather (cheap lane-add, keeps gathers
            # independent of each other)
            g = jnp.take_along_axis(
                src, (idx + i) % 128, axis=1, mode="promise_in_bounds")
        else:  # chain: each gather's source depends on the previous result
            g = jnp.take_along_axis(src + acc * jnp.float32(1e-30), idx,
                                    axis=1, mode="promise_in_bounds")
        acc = acc + g
    out_ref[...] = acc


def run(src, idx, k, mode):
    rows = src.shape[0]
    return pl.pallas_call(
        functools.partial(kernel, k=k, rows=rows, mode=mode),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(src, idx)


def main():
    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    rows = 256
    src = jnp.asarray(rng.normal(size=(rows, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, size=(rows, 128)).astype(np.int32))
    freq_ghz = 0.94
    for mode in ("rotidx",):
        ts = {}
        for k in (2, 16, 64, 128):
            t = timed(lambda s, i, k=k: run(s, i, k, mode), src, idx)
            ts[k] = t
            print(f"{mode:8s} rows={rows} k={k:4d}: {t*1e6:9.2f} us",
                  flush=True)
        # incremental cost per gather between the two largest k
        dg = (ts[128] - ts[16]) / (128 - 16)
        vregs = rows // 8
        print(f"{mode:8s} marginal: {dg*1e6:8.3f} us/gather "
              f"({dg*freq_ghz*1e9/vregs:6.2f} cyc/vreg-gather)", flush=True)


if __name__ == "__main__":
    main()
