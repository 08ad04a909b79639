#!/usr/bin/env python
"""Probe: raw HBM->VMEM->HBM streaming bandwidth through a Pallas grid
pipeline, as a function of block size/shape, to find the fused kernel's
effective DMA ceiling."""
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


def timed(step, init, *consts, reps=None, outer=3):
    reps = reps or int(os.environ.get('PROBE_REPS', '8'))
    @jax.jit
    def many(x, *cs):
        def body(c, _):
            return step(c, *cs), None
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out
    out = many(init, *consts); _sync(out)
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter(); out = many(init, *consts); _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps


def copy_kernel(in_ref, out_ref):
    out_ref[...] = in_ref[...]


def run_copy(x, block_rows):
    b, r, w = x.shape
    return pl.pallas_call(
        copy_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, r, w), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, w), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def multi_kernel(a_ref, b_ref, u_ref, v_ref, out_ref):
    # consume one row of each operand so the block DMAs can't be elided
    out_ref[0, 0] = u_ref[0]
    out_ref[0, 1] = v_ref[0]
    out_ref[0, 0, 0:1] = a_ref[0, 0, 0:1] + b_ref[0, 0, 0:1, :out_ref.shape[-1]]


def run_multi(a, b, u, v):
    """umuf-shaped operand set: a=(n,5,hm,w), b=(n,5,hm2,w2), u/v=(n,hm,w)."""
    n, c, hm, w = a.shape
    hm2, w2 = b.shape[2], b.shape[3]
    return pl.pallas_call(
        multi_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c, hm, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, hm2, w2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hm, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hm, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, hm, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, hm, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b, u, v)


def main():
    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    configs = [
        (64, 1440, 384),   # = the fused kernel's 4.2 MB/program aggregate
        (64, 288, 384),    # r1p block alone
        (256, 288, 384),
        (64, 256, 256),
        (16, 1440, 1536),  # 4x bigger blocks, fewer programs
        (512, 72, 384),    # tiny blocks, many programs
        # minor-width isolation: same block bytes, same program count
        (64, 1440, 384),
        (64, 720, 768),
        (64, 360, 1536),
        (64, 180, 3072),
        (64, 2160, 256),
        (128, 1440, 384),  # 2x programs, same block
    ]
    for b, r, w in configs:
        x = jnp.asarray(rng.normal(size=(b, r, w)).astype(np.float32))
        t = timed(lambda c, xx: run_copy(xx, r) + c * 0, jnp.zeros_like(x), x)
        gb = b * r * w * 4 * 2 / 1e9
        print(f"copy b={b:4d} block=({r},{w}) {b*r*w*4/1e6:7.1f} MB: "
              f"{t*1e3:7.2f} ms  {gb/t:7.1f} GB/s", flush=True)

    # umuf-shaped multi-operand programs (256^2 pass shape, b=128, d=8)
    n, hm, w = 128, 260, 256
    hm2, w2 = 260 + 18 + 16, 384
    a = jnp.asarray(rng.normal(size=(n, 5, hm, w)).astype(np.float32))
    bb = jnp.asarray(rng.normal(size=(n, 5, hm2, w2)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(n, hm, w)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, hm, w)).astype(np.float32))
    mb = (a.nbytes + bb.nbytes + 2 * u.nbytes + n * 2 * hm * w * 4) / 1e6
    t = timed(lambda c, *xs: run_multi(*xs) + c * 0,
              jnp.zeros((n, 2, hm, w), jnp.float32), a, bb, u, v)
    print(f"multi b={n} (umuf operand set) {mb:7.1f} MB: "
          f"{t*1e3:7.2f} ms  {mb/1e3/t:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
