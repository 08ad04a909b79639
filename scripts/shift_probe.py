#!/usr/bin/env python
"""Probe: static predicated y-shift loop vs dynamic fori_loop over the
active range (8-aligned base + in-register row offset).

Validates on hardware whether Mosaic (a) executes @pl.when bodies
regardless of the runtime predicate (the amp-invariance of iter_probe
suggests so) and (b) supports a dynamic-trip-count fori_loop whose body
does an 8-aligned dynamic sublane slice + small dynamic_slice offset --
the design that would make shift skipping real.
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

_LANE = 128
C = 5


def _sync(x):
    float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def timed(jfn, *args, reps=8, outer=3):
    @jax.jit
    def many(*a):
        def body(c, _):
            return jfn(c, *a[1:]), None
        out, _ = jax.lax.scan(body, a[0], None, length=reps)
        return out
    out = many(*args); _sync(out)
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter(); out = many(*args); _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps, out


def kernel_static(v_ref, src_ref, out_ref, acc_ref, *, d, h):
    v = v_ref[0]
    m = d + 1
    vmin = jnp.min(v)
    vmax = jnp.max(v)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for s in range(-d, d + 2):
        @pl.when((vmin < s + 1) & (vmax > s - 1))
        def _(s=s):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(v - s))
            for c in range(C):
                rows = src_ref[0, c, m + s:m + s + h, :]
                acc_ref[...] += wy * rows
    out_ref[0] = acc_ref[...]


def kernel_dyn(v_ref, src_ref, out_ref, acc_ref, *, d, h):
    v = v_ref[0]
    m = d + 1
    s_lo = jnp.floor(jnp.min(v)).astype(jnp.int32)
    s_hi = jnp.floor(jnp.max(v)).astype(jnp.int32) + 1
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(s, _):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(v - s.astype(jnp.float32)))
        base = m + s
        aligned = (base // 8) * 8
        off = base - aligned
        aligned = pl.multiple_of(aligned, 8)
        for c in range(C):
            window = src_ref[0, c, pl.ds(aligned, h + 8), :]
            # Mosaic has no value-level dynamic_slice; rotate the window up
            # by the sub-8 offset so rows [0, h) are the target rows.
            rows = pltpu.roll(window, -off, axis=0)[:h]
            acc_ref[...] += wy * rows
        return 0

    jax.lax.fori_loop(s_lo, s_hi + 1, body, 0)
    out_ref[0] = acc_ref[...]


def kernel_nopred(v_ref, src_ref, out_ref, acc_ref, *, d, h, k=18):
    """No predication: unconditionally accumulate exactly k shifts."""
    v = v_ref[0]
    m = d + 1
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for s in range(-d, -d + k):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(v - s))
        for c in range(C):
            rows = src_ref[0, c, m + s:m + s + h, :]
            acc_ref[...] += wy * rows
    out_ref[0] = acc_ref[...]


def run(kern, v, src, d, h, w, interpret=False):
    b = v.shape[0]
    f = pl.pallas_call(
        functools.partial(kern, d=d, h=h),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, h + 2 * (d + 1) + 8, w),
                         lambda bb: (bb, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return f(v, src)


def main():
    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    d = int(os.environ.get("PROBE_D", "8"))
    b, h, w = 128, 256, 256
    amp = float(os.environ.get("PROBE_AMP", "0.5"))
    rng = np.random.default_rng(0)
    v = jnp.asarray(
        (rng.uniform(-amp, amp, size=(b, 1, 1))
         + 0.3 * rng.standard_normal((b, h, w))).astype(np.float32))
    v = jnp.clip(v, -d, d)
    src = jnp.asarray(rng.normal(
        size=(b, C, h + 2 * (d + 1) + 8, w)).astype(np.float32))

    # correctness cross-check (hardware, tiny)
    o1 = run(kernel_static, v[:2], src[:2], d, h, w)
    o2 = run(kernel_dyn, v[:2], src[:2], d, h, w)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"static vs dyn max err: {err:.2e}", flush=True)

    variants = [("static", kernel_static), ("dyn", kernel_dyn),
                ("nopred3", functools.partial(kernel_nopred, k=3)),
                ("nopred18", functools.partial(kernel_nopred, k=18))]
    sel = os.environ.get("PROBE_VARIANTS")
    if sel:
        variants = [vv for vv in variants if vv[0] in sel.split(",")]
    for name, kern in variants:
        t, _ = timed(lambda vv, ss: run(kern, vv, ss, d, h, w) + vv * 0, v, src)
        print(f"{name:8s} d={d} amp={amp}: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
