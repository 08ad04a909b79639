#!/usr/bin/env python
"""Probe: phase-2 (box aggregation + 2x2 solve) implementation variants.

The fused-iteration kernel's phase 2 measures ~92us/plane on hardware while
an instruction-count model says <10us; this probe isolates the box+solve on
a single interior tile (a=m0=0, th rows, w_true=w_out) and races:

  concat  -- the shipping implementation: shifted sums assembled with
             jnp.concatenate([broadcast(edge), slice], axis=...)
  roll    -- circular roll (pltpu.roll) + masked edge fixup (iota select)
  dsread  -- rows via roll; columns via an edge-padded lane-aligned scratch
             then statically shifted full-width reads
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
CH = 5


def _sync(x):
    float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def timed(step, init, *consts, reps=8, outer=3):
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


def _solve(sums, out_ref, inv):
    g11, g12, g22, h1, h2 = [s * inv for s in sums]
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    out_ref[0, 0] = (g11 * h2 - g12 * h1) * idet
    out_ref[0, 1] = (g22 * h1 - g12 * h2) * idet


def k_concat(m_ref, out_ref, *, r, th, w):
    inv = jnp.float32(1.0 / float((2 * r + 1) ** 2))
    sums = []
    for c in range(CH):
        rows = m_ref[0, c]
        vacc = None
        for o in range(-r, r + 1):
            if o < 0:
                sh = jnp.concatenate(
                    [jnp.broadcast_to(rows[0:1, :], (-o, w)), rows[:th + o]], 0)
            elif o > 0:
                sh = jnp.concatenate(
                    [rows[o:], jnp.broadcast_to(rows[th - 1:th, :], (o, w))], 0)
            else:
                sh = rows
            vacc = sh if vacc is None else vacc + sh
        hacc = None
        for o in range(-r, r + 1):
            if o == 0:
                sh = vacc
            elif o < 0:
                sh = jnp.concatenate(
                    [jnp.broadcast_to(vacc[:, 0:1], (th, -o)), vacc[:, :w + o]], 1)
            else:
                sh = jnp.concatenate(
                    [vacc[:, o:], jnp.broadcast_to(vacc[:, w - 1:w], (th, o))], 1)
            hacc = sh if hacc is None else hacc + sh
        sums.append(hacc)
    _solve(sums, out_ref, inv)


def _vacc_roll(rows, r, th, w):
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0)
    top = rows[0:1, :]
    bot = rows[th - 1:th, :]
    vacc = rows
    for o in range(1, r + 1):
        dn = pltpu.roll(rows, th - o, axis=0)  # read row i+o
        vacc = vacc + jnp.where(rows_i < th - o, dn, bot)
        up = pltpu.roll(rows, o, axis=0)    # read row i-o
        vacc = vacc + jnp.where(rows_i >= o, up, top)
    return vacc


def k_roll(m_ref, out_ref, *, r, th, w):
    inv = jnp.float32(1.0 / float((2 * r + 1) ** 2))
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)
    sums = []
    for c in range(CH):
        vacc = _vacc_roll(m_ref[0, c], r, th, w)
        left = vacc[:, 0:1]
        right = vacc[:, w - 1:w]
        hacc = vacc
        for o in range(1, r + 1):
            rt = pltpu.roll(vacc, w - o, axis=1)
            hacc = hacc + jnp.where(cols_i < w - o, rt, right)
            lt = pltpu.roll(vacc, o, axis=1)
            hacc = hacc + jnp.where(cols_i >= o, lt, left)
        sums.append(hacc)
    _solve(sums, out_ref, inv)


def k_dsread(m_ref, out_ref, pad_ref, *, r, th, w):
    inv = jnp.float32(1.0 / float((2 * r + 1) ** 2))
    sums = []
    for c in range(CH):
        vacc = _vacc_roll(m_ref[0, c], r, th, w)
        pad_ref[:, _LANE:_LANE + w] = vacc
        pad_ref[:, _LANE - r:_LANE] = jnp.broadcast_to(vacc[:, 0:1], (th, r))
        pad_ref[:, _LANE + w:_LANE + w + r] = jnp.broadcast_to(
            vacc[:, w - 1:w], (th, r))
        hacc = None
        for o in range(-r, r + 1):
            sh = pad_ref[:, pl.ds(_LANE + o, w)]
            hacc = sh if hacc is None else hacc + sh
        sums.append(hacc)
    _solve(sums, out_ref, inv)


def run(kern, m, r, th, w, scratch=False, interpret=False):
    b = m.shape[0]
    return pl.pallas_call(
        functools.partial(kern, r=r, th=th, w=w),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, CH, th, w), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, th, w), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, th, w), jnp.float32),
        scratch_shapes=([pltpu.VMEM((th, w + 2 * _LANE), jnp.float32)]
                        if scratch else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(m)


VARIANTS = [("concat", k_concat, False),
            ("roll", k_roll, False),
            ("dsread", k_dsread, True)]


def main():
    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    b = int(os.environ.get("PROBE_B", "64"))
    th = w = int(os.environ.get("PROBE_HW", "256"))
    r = 2
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.normal(size=(b, CH, th, w)).astype(np.float32))

    sel = os.environ.get("PROBE_VARIANTS")
    variants = [v for v in VARIANTS if not sel or v[0] in sel.split(",")]

    o_ref = run(k_concat, m[:2], r, th, w)
    for name, kern, scr in variants:
        if name == "concat":
            continue
        o = run(kern, m[:2], r, th, w, scratch=scr)
        err = float(jnp.max(jnp.abs(o - o_ref)))
        print(f"{name} vs concat max err: {err:.2e}", flush=True)

    dummy = jnp.zeros((b, 2, th, w), jnp.float32)
    for name, kern, scr in variants:
        t = timed(lambda carry, mm: run(kern, mm, r, th, w, scratch=scr)
                  + carry * 0, dummy, m)
        print(f"{name:8s} b={b} {th}x{w}: {t*1e3:8.2f} ms "
              f"({t/b*1e6:6.1f} us/plane)", flush=True)


if __name__ == "__main__":
    main()
