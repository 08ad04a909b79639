#!/usr/bin/env python
"""Per-stage microbenchmark: where does a pass's device time go?

Each hot op (polyexp, update_matrices, update_flow, tap-warp sampling,
pyramid resize) is scanned REPS times inside ONE jitted program, so remote
dispatch overhead amortizes away and the number reflects in-program device
cost -- the same way the ops run inside a compiled pass.  Totals are then
scaled by per-pass invocation counts to reconstruct the pass cost.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("FDTPU_CACHE_DIR", "/tmp/fdtpu_microbench_cache")

REPS = int(os.environ.get("PROBE_REPS", "8"))


def _sync(out):
    # A scalar fetch forces device synchronization (more robust than
    # block_until_ready across remote PJRT transports; see bench.py).
    # MUST slice on-device before fetching: np.asarray(leaf) would pull the
    # whole array through the remote tunnel (~20 MB/s) and time that
    # transfer instead of the kernel.
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])


def timed_scan(step, init, *consts, reps=REPS, outer=3):
    """Time ``reps`` sequential applications of ``step(carry, *consts)``
    inside one jit.  Large operands must be passed via ``consts`` (explicit
    jit arguments) -- closing over them embeds them as HLO constants, which
    overflows the remote compile transport."""
    import jax

    @jax.jit
    def many(x, *cs):
        def body(c, _):
            return step(c, *cs), None
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    out = many(init, *consts)
    _sync(out)
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        out = many(init, *consts)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.config import FlowConfig
    from flowdenoising_tpu.ops.farneback import (
        poly_expand, update_matrices, update_flow, _level_displacement)
    from flowdenoising_tpu.ops.resize import resize_linear
    from flowdenoising_tpu.ops.warp import warp_slices

    n = int(os.environ.get("BENCH_SIZE", "256"))
    cfg = FlowConfig(levels=3, winsize=5, use_initial_flow=True)
    ks2 = 8            # sigma=2 -> 17 taps
    taps_nc = 2 * ks2  # non-center taps
    iters = cfg.iterations

    rng = np.random.default_rng(0)
    levels = cfg.clamped_levels(n, n)
    print(f"volume {n}^3, levels 0..{levels}, iters={iters}, "
          f"taps/axis={taps_nc + 1}, reps/op={REPS}")

    pass_total = 0.0
    for k in range(levels + 1):
        hk = wk = max(1, round(n * 0.5 ** k))
        img = jnp.asarray(rng.normal(size=(n, hk, wk)).astype(np.float32))
        d = _level_displacement(cfg, k)

        t_pe = timed_scan(
            lambda x: poly_expand(x, cfg.poly_n, cfg.poly_sigma)[..., 0] + x,
            img)

        r0 = jax.jit(lambda x: poly_expand(x, cfg.poly_n, cfg.poly_sigma))(img)
        r1 = r0 + 0.01
        # Smooth flow field, amplitude ~0.8 px: representative of real
        # post-aggregation flows (a per-pixel-random field would defeat the
        # kernels' per-block dead-shift skipping, which real flows enable).
        yy, xx = np.mgrid[0:hk, 0:wk].astype(np.float32)
        ph = rng.uniform(0, 2 * np.pi, size=(n, 1, 1)).astype(np.float32)
        fu = 0.8 * np.sin(2 * np.pi * xx / 40.0 + ph)
        fv = 0.8 * np.cos(2 * np.pi * yy / 40.0 + ph)
        flow0 = jnp.asarray(np.stack([fu, fv], axis=-1))

        t_um = timed_scan(
            lambda f, a, b_: update_matrices(a, b_, f, d, cfg.sampler)[..., :2] * 1e-3,
            flow0, r0, r1)
        m0 = jax.jit(lambda f, a, b_: update_matrices(a, b_, f, d, cfg.sampler)
                     )(flow0, r0, r1)
        t_uf = timed_scan(
            lambda mm: mm * 0.99 + jnp.pad(
                update_flow(mm, cfg.winsize, cfg.sampler),
                [(0, 0)] * 3 + [(0, 3)]),
            m0)
        t_umuf = timed_scan(
            lambda f, a, b_: update_flow(
                update_matrices(a, b_, f, d, cfg.sampler),
                cfg.winsize, cfg.sampler),
            flow0, r0, r1)
        try:
            from flowdenoising_tpu.ops.pallas.sample import pallas_supported
            from flowdenoising_tpu.ops.pallas.umuf import umuf_pallas
            if pallas_supported():
                t_fused = timed_scan(
                    lambda f, a, b_: umuf_pallas(a, b_, f, d, cfg.winsize),
                    flow0, r0, r1)
                t_packed = timed_scan(
                    lambda f, a, b_: umuf_pallas(a, b_, f, d, cfg.winsize,
                                                 packed=True),
                    flow0, r0, r1)
                t_xwin = timed_scan(
                    lambda f, a, b_: umuf_pallas(a, b_, f, d, cfg.winsize,
                                                 xwin=True),
                    flow0, r0, r1)
            else:
                t_fused = t_packed = t_xwin = float("nan")
        except Exception as e:
            print("fused kernel failed:", e)
            t_fused = t_packed = t_xwin = float("nan")

        if k > 0:
            t_rz = timed_scan(
                lambda f: resize_linear(f, (hk, wk)) * 0.5 + f * 0.1,
                jnp.moveaxis(flow0, -1, -3))
        else:
            t_rz = 0.0

        c_um = c_uf = taps_nc * iters
        lvl = t_pe + c_um * t_um + c_uf * t_uf + taps_nc * t_rz
        pass_total += lvl
        print(f"L{k} {hk:4d}x{wk:<4d} batch {n}: polyexp {t_pe*1e3:7.2f}ms  "
              f"UM {t_um*1e3:7.2f}ms  UF {t_uf*1e3:7.2f}ms  "
              f"UM+UF {t_umuf*1e3:7.2f}ms  fused {t_fused*1e3:7.2f}ms  "
              f"packed {t_packed*1e3:7.2f}ms  xwin {t_xwin*1e3:7.2f}ms  "
              f"resize {t_rz*1e3:6.2f}ms  -> "
              f"contrib {lvl:6.2f}s (UM {c_um*t_um:5.2f}s UF {c_uf*t_uf:5.2f}s)")

    img = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-1, 1, size=(n, n, n, 2)).astype(np.float32))
    t_wp = timed_scan(
        lambda s, f: warp_slices(s, f, cfg.max_displacement, cfg.sampler),
        img, flow)
    pass_total += taps_nc * t_wp
    print(f"tap warp {n}x{n} batch {n}: {t_wp*1e3:7.2f}ms -> contrib "
          f"{taps_nc * t_wp:5.2f}s")

    print(f"\nestimated device time per pass: {pass_total:.2f}s "
          f"(x3 passes = {3 * pass_total:.2f}s)")


if __name__ == "__main__":
    main()
