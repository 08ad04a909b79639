"""Per-stage device-time report for the CLI (verbosity >= 2).

Successor of the reference GPU variant's OFE / warping / convolution /
transference accumulators (/root/reference/src/flowdenoising_GPU.py:47-53,
760-766).  On TPU every stage is fused into one compiled pass, so per-stage
time cannot be accumulated in-line; instead each hot op is timed standalone
on a small representative slice batch at the run's real plane sizes and
scaled by its per-pass invocation count -- the same reconstruction the
microbench uses (scripts/microbench.py), folded into the CLI report.
"""

from __future__ import annotations

import logging
import time

import numpy as np

from flowdenoising_tpu.config import FilterConfig

_SAMPLE_SLICES = 8
_REPS = 4


def _sync(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    # On-device scalar fetch: np.asarray(leaf) would pull the whole array
    # through a remote PJRT tunnel and time the transfer instead.
    float(leaf.reshape(-1)[0])


def _time_op(step, init, *consts, reps=_REPS):
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
    for _ in range(2):
        t0 = time.perf_counter()
        out = many(init, *consts)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps


def device_stage_report(vol_shape: tuple[int, int, int], cfg: FilterConfig,
                        kernels) -> dict[str, float]:
    """Estimate per-stage device seconds for the full 3-pass run.

    Returns {"OFE_expansion": s, "OFE_solve": s, "pyramid": s, "warping": s,
    "convolution": s} and logs a table.  Stages are timed on
    ``_SAMPLE_SLICES``-slice batches and scaled linearly in slice count
    (ops are embarrassingly batched over slices).
    """
    import jax
    import jax.numpy as jnp
    from flowdenoising_tpu.ops.farneback import (
        poly_expand, update_matrices, update_flow, _level_displacement,
        matmul_precision)
    from flowdenoising_tpu.ops.resize import resize_linear
    from flowdenoising_tpu.ops.warp import warp_slices

    fcfg = cfg.flow
    totals = {"OFE_expansion": 0.0, "OFE_solve": 0.0, "pyramid": 0.0,
              "warping": 0.0, "convolution": 0.0}
    rng = np.random.default_rng(0)
    b = _SAMPLE_SLICES

    # The three passes see planes (Y,X), (Z,X), (Z,Y) with n = Z, Y, X.
    planes = [(vol_shape[1], vol_shape[2]), (vol_shape[0], vol_shape[2]),
              (vol_shape[0], vol_shape[1])]
    with matmul_precision(fcfg):
        for p, ((h, w), taps) in enumerate(zip(planes, kernels)):
            n = vol_shape[p]
            ks2 = len(taps) // 2
            scale = (n + 2 * ks2) / b       # padded stack slices per batch
            scale_n = n / b                 # interior slices per batch
            taps_nc = 2 * ks2
            if cfg.use_flow and fcfg.tap_mode != "solve":
                # compose: 2 adjacent-direction solves (1 with symmetric),
                # one compose step (2 warps) per tap.
                n_solves = 1 if fcfg.symmetric_adjacent else 2
                warps_per_tap = 2.0
            elif cfg.use_flow:
                n_solves = taps_nc
                warps_per_tap = 1.0
            else:
                n_solves = 0
                warps_per_tap = 0.0

            levels = fcfg.clamped_levels(h, w) if cfg.use_flow else 0
            for k in range(levels + 1) if cfg.use_flow else []:
                hk = max(1, round(h * fcfg.pyr_scale ** k))
                wk = max(1, round(w * fcfg.pyr_scale ** k))
                img = jnp.asarray(rng.normal(size=(b, hk, wk)).astype(np.float32))
                d = _level_displacement(fcfg, k)
                t_pe = _time_op(
                    lambda x: poly_expand(x, fcfg.poly_n, fcfg.poly_sigma)[..., 0] + x,
                    img)
                totals["OFE_expansion"] += t_pe * scale
                r0 = jax.jit(lambda x: poly_expand(x, fcfg.poly_n, fcfg.poly_sigma))(img)
                flow0 = jnp.asarray(
                    0.5 * rng.standard_normal((b, hk, wk, 2)).astype(np.float32))
                t_it = _time_op(
                    lambda f, a, bb: update_flow(
                        update_matrices(a, bb, f, d, fcfg.sampler,
                                        packed=fcfg.precision == "bfloat16"),
                        fcfg.winsize, fcfg.sampler),
                    flow0, r0, r0 + 0.01)
                totals["OFE_solve"] += (t_it * fcfg.iterations * n_solves
                                        * (scale_n if fcfg.tap_mode == "solve"
                                           else scale))
                if k > 0:
                    t_rz = _time_op(
                        lambda f: resize_linear(f, (hk, wk)) * 0.5 + f * 0.1,
                        jnp.moveaxis(flow0, -1, -3))
                    totals["pyramid"] += t_rz * n_solves * scale_n

            if cfg.use_flow:
                img = jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32))
                flw = jnp.asarray(
                    rng.uniform(-1, 1, size=(b, h, w, 2)).astype(np.float32))
                t_wp = _time_op(
                    lambda s, f: warp_slices(s, f, fcfg.max_displacement,
                                             fcfg.sampler),
                    img, flw)
                totals["warping"] += t_wp * taps_nc * warps_per_tap * scale_n

            # convolution = the tap-weighted accumulate (trivial on TPU,
            # reported for parity with the reference's split).
            img = jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32))
            t_acc = _time_op(lambda a, s: a + s * 0.123, img, img + 1)
            totals["convolution"] += t_acc * taps_nc * scale_n

    logging.info("[stages] reconstructed device time (per-op microbench at "
                 f"{b}-slice samples, scaled to full passes):")
    total = sum(totals.values())
    for name, secs in sorted(totals.items(), key=lambda kv: -kv[1]):
        pct = 100.0 * secs / total if total else 0.0
        logging.info(f"[stages]   {name:14s} {secs:8.2f}s  ({pct:4.1f}%)")
    logging.info(f"[stages]   {'total':14s} {total:8.2f}s")
    return totals
