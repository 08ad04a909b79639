#!/usr/bin/env python
"""Probe: fused-iteration kernel on the PRODUCTION prepped path.

iter_probe.py times the channels-last wrapper, whose per-rep flow
transposes/pads inflate the apparent DMA floor.  This probe preps the
operands once (prep_tiles_cf) and times only what the solve pass actually
runs per (tap, level): umuf_iterate_prepped with a traced r1_start.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FDTPU_CACHE_DIR", "/tmp/fdtpu_probe_cache")
import numpy as np


def _sync(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])


def timed(fn, *args, reps=None, outer=3):
    """Times ``fn(flow, *rest)`` with the FLOW INPUT HELD FIXED across reps.

    Carrying fn's output as the next rep's flow (the scan-carry idiom) is
    wrong for this kernel: the solve collapses the flow toward zero after
    one rep (r1 ~ r0), so reps 2..N measure near-zero dynamic trip counts.
    Instead the carry is a tiny scalar folded into the flow (+1e-30 -- far
    below the floor() granularity, so trip counts are preserved) that the
    compiler cannot prove loop-invariant.
    """
    reps = reps or int(os.environ.get('PROBE_REPS', '64'))
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(c0, flow, *rest):
        def body(c, _):
            out = fn(flow + c, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (c + leaf.reshape(-1)[0] * jnp.float32(1e-30)).astype(
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


def main():
    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax, jax.numpy as jnp
    import functools
    from flowdenoising_tpu.ops.pallas import umuf as U
    from flowdenoising_tpu.ops.farneback import poly_expand

    n = int(os.environ.get("PROBE_B", "128"))
    hw = int(os.environ.get("PROBE_HW", "256"))
    d = int(os.environ.get("PROBE_D", "8"))
    amp = float(os.environ.get("PROBE_AMP", "4.0"))
    winsize = 5
    rng = np.random.default_rng(0)
    # full padded stack: n interior slices + 2*halo context
    halo = int(os.environ.get("PROBE_HALO", "9"))
    nfull = n + 2 * halo
    img = jnp.asarray(rng.normal(size=(nfull, hw, hw)).astype(np.float32))
    rcf = jax.jit(lambda x: jnp.moveaxis(
        poly_expand(x, 5, 1.2), -1, -3))(img)

    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
    ph = rng.uniform(0, 2 * np.pi, size=(n, 1, 1)).astype(np.float32)
    base_u = rng.uniform(-amp, amp, size=(n, 1, 1)).astype(np.float32)
    base_v = rng.uniform(-amp, amp, size=(n, 1, 1)).astype(np.float32)
    if os.environ.get("PROBE_FLOW", "drift") == "noisy":
        # real-pass statistics: global drift + per-pixel flow noise at the
        # measured std (drifting-blob volume tap flows: |v| std ~1.4),
        # box-smoothed at the winsize scale like post-solve fields
        from scipy.ndimage import uniform_filter
        sig = float(os.environ.get("PROBE_SIGMA", "1.4"))
        nu = rng.normal(size=(n, hw, hw)).astype(np.float32)
        nv = rng.normal(size=(n, hw, hw)).astype(np.float32)
        for i in range(n):
            nu[i] = uniform_filter(nu[i], 5)
            nv[i] = uniform_filter(nv[i], 5)
        nu *= sig / (nu.std() + 1e-9)
        nv *= sig / (nv.std() + 1e-9)
        fu = base_u + nu
        fv = base_v + nv
    else:
        fu = base_u + 0.3 * np.sin(2 * np.pi * xx / 40.0 + ph)
        fv = base_v + 0.3 * np.cos(2 * np.pi * yy / 40.0 + ph)
    flow_cf = jnp.asarray(np.stack([fu, fv], 1))  # (n, 2, h, w)
    flow_cf = U._lane_pad_flow_cf(flow_cf, hw)
    _sync(rcf); _sync(flow_cf)

    variants = [
        ("prep-dynmxu", dict(dyn=True, mxu=True), "both"),
        ("prep-noop", dict(dyn=True, mxu=True), "none"),
        ("prep-p1", dict(dyn=True, mxu=True), "p1"),
        ("prep-p2", dict(dyn=True, mxu=True), "p2"),
        ("prep-packed", dict(dyn=True, mxu=True, packed=True), "both"),
        ("prep-rg64", dict(dyn=True, mxu=True, rg=64), "both"),
        ("prep-rg32", dict(dyn=True, mxu=True, rg=32), "both"),
        ("prep-static", dict(mxu=True), "both"),
        ("prep-p1nog", dict(dyn=True, mxu=True), "p1nog"),
        ("prep-p1pk", dict(dyn=True, mxu=True, packed=True), "p1"),
    ]
    sel = os.environ.get("PROBE_VARIANTS")
    if sel:
        names = sel.split(",")
        variants = [v for v in variants if v[0] in names]

    iters = int(os.environ.get("PROBE_ITERS", "1"))
    for name, kw, phases in variants:
        r0_t, r1_t, tiles = U.prep_tiles_cf(
            rcf, d, hw, winsize, iters, packed=kw.get("packed", False),
            dyn=kw.get("dyn", False), interior=(halo, n))
        _sync(r0_t); _sync(r1_t)

        def run(f, r0l, r1l, kw=kw, tiles=tiles, phases=phases):
            in_k = iters
            margin = (winsize // 2) * in_k
            outs = []
            for (a, th), r0x, r1x in zip(tiles, r0l, r1l):
                m0 = max(0, a - margin)
                m1 = min(hw, a + th + margin)
                outs.append(U._umuf_call(
                    r0x, r1x, f[:, 0, m0:m1], f[:, 1, m0:m1],
                    d=d, winsize=winsize, th=th, a=a, m0=m0, h_true=hw,
                    w=hw, interpret=False, iters=in_k,
                    packed=kw.get("packed", False), dyn=kw.get("dyn", False),
                    mxu=kw.get("mxu", False), rg=kw.get("rg", 0),
                    r1_start=jnp.int32(halo), _phases=phases))
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs, 2)

        t = timed(run, flow_cf, r0_t, r1_t)
        # actual DMA bytes per program
        (a, th) = tiles[0]
        hm = th + 2 * (winsize // 2) * iters if len(tiles) == 1 else None
        r1_rows = r1_t[0].shape[2]
        w_out = r0_t[0].shape[-1]
        w_src = r1_t[0].shape[-1]
        per = (5 * (r0_t[0].shape[2]) * w_out + 5 * r1_rows * w_src
               + 2 * r0_t[0].shape[2] * w_out + 2 * th * w_out) * 4
        mb = per * n / 1e6
        print(f"{name:12s} b={n} {hw}^2 d={d} amp={amp} iters={iters}: "
              f"{t*1e3:8.2f} ms   ({mb/1e3/t:6.1f} GB/s actual DMA, "
              f"{mb:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
