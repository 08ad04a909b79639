#!/usr/bin/env python
"""Probe: fused-iteration kernel variants at L0 with realistic seeded flows."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FDTPU_CACHE_DIR", "/tmp/fdtpu_probe_cache")
import numpy as np

def _sync(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])

def timed(fn, *args, reps=None, outer=3):
    reps = reps or int(os.environ.get('PROBE_REPS', '8'))
    import jax
    @jax.jit
    def many(*a):
        def body(c, _):
            return fn(c, *a[1:]), None
        out, _ = jax.lax.scan(body, a[0], None, length=reps)
        return out
    out = many(*args); _sync(out)
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter(); out = many(*args); _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps

def main():
    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax, jax.numpy as jnp
    from flowdenoising_tpu.ops.pallas.umuf import umuf_pallas, umuf_iterate
    from flowdenoising_tpu.ops.farneback import poly_expand

    n = int(os.environ.get("PROBE_B", "128"))
    hw = int(os.environ.get("PROBE_HW", "256"))
    d = int(os.environ.get("PROBE_D", "8"))
    amp = float(os.environ.get("PROBE_AMP", "4.0"))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(n, hw, hw)).astype(np.float32))
    r0 = jax.jit(lambda x: poly_expand(x, 5, 1.2))(img)
    r1 = r0 + 0.01
    # realistic seeded tap flow: smooth large-scale field, amplitude `amp`
    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
    mode = os.environ.get("PROBE_MODE", "sin")
    ph = rng.uniform(0, 2*np.pi, size=(n,1,1)).astype(np.float32)
    if mode == "drift":
        # realistic solve-mode tap flow: per-slice global drift up to +-amp
        # plus ~0.3 px structure ripple
        base_u = rng.uniform(-amp, amp, size=(n,1,1)).astype(np.float32)
        base_v = rng.uniform(-amp, amp, size=(n,1,1)).astype(np.float32)
        fu = base_u + 0.3*np.sin(2*np.pi*xx/40.0 + ph)
        fv = base_v + 0.3*np.cos(2*np.pi*yy/40.0 + ph)
    else:
        fu = amp*np.sin(2*np.pi*xx/200.0 + ph)
        fv = amp*np.cos(2*np.pi*yy/200.0 + ph)
    flow = jnp.asarray(np.stack([fu, fv], -1))
    _sync(r0); _sync(flow)

    variants = [("gather", {}), ("packed", {"packed": True}),
                ("xwin", {"xwin": True}),
                ("p1only", {"_phases": "p1"}),
                ("p2only", {"_phases": "p2"}),
                ("p1xwin", {"xwin": True, "_phases": "p1"}),
                ("dyn", {"dyn": True}),
                ("mxu", {"mxu": True}),
                ("dynmxu", {"dyn": True, "mxu": True}),
                ("dynmxurg8", {"dyn": True, "mxu": True, "rg": 8}),
                ("dynmxurg16", {"dyn": True, "mxu": True, "rg": 16}),
                ("dynmxurg32", {"dyn": True, "mxu": True, "rg": 32}),
                ("dynmxupk", {"dyn": True, "mxu": True, "packed": True}),
                ("p1dyn", {"dyn": True, "_phases": "p1"}),
                ("noop", {"_phases": "none"}),
                ("p2mxu", {"mxu": True, "_phases": "p2"})]
    sel = os.environ.get("PROBE_VARIANTS")
    if sel:
        names = sel.split(",")
        variants = [v for v in variants if v[0] in names]
    for name, kw in variants:
        t = timed(lambda f, a, b: umuf_pallas(a, b, f, d, 5, **kw), flow, r0, r1)
        gb = (n*hw*hw*4*(5+5+2+2))/1e9
        print(f"{name:8s} b={n} {hw}^2 d={d} amp={amp}: {t*1e3:8.2f} ms   "
              f"({gb/t:6.1f} GB/s effective)", flush=True)

    # 3-iteration chains: fused in-kernel vs one program per iteration
    iters = int(os.environ.get("PROBE_ITERS", "3"))
    chain_variants = [("ch-base", {}), ("ch-dynmxu", {"dyn": True, "mxu": True}),
                      ("ch-dynmxurg8", {"dyn": True, "mxu": True, "rg": 8}),
                      ("ch-dynmxurg16", {"dyn": True, "mxu": True, "rg": 16})]
    sel = os.environ.get("PROBE_CHAINS")
    if sel is not None:
        names = sel.split(",")
        chain_variants = [v for v in chain_variants if v[0] in names]
    for name, kw in chain_variants:
        for fused in (True, False):
            t = timed(lambda f, a, b: umuf_iterate(a, b, f, iters, d, 5,
                                                   fused=fused, **kw),
                      flow, r0, r1)
            gb = (n*hw*hw*4*(5+5+2+2))*iters/1e9
            tag = f"{name}{'-fused' if fused else '-split'}"
            print(f"{tag:16s} b={n} {hw}^2 d={d} amp={amp} iters={iters}: "
                  f"{t*1e3:8.2f} ms ({t*1e3/iters:6.2f} ms/iter, "
                  f"{gb/t:6.1f} GB/s eff)", flush=True)

if __name__ == "__main__":
    main()
