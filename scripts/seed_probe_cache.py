#!/usr/bin/env python
"""(Re)build the bundled AOT probe seed (flowdenoising_tpu/_probe_seed).

Two artifact kinds, killing the two components of the probe's cold-start
(VERDICT r4: first `auto` CLI run paid 15-18 s at the probe):

1. ``jax.export`` serializations of the two fixed probe program shapes
   (core/autodisp.py::_COMMON_SHAPES) + manifest.json -- a fresh process
   deserializes these instead of re-TRACING farneback_flow (~3.4 s of
   Python on a 1-core host).
2. The persistent-compilation-cache entries of those exported programs --
   restored into the user's cache dir by ``seed_probe_cache()`` so the
   XLA CPU COMPILE (~15 s for both) becomes a ~0.5 s deserialization.
   (Requires `jax_persistent_cache_enable_xla_caches=none`, which
   utils/compile_cache.py sets: the default injects the cache-dir path
   into the hashed compile options, making entries dir-locked.)

Artifacts are version-gated: the manifest records the jax version (export
loads are skipped on mismatch) and cache entries are content-keyed (stale
entries miss harmlessly).  Re-run this script after a jax upgrade.

  python scripts/seed_probe_cache.py
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

tmp = tempfile.mkdtemp(prefix="fdtpu_probe_seed_")
os.environ["FDTPU_CACHE_DIR"] = os.path.join(tmp, "cache")


def main():
    import numpy as np

    from flowdenoising_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from flowdenoising_tpu.config import FilterConfig
    from flowdenoising_tpu.core import autodisp as A

    flow_cfg = FilterConfig().flow
    os.makedirs(A._SEED_DIR, exist_ok=True)
    for f in list(os.listdir(A._SEED_DIR)):
        os.remove(os.path.join(A._SEED_DIR, f))

    # 1. export the live-traced programs
    cpu = jax.local_devices(backend="cpu")[0]
    entries = {}
    with jax.default_device(cpu):
        for g, shape in A._COMMON_SHAPES:
            prog = A._probe_program(flow_cfg, g, 4, shape, len(A._D_LADDER))
            args = (jax.ShapeDtypeStruct((g * 4,) + shape, np.float32),
                    jax.ShapeDtypeStruct((g * 4,) + shape, np.float32),
                    jax.ShapeDtypeStruct((g, len(A._D_LADDER), 2),
                                         np.float32))
            exported = jax.export.export(prog, platforms=["cpu"])(*args)
            key = f"{g}_4_{shape[0]}x{shape[1]}_{len(A._D_LADDER)}"
            fname = f"probe_{key}.jaxexport"
            with open(os.path.join(A._SEED_DIR, fname), "wb") as f:
                f.write(exported.serialize())
            entries[key] = fname
    with open(os.path.join(A._SEED_DIR, "manifest.json"), "w") as f:
        json.dump({"cfg": A._probe_cfg_key(flow_cfg),
                   "jax": jax.__version__, "entries": entries}, f, indent=1)

    # 2. compile the EXPORTED form (the form the runtime executes) into a
    # fresh cache and bundle the entries.  Clear the loader's lru so it
    # re-reads the manifest written above.
    A._get_probe_program.cache_clear()
    with jax.default_device(cpu):
        for g, shape in A._COMMON_SHAPES:
            prog = A._get_probe_program(flow_cfg, g, 4, shape,
                                        len(A._D_LADDER))
            t = np.zeros((g * 4,) + shape, np.float32)
            b = np.full((g, len(A._D_LADDER), 2), 4.0, np.float32)
            t0 = time.perf_counter()
            jax.block_until_ready(prog(t, t, b))
            print(f"compiled exported probe {g}x{shape}: "
                  f"{time.perf_counter() - t0:.2f}s")

    cache = os.environ["FDTPU_CACHE_DIR"]
    copied = 0
    total = 0
    for f in os.listdir(cache):
        if f.endswith("-cache"):
            src = os.path.join(cache, f)
            total += os.path.getsize(src)
            shutil.copyfile(src, os.path.join(A._SEED_DIR, f))
            copied += 1
    print(f"seeded {A._SEED_DIR}: {len(entries)} exports + {copied} "
          f"compiled entries ({total / 1024:.0f} KB)")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
