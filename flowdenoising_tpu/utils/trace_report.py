"""MEASURED per-stage device-time attribution from a jax.profiler trace.

The reference's accumulators time the actual run
(/root/reference/src/flowdenoising_GPU.py:47-53,760-766).  On TPU the whole
pass is one fused program, so in-line accumulation is impossible -- but the
profiler's Chrome-trace export carries per-op device durations of the REAL
program, overlap included.  This module wraps a run in ``start_trace`` /
``stop_trace`` and aggregates the XLA-Ops lane into the reference's stage
split:

- ``OFE_solve``     -- the Pallas flow-iteration kernels (custom-calls
                       returning (n, 2, h, w) flow stacks: umuf / compose)
- ``warping``       -- the bilinear displacement sampling kernels
- ``OFE_expansion`` -- polynomial-expansion convolutions
- ``elementwise``   -- everything else on the compute lane (pads, fusions,
                       copies, the tap-weighted accumulate = the reference's
                       "convolution" phase)

Used by the CLI at verbosity >= 2; when the backend refuses tracing the CLI
falls back to the microbench reconstruction (utils/stage_report.py) and
labels it as such.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import logging
import os
import re
import tempfile

_FLOW_OUT = re.compile(r"=\s*\w+\[\d+,2,\d+,\d+\]")


@contextlib.contextmanager
def traced_run(log_dir: str | None = None):
    """Trace the enclosed block; yields a dict that receives
    ``{"log_dir": ..., "ok": bool}`` for measured_stage_report."""
    import jax
    state = {"log_dir": log_dir or tempfile.mkdtemp(prefix="fdtpu_trace_"),
             "ok": False}
    started = False
    try:
        jax.profiler.start_trace(state["log_dir"])
        started = True
    except Exception as e:  # remote/experimental PJRT backends may refuse
        logging.info(f"profiler trace unavailable ({e}); "
                     "-v 2 will use the reconstructed stage report")
    try:
        yield state
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                state["ok"] = True
            except Exception as e:
                logging.warning(f"stopping profiler trace failed: {e}")


def _load_latest_trace(log_dir: str):
    paths = sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def measured_stage_report(log_dir: str) -> dict[str, float] | None:
    """Aggregate the trace's device-op durations by stage; logs a table.

    Returns {"OFE_solve": s, "warping": s, "OFE_expansion": s,
    "elementwise": s, "async_copies": s} (device seconds of the traced
    window) or None when no trace was produced.
    """
    trace = _load_latest_trace(log_dir)
    if trace is None:
        return None
    events = trace.get("traceEvents", [])
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")

    totals = {"OFE_solve": 0.0, "warping": 0.0, "OFE_expansion": 0.0,
              "elementwise": 0.0, "async_copies": 0.0}
    busy = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        if "TPU" not in pids.get(pid, ""):
            continue
        lane = tids.get((pid, e.get("tid")), "")
        dur = e.get("dur", 0) / 1e6  # us -> s
        if lane == "Async XLA Ops":
            totals["async_copies"] += dur
            continue
        if lane != "XLA Ops":
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category", "")
        if cat in ("while", "conditional", "call"):
            continue  # containers; their children are separate events
        name = e.get("name", "")
        long_name = args.get("long_name", "")
        if cat == "custom-call":
            if "bilinear_displace" in name or "bilinear_displace" in long_name:
                totals["warping"] += dur
            elif _FLOW_OUT.search(long_name):
                totals["OFE_solve"] += dur
            else:
                totals["elementwise"] += dur
        elif cat == "convolution" or name.startswith("convolution"):
            totals["OFE_expansion"] += dur
        else:
            totals["elementwise"] += dur
        busy += dur

    if busy == 0.0:
        return None
    logging.info("[stages] MEASURED device time (jax.profiler trace of the "
                 "actual run):")
    for name, secs in sorted(totals.items(), key=lambda kv: -kv[1]):
        pct = 100.0 * secs / busy if busy else 0.0
        logging.info(f"[stages]   {name:14s} {secs:8.2f}s  ({pct:4.1f}%)")
    logging.info(f"[stages]   {'device busy':14s} {busy:8.2f}s "
                 "(async copies overlap and are excluded)")
    return totals
