"""Measured stage report: trace parsing/grouping on a synthetic profile."""

import gzip
import json
import os

from flowdenoising_tpu.utils.trace_report import measured_stage_report


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_grouping(tmp_path):
    meta = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 3, "tid": 4, "name": "thread_name",
         "args": {"name": "Async XLA Ops"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
    ]
    ev = lambda name, dur, tid=3, cat="fusion", long_name="": {
        "ph": "X", "pid": 3, "tid": tid, "name": name, "dur": dur,
        "args": {"hlo_category": cat, "long_name": long_name}}
    events = meta + [
        # flow-solve custom-call (output (n,2,h,w))
        ev("closed_call.2", 5_000_000, cat="custom-call",
           long_name="%closed_call.2 = f32[24,2,256,256]{3,2,1,0} custom-call(...)"),
        # warp kernel
        ev("_bilinear_displace_pallas_4d.8", 1_000_000, cat="custom-call"),
        # expansion convolution
        ev("convolution_multiply_fusion.14", 500_000, cat="convolution"),
        # container must NOT be counted
        ev("while", 9_000_000, cat="while"),
        # generic fusion -> elementwise
        ev("add_bitcast_fusion.3", 250_000),
        # async copy lane
        ev("copy-start.1", 2_000_000, tid=4, cat="copy"),
        # host event ignored
        {"ph": "X", "pid": 7, "tid": 1, "name": "hostwork", "dur": 123},
    ]
    log_dir = _write_trace(tmp_path, events)
    totals = measured_stage_report(log_dir)
    assert totals is not None
    assert abs(totals["OFE_solve"] - 5.0) < 1e-9
    assert abs(totals["warping"] - 1.0) < 1e-9
    assert abs(totals["OFE_expansion"] - 0.5) < 1e-9
    assert abs(totals["elementwise"] - 0.25) < 1e-9
    assert abs(totals["async_copies"] - 2.0) < 1e-9


def test_no_trace_returns_none(tmp_path):
    assert measured_stage_report(str(tmp_path)) is None


def test_empty_device_lane_returns_none(tmp_path):
    events = [{"ph": "M", "pid": 7, "name": "process_name",
               "args": {"name": "/host:CPU"}},
              {"ph": "X", "pid": 7, "tid": 1, "name": "x", "dur": 5}]
    log_dir = _write_trace(tmp_path, events)
    assert measured_stage_report(log_dir) is None
