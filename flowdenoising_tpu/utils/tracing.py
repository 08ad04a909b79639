"""Device tracing helper (successor of the reference's __debug__-gated wall
timers, SURVEY.md section 5.1): wraps jax.profiler for TensorBoard traces.

Usage:
    from flowdenoising_tpu.utils.tracing import device_trace
    with device_trace("/tmp/fdt-trace"):
        denoise(vol, cfg)
"""

from __future__ import annotations

import contextlib
import logging


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (view with
    TensorBoard's profile plugin).  No-op with a warning if the backend
    does not support profiling."""
    import jax
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # remote/experimental PJRT backends may refuse
        logging.warning(f"device trace unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                logging.info(f"device trace written to {log_dir}")
            except Exception as e:
                logging.warning(f"stopping device trace failed: {e}")


@contextlib.contextmanager
def annotate(name: str):
    """Named region for traces (jax.profiler.TraceAnnotation)."""
    import jax
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield
