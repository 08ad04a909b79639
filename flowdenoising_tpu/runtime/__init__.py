"""Native runtime bindings (ctypes) with transparent NumPy fallback.

``libfdio.so`` provides the host-side data path: MRC payload decode with
dtype conversion, raw writes, and single-pass volume statistics.  If the
shared library is missing it is built on first use with the in-tree
Makefile; if that fails (no toolchain), every entry point falls back to
NumPy with identical results.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfdio.so")
_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # no toolchain / build failure -> numpy fallback
            logging.debug(f"native runtime build skipped: {e}")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fd_read_convert.restype = ctypes.c_int
        lib.fd_read_convert.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.fd_write_raw.restype = ctypes.c_int
        lib.fd_write_raw.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.fd_stats_f32.restype = ctypes.c_int
        lib.fd_stats_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except OSError as e:
        logging.debug(f"native runtime load failed: {e}")
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def read_convert_f32(path: str, offset: int, count: int, mode: int,
                     n_threads: int | None = None) -> np.ndarray | None:
    """Read ``count`` voxels of an MRC payload as float32 via the native
    library; returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(count, dtype=np.float32)
    nt = n_threads if n_threads is not None else (os.cpu_count() or 1)
    rc = lib.fd_read_convert(
        path.encode(), offset, count, mode,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nt)
    if rc != 0:
        raise IOError(f"fd_read_convert({path}) failed with code {rc}")
    return out


def write_raw(path: str, header: bytes, data: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, dtype=np.float32)
    hdr = np.frombuffer(header, dtype=np.uint8)
    rc = lib.fd_write_raw(
        path.encode(),
        hdr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(header),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), data.size)
    if rc != 0:
        raise IOError(f"fd_write_raw({path}) failed with code {rc}")
    return True


def stats_f32(data: np.ndarray):
    """(min, max, mean, rms) in one pass; NumPy fallback when not built."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.float32)
    if lib is None:
        return (float(data.min()), float(data.max()),
                float(data.mean()), float(data.std()))
    out = np.empty(4, dtype=np.float64)
    rc = lib.fd_stats_f32(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), data.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise IOError(f"fd_stats_f32 failed with code {rc}")
    return tuple(out.tolist())
