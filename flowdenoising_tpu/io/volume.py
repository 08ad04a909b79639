"""Extension-dispatched volume read/write.

Reproduces the reference's sniffing rules: input is MRC when the extension
*contains* "mrc" case-insensitively (flowdenoising.py:466), output is MRC on
an exact "mrc"/"MRC" match (flowdenoising.py:539); everything else is TIFF.
"""

from __future__ import annotations

import os

import numpy as np

from flowdenoising_tpu.io.mrc import read_mrc, write_mrc
from flowdenoising_tpu.io.tiff import read_tiff, write_tiff


def _ext(path) -> str:
    return str(path).split(".")[-1]


def is_mrc_input(path) -> bool:
    return "mrc" in _ext(path).lower()


def is_mrc_output(path) -> bool:
    return _ext(path) in ("mrc", "MRC")


def read_volume(path: str | os.PathLike, memory_map: bool = False) -> np.ndarray:
    """Read a volume as (Z, Y, X).  MRC keeps its stored dtype (like
    mrcfile.open(...).data); TIFF is cast to float32 (flowdenoising.py:475)."""
    if is_mrc_input(path):
        data, _ = read_mrc(path, memory_map=memory_map)
        return data
    return read_tiff(path).astype(np.float32)


def write_volume(path: str | os.PathLike, data: np.ndarray) -> None:
    """Write a volume; MRC as float32 (flowdenoising.py:544), TIFF as float32."""
    if is_mrc_output(path):
        write_mrc(path, np.asarray(data, dtype=np.float32))
    else:
        write_tiff(path, np.asarray(data, dtype=np.float32))
