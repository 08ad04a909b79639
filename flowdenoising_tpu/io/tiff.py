"""Multi-page TIFF volume I/O (PIL-backed).

Replaces the reference's ``skimage.io.imread/imsave(plugin="tifffile")``
(/root/reference/src/flowdenoising.py:475,548).  Pages map to Z slices.
Supports uint8 / uint16 / int16 / float32 pages, the set produced by the
reference variants (float32 always from the main CLI; uint8/uint16
quantization from the sequential variant).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

# Volumes can legitimately be huge; PIL's decompression-bomb guard is not
# meaningful for scientific stacks we open locally.
Image.MAX_IMAGE_PIXELS = None

_MODE_FOR_DTYPE = {
    np.dtype(np.uint8): "L",
    np.dtype(np.uint16): "I;16",
    np.dtype(np.int32): "I",
    np.dtype(np.float32): "F",
}


def read_tiff(path: str | os.PathLike) -> np.ndarray:
    """Read a (multi-page) TIFF as a (Z, Y, X) array (single page -> Z=1...).

    Matches skimage.io.imread page stacking; dtype is preserved.
    """
    img = Image.open(path)
    pages = []
    i = 0
    while True:
        try:
            img.seek(i)
        except EOFError:
            break
        pages.append(np.asarray(img))
        i += 1
    if not pages:
        raise ValueError(f"no pages in TIFF {path}")
    if len(pages) == 1:
        return pages[0]
    return np.stack(pages, axis=0)


def write_tiff(path: str | os.PathLike, data: np.ndarray) -> None:
    """Write a (Z, Y, X) array as a multi-page TIFF (or a single page for 2-D)."""
    data = np.asarray(data)
    if data.ndim == 2:
        data = data[None]
    dt = np.dtype(data.dtype)
    if dt == np.dtype(np.int16):
        data = data.astype(np.int32)
        dt = data.dtype
    if dt not in _MODE_FOR_DTYPE:
        raise ValueError(f"unsupported dtype for TIFF: {data.dtype}")
    frames = [Image.fromarray(np.ascontiguousarray(s)) for s in data]
    frames[0].save(path, save_all=True, append_images=frames[1:], format="TIFF")
