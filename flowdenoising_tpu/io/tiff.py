"""Multi-page TIFF volume I/O (native baseline codec, PIL fallback).

Replaces the reference's ``skimage.io.imread/imsave(plugin="tifffile")``
(/root/reference/src/flowdenoising.py:475,548).  Pages map to Z slices.

The native path writes/reads uncompressed baseline TIFF with a correct
SampleFormat tag, so the dtypes the reference variants produce (float32
always from the main CLI; uint8/uint16 quantization from the sequential
variant, /root/reference/src/flowdenoising_sequential.py:566-571) and the
dtypes microscopy stacks commonly carry (int16 signed counts) round-trip
exactly.  PIL is only consulted for files the native parser can't decode
(compressed / tiled / multi-sample), because PIL silently promotes int16
pages to int32 and can't write signed 16-bit at all.
"""

from __future__ import annotations

import os
import struct

import numpy as np

# (BitsPerSample, SampleFormat) -> dtype.  SampleFormat: 1=uint, 2=int, 3=ieee.
_FMT_TO_DTYPE = {
    (8, 1): np.dtype(np.uint8),
    (8, 2): np.dtype(np.int8),
    (16, 1): np.dtype(np.uint16),
    (16, 2): np.dtype(np.int16),
    (32, 1): np.dtype(np.uint32),
    (32, 2): np.dtype(np.int32),
    (32, 3): np.dtype(np.float32),
    (64, 3): np.dtype(np.float64),
}
_DTYPE_TO_FMT = {v: k for k, v in _FMT_TO_DTYPE.items()}

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_ifd_entries(buf: memoryview, off: int, e: str):
    (count,) = struct.unpack_from(e + "H", buf, off)
    entries = {}
    for i in range(count):
        tag, typ, n = struct.unpack_from(e + "HHI", buf, off + 2 + 12 * i)
        vo = off + 2 + 12 * i + 8
        size = _TYPE_SIZES.get(typ, 1) * n
        if size > 4:
            (vo,) = struct.unpack_from(e + "I", buf, vo)
        if typ in _TYPE_FMT:
            vals = struct.unpack_from(e + str(n) + _TYPE_FMT[typ], buf, vo)
        else:
            vals = ()
        entries[tag] = vals
    (nxt,) = struct.unpack_from(e + "I", buf, off + 2 + 12 * count)
    return entries, nxt


def _read_tiff_native(path) -> np.ndarray | None:
    """Parse an uncompressed striped single-sample baseline TIFF.

    Returns None when the file needs a general decoder (compression,
    tiling, multi-sample, palettes), in which case the PIL path takes over.
    """
    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) < 8:
        return None
    buf = memoryview(raw)
    order = raw[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        return None
    (magic,) = struct.unpack_from(e + "H", buf, 2)
    if magic != 42:
        return None
    (off,) = struct.unpack_from(e + "I", buf, 4)

    pages = []
    while off:
        entries, off = _read_ifd_entries(buf, off, e)
        w = entries.get(256, (0,))[0]
        h = entries.get(257, (0,))[0]
        bits = entries.get(258, (1,))
        comp = entries.get(259, (1,))[0]
        spp = entries.get(277, (1,))[0]
        fmt = entries.get(339, (1,))[0]
        strip_offs = entries.get(273, ())
        strip_counts = entries.get(279, ())
        if (comp != 1 or spp != 1 or 322 in entries or not strip_offs
                or len(set(bits)) != 1 or (bits[0], fmt) not in _FMT_TO_DTYPE):
            return None
        dt = _FMT_TO_DTYPE[(bits[0], fmt)].newbyteorder(e)
        if not strip_counts:
            strip_counts = (h * w * dt.itemsize,)
        data = b"".join(
            raw[o:o + c] for o, c in zip(strip_offs, strip_counts))
        page = np.frombuffer(data, dtype=dt, count=h * w).reshape(h, w)
        pages.append(page.astype(dt.newbyteorder("="), copy=False))
    if not pages:
        return None
    return pages[0] if len(pages) == 1 else np.stack(pages, axis=0)


def _read_tiff_pil(path) -> np.ndarray:
    from PIL import Image
    # Volumes can legitimately be huge; the decompression-bomb guard is not
    # meaningful for scientific stacks we open locally.
    Image.MAX_IMAGE_PIXELS = None
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
    return pages[0] if len(pages) == 1 else np.stack(pages, axis=0)


def read_tiff(path: str | os.PathLike) -> np.ndarray:
    """Read a (multi-page) TIFF as (Z, Y, X) (single page -> 2-D).

    Matches skimage.io.imread page stacking; dtype is preserved (including
    signed int16, which PIL would promote to int32).
    """
    data = _read_tiff_native(path)
    if data is None:
        data = _read_tiff_pil(path)
    return data


def write_tiff(path: str | os.PathLike, data: np.ndarray) -> None:
    """Write a (Z, Y, X) array as an uncompressed multi-page baseline TIFF
    (single page for 2-D input).  Supported dtypes: uint8/int8/uint16/int16/
    uint32/int32/float32/float64 -- one strip per page, little-endian."""
    data = np.asarray(data)
    if data.ndim == 2:
        data = data[None]
    if data.ndim != 3:
        raise ValueError(f"expected 2-D or 3-D data, got shape {data.shape}")
    dt = np.dtype(data.dtype.newbyteorder("="))
    if dt not in _DTYPE_TO_FMT:
        raise ValueError(f"unsupported dtype for TIFF: {data.dtype}")
    bits, fmt = _DTYPE_TO_FMT[dt]
    nz, h, w = data.shape
    page_bytes = h * w * dt.itemsize
    data = np.ascontiguousarray(data.astype(dt.newbyteorder("<"), copy=False))

    # Layout: header | page payloads | IFDs (12 entries each).
    tags = [256, 257, 258, 259, 262, 273, 277, 278, 279, 339]
    ifd_size = 2 + 12 * len(tags) + 4
    data_off = 8
    ifd0 = data_off + page_bytes * nz

    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd0))
        f.write(data.tobytes())
        for z in range(nz):
            entries = {
                256: (4, w), 257: (4, h), 258: (3, bits), 259: (3, 1),
                262: (3, 1), 273: (4, data_off + z * page_bytes),
                277: (3, 1), 278: (4, h), 279: (4, page_bytes), 339: (3, fmt),
            }
            f.write(struct.pack("<H", len(entries)))
            for tag in tags:
                typ, val = entries[tag]
                f.write(struct.pack("<HHII", tag, typ, 1, val))
            nxt = ifd0 + (z + 1) * ifd_size if z + 1 < nz else 0
            f.write(struct.pack("<I", nxt))
