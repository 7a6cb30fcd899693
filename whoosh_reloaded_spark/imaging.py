"""Pure-Python/numpy PNG codec + perceptual hash for multimodal columns.

A real (not stubbed) image decode path with zero non-baked dependencies:
PNG is chunk-parsed here, IDAT inflated with stdlib ``zlib``, and the
five scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9) undone
with numpy — fully vectorized for None/Sub/Up (cumsum along the
bytes-per-pixel stride for Sub), per-byte for the left-dependent
Average/Paeth scanlines.  Supports 8-bit non-interlaced greyscale /
grey+alpha / RGB / RGBA — the shapes a training pipeline's thumbnails
and synthetic fixtures use.  For exotic PNGs (palette, 16-bit, Adam7)
or JPEG, a production cluster ships a C-backed decoder through the same
``decode_fn`` hook in :mod:`whoosh_reloaded_spark.multimodal`; this
module keeps the semantics testable end-to-end without one.

Chunk CRCs are verified on decode and emitted on encode (zlib.crc32),
so a corrupted payload raises instead of yielding silent garbage — at
100 TB the caller maps that to an ``ok=False`` row, never a dead job.
"""

from __future__ import annotations

import struct
import zlib
from typing import Union

import numpy as np

__all__ = [
    "png_encode",
    "png_decode",
    "luma",
    "block_means",
    "average_hash",
    "thumbnail_png",
]

_SIG = b"\x89PNG\r\n\x1a\n"
# colortype -> channels (PNG spec 11.2.2)
_CT_CH = {0: 1, 2: 3, 4: 2, 6: 4}
_CH_CT = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec 9.4) over int arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_encode(arr: np.ndarray, filter_type: Union[int, str] = "auto",
               compress_level: int = 6) -> bytes:
    """Encode a uint8 array as a PNG.

    ``arr``: (h, w) greyscale or (h, w, ch) with ch in {1, 2, 3, 4}.
    ``filter_type``: 0-4 forces that scanline filter on every row
    (handy for exercising every decoder unfilter path), ``"auto"``
    picks per-row by minimum-sum-of-absolute-differences like standard
    encoders.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _CH_CT:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    raw = arr.reshape(h, w * ch).astype(np.int16)
    prior = np.vstack([np.zeros((1, w * ch), np.int16), raw[:-1]])
    left = np.zeros_like(raw)
    left[:, ch:] = raw[:, :-ch]
    upleft = np.zeros_like(raw)
    upleft[:, ch:] = prior[:, :-ch]
    cand = [
        raw,
        raw - left,                      # Sub
        raw - prior,                     # Up
        raw - (left + prior) // 2,       # Average
        raw - _paeth(left, prior, upleft),  # Paeth
    ]
    cand = [(c % 256).astype(np.uint8) for c in cand]
    lines = []
    for y in range(h):
        if filter_type == "auto":
            # standard MSAD heuristic: treat filtered bytes as signed,
            # minimize sum of magnitudes
            costs = [
                int(np.abs(c[y].astype(np.int8).astype(np.int32)).sum())
                for c in cand
            ]
            ft = int(np.argmin(costs))
        else:
            ft = int(filter_type)
            if not 0 <= ft <= 4:
                raise ValueError(f"bad filter_type {filter_type}")
        lines.append(bytes([ft]) + cand[ft][y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CH_CT[ch], 0, 0, 0)
    idat = zlib.compress(b"".join(lines), compress_level)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG to a uint8 array: (h, w) for greyscale, else
    (h, w, ch).  Verifies signature + chunk CRCs; raises ValueError on
    corruption or unsupported variants (palette / 16-bit / interlaced).
    """
    if len(data) < 8 or bytes(data[:8]) != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idats = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = bytes(data[pos + 4:pos + 8])
        body = bytes(data[pos + 8:pos + 8 + length])
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idats.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idats:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ct, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if ct not in _CT_CH:
        raise ValueError(f"unsupported color type {ct}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    ch = _CT_CH[ct]
    stride = w * ch
    raw = zlib.decompress(b"".join(idats))
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"IDAT size {len(raw)} != expected {h * (stride + 1)}"
        )
    out = np.empty((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).astype(
            np.int32
        )
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: per-channel cumulative sum along x
            rec = np.cumsum(line.reshape(w, ch), axis=0).reshape(stride)
            rec %= 256
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft == 3:  # Average: the left-dependency forces a scan;
            # a plain-int list loop beats tiny-vector numpy ~10x here
            lb = raw[off + 1:off + 1 + stride]
            pv = prev.tolist()
            rl = [0] * stride
            for x in range(stride):
                a = rl[x - ch] if x >= ch else 0
                rl[x] = (lb[x] + ((a + pv[x]) >> 1)) & 255
            rec = np.array(rl, dtype=np.int32)
        elif ft == 4:  # Paeth: same scan, plain-int loop
            lb = raw[off + 1:off + 1 + stride]
            pv = prev.tolist()
            rl = [0] * stride
            for x in range(stride):
                a = rl[x - ch] if x >= ch else 0
                c = pv[x - ch] if x >= ch else 0
                b = pv[x]
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rl[x] = (lb[x] + pr) & 255
            rec = np.array(rl, dtype=np.int32)
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8).reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def luma(arr: np.ndarray) -> np.ndarray:
    """Integer ITU-R BT.601 luma: (299*R + 587*G + 114*B) // 1000.
    Greyscale (and grey+alpha) passes the grey channel through.  Integer
    math keeps the result exactly reproducible in SQL oracles."""
    if arr.ndim == 2:
        return arr.astype(np.int64)
    ch = arr.shape[2]
    if ch <= 2:
        return arr[:, :, 0].astype(np.int64)
    a = arr.astype(np.int64)
    return (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000


def block_means(grey: np.ndarray, hash_size: int = 8) -> np.ndarray:
    """Deterministic area-mean downsample to hash_size x hash_size:
    block (by, bx) covers rows [by*h//hs, (by+1)*h//hs) — integer mean
    (floor).  Requires h, w >= hash_size."""
    h, w = grey.shape
    if h < hash_size or w < hash_size:
        raise ValueError(f"image {h}x{w} smaller than hash {hash_size}")
    ys = [(i * h) // hash_size for i in range(hash_size + 1)]
    xs = [(i * w) // hash_size for i in range(hash_size + 1)]
    out = np.empty((hash_size, hash_size), dtype=np.int64)
    g = grey.astype(np.int64)
    for by in range(hash_size):
        for bx in range(hash_size):
            blk = g[ys[by]:ys[by + 1], xs[bx]:xs[bx + 1]]
            out[by, bx] = int(blk.sum()) // blk.size
    return out


def average_hash(arr: np.ndarray, hash_size: int = 8) -> str:
    """aHash perceptual hash as a zero-padded hex string: luma ->
    hash_size^2 block means -> bit = mean_block > global mean, packed
    MSB-first in row-major order.  Near-duplicate images differ in few
    bits (compare with bit_count of XOR)."""
    m = block_means(luma(arr), hash_size)
    thresh = m.mean()
    bits = (m > thresh).reshape(-1)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return format(v, "0{}x".format(hash_size * hash_size // 4))


def thumbnail_png(arr: np.ndarray, size: int = 8) -> bytes:
    """Greyscale thumbnail: the aHash block-mean image re-encoded as a
    tiny PNG — the cheap visual-debug artifact a pipeline stores next
    to each media row."""
    return png_encode(block_means(luma(arr), size).astype(np.uint8))
