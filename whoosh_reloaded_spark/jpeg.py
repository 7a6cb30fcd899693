"""Pure-Python/numpy baseline JPEG codec for multimodal columns.

JPEG is the dominant image container in a Common-Crawl-style corpus, so
the multimodal decode path gets a real one with zero non-baked
dependencies: baseline sequential DCT (SOF0/SOF1) AND progressive
(SOF2 — spectral selection, successive approximation, DC/AC refinement
scans, EOB runs; the format most modern web encoders emit), 8-bit
samples, Huffman entropy coding, grayscale and YCbCr with any h/v
sampling factors up to 2 (4:4:4 / 4:2:2 / 4:2:0), restart markers,
JFIF/EXIF APPn passthrough.  A truncated or late-corrupted progressive
stream renders its completed scans (browser behavior) instead of
failing.  Arithmetic-coded, hierarchical, and 12-bit variants raise
ValueError — at scale the caller maps that to an ``ok=False`` row or
ships a C codec through the same ``decode_fn`` hook in
:mod:`whoosh_reloaded_spark.multimodal`.

Decode strategy: the entropy-coded segments are bit-unpacked to a
numpy 0/1 array once, Huffman symbols resolve through a 16-bit
lookahead LUT built per DHT table (one vectorized fill per code, O(1)
per symbol at decode time), and everything after the symbol parse —
dezigzag, dequantize, IDCT (separable orthonormal DCT-III as one
einsum over all blocks), upsampling, YCbCr->RGB — is vectorized across
every block of the image.  The per-symbol Python loop is the only
scalar part, which is the honest floor for entropy-coded data without
a C extension.

The encoder exists so tests and benches can synthesize deterministic
fixtures: Annex-K quantization tables scaled by the usual libjpeg
quality curve, Annex-K Huffman tables, optional 4:2:0 subsampling and
restart intervals.  Both sides speak the actual interchange format —
the decoder reads DQT/DHT/SOF/SOS from the stream, never from shared
module state, so a self-roundtrip exercises the real wire format.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

__all__ = [
    "jpeg_encode",
    "jpeg_encode_progressive",
    "jpeg_decode",
    "jpeg_dc_preview",
    "exif_orientation",
    "apply_orientation",
]

# zigzag scan position -> raster index (ISO/IEC 10918-1 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.intp)

# Annex K.1 base quantization tables (raster order)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II basis: D @ f @ D.T == coefficients
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = 0.5 * (
            (1 / np.sqrt(2)) if _k == 0 else 1.0
        ) * np.cos((2 * _n + 1) * _k * np.pi / 16)

def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) -> list of (code, length, symbol), Annex C."""
    if len(vals) != sum(bits):
        raise ValueError("Huffman BITS/HUFFVAL mismatch")
    out, code, k = [], 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("overfull Huffman table")
            out.append((code, length, vals[k]))
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_CACHE: dict = {}


def _build_decode_lut(bits, vals):
    """16-bit-lookahead decode tables: sym[peek16], len[peek16] as plain
    lists (Python-int hot path).  Cached by table content — corpora
    reuse the same handful of Huffman tables across millions of
    images."""
    key = (tuple(bits), tuple(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.full(1 << 16, -1, np.int16)
    ln = np.zeros(1 << 16, np.uint8)
    for code, length, symbol in _canonical_codes(bits, vals):
        start = code << (16 - length)
        end = start + (1 << (16 - length))
        sym[start:end] = symbol
        ln[start:end] = length
    out = (sym.tolist(), ln.tolist())
    if len(_LUT_CACHE) < 64:  # bound the cache for adversarial corpora
        _LUT_CACHE[key] = out
    return out


def _build_encode_table(bits, vals):
    """symbol -> (code, length) dict for the encoder."""
    return {s: (c, l) for c, l, s in _canonical_codes(bits, vals)}


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (F.1.2.3)
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-bits pad


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _quality_tables(quality: int):
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qs = []
    for base in (_Q_LUMA, _Q_CHROMA):
        q = (base * scale + 50) // 100
        qs.append(np.clip(q, 1, 255).astype(np.int64))
    return qs


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) level-shifted float plane (H, W multiples of 8) ->
    (H//8, W//8, 64) quantized zigzag coefficients."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    )
    coef = np.einsum("kn,bcnm,ml->bckl", _D, blocks, _D.T)
    qz = qtab[ZIGZAG].astype(np.float64)
    # zigzag: position i carries raster coefficient ZIGZAG[i]
    zz = coef.reshape(h // 8, w // 8, 64)[:, :, ZIGZAG]
    return np.rint(zz / qz).astype(np.int64)


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_tab[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.put(code, ln)
    return dc


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad up to multiples of (mh, mw)."""
    h, w = plane.shape
    ph, pw = (-h) % mh, (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _prepare_components(arr: np.ndarray, quality: int, subsampling: str):
    """Shared encode front half: color convert, subsample, pad, FDCT,
    quantize.  Returns (h, w, grey, samp, qsel, comp_zz, qluma,
    qchroma) — both the baseline and the progressive encoder consume
    this, so the two paths carry IDENTICAL quantized coefficients (the
    basis of the exact cross-path equality test)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
            + 0.5 * rgb[:, :, 2] + 128.0
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
            - 0.081312 * rgb[:, :, 2] + 128.0
        planes = [np.clip(np.rint(p), 0, 255) for p in (y, cb, cr)]
        grey = False
    elif arr.ndim == 2:
        planes = [arr.astype(np.float64)]
        grey = True
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = planes[0].shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 65535 or w > 65535:
        raise ValueError("image exceeds JPEG 16-bit dimension limit")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling}")
    sub = subsampling == "4:2:0" and not grey

    qluma, qchroma = _quality_tables(quality)
    if grey:
        samp = [(1, 1)]
        qsel = [0]
    else:
        samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # per-component quantized zigzag blocks
    comp_zz = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        if (hi, vi) != (hmax, vmax):
            # box-average downsample by the sampling ratio
            fy, fx = vmax // vi, hmax // hi
            p = _pad_to(plane, fy, fx)
            p = p.reshape(
                p.shape[0] // fy, fy, p.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        else:
            p = plane
        # pad so the MCU grid covers the plane
        p = _pad_to(p, 8 * vi, 8 * hi)
        # also pad to full MCU columns/rows of the interleaved grid
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        need_w, need_h = mcus_x * 8 * hi, mcus_y * 8 * vi
        p = np.pad(
            p,
            ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])),
            mode="edge",
        )
        qtab = qluma if qsel[ci] == 0 else qchroma
        comp_zz.append(_fdct_quant(p - 128.0, qtab))

    return h, w, grey, samp, qsel, comp_zz, qluma, qchroma


def _headers(h, w, grey, samp, qsel, qluma, qchroma, sof_marker):
    """SOI + JFIF APP0 + DQT(s) + SOF — shared by both encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qluma[ZIGZAG].astype(np.uint8)))
    if not grey:
        out += _seg(
            0xDB, bytes([1]) + bytes(qchroma[ZIGZAG].astype(np.uint8))
        )
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(samp)])
    for ci in range(len(samp)):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out += _seg(sof_marker, bytes(sof))
    return out


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(tc: int, th: int, table) -> bytes:
    bits, vals = table
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def jpeg_encode(arr: np.ndarray, quality: int = 85,
                subsampling: str = "4:2:0",
                restart_interval: int = 0) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JFIF.

    ``subsampling``: ``"4:4:4"`` or ``"4:2:0"`` (ignored for
    grayscale).  ``restart_interval``: emit DRI + RSTn every that many
    MCUs (0 = none).
    """
    h, w, grey, samp, qsel, comp_zz, qluma, qchroma = _prepare_components(
        arr, quality, subsampling
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    n_comps = len(samp)

    dc_tabs = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    ac_tabs = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]

    bw = _BitWriter()
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    preds = [0] * n_comps
    out_ecs = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.pad_to_byte()
                out_ecs += bw.buf
                bw = _BitWriter()
                out_ecs += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * n_comps
            for ci in range(n_comps):
                hi, vi = samp[ci]
                t = 0 if qsel[ci] == 0 else 1
                for by in range(vi):
                    for bx in range(hi):
                        zz = comp_zz[ci][my * vi + by, mx * hi + bx]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci], dc_tabs[t], ac_tabs[t]
                        )
            mcu_count += 1
    bw.pad_to_byte()
    out_ecs += bw.buf

    out = _headers(h, w, grey, samp, qsel, qluma, qchroma, 0xC0)
    out += _dht(0, 0, _DC_LUMA) + _dht(1, 0, _AC_LUMA)
    if not grey:
        out += _dht(0, 1, _DC_CHROMA) + _dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([n_comps])
    for ci in range(n_comps):
        t = 0 if qsel[ci] == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    out += out_ecs
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------ EXIF metadata


def exif_orientation(data: bytes):
    """EXIF orientation (TIFF tag 0x0112) from the APP1 segment, or
    None when absent/malformed: 1..8 per the TIFF spec (1 = upright;
    web pipelines must honor this or thumbnails/hashes of portrait
    phone photos come out rotated).  Never raises on malformed EXIF —
    orientation is advisory metadata, not image data."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(data)
    try:
        while i + 4 <= n:
            if data[i] != 0xFF:
                return None
            m = data[i + 1]
            if m in (0xD8, 0xD9, 0xDA) or 0xD0 <= m <= 0xD7:
                return None  # scan reached, no EXIF
            (ln,) = struct.unpack(">H", data[i + 2:i + 4])
            body = data[i + 4:i + 2 + ln]
            if m == 0xE1 and body[:6] == b"Exif\x00\x00":
                tiff = body[6:]
                if tiff[:2] == b"II":
                    e = "<"
                elif tiff[:2] == b"MM":
                    e = ">"
                else:
                    return None
                (magic,) = struct.unpack(e + "H", tiff[2:4])
                if magic != 42:
                    return None
                (ifd,) = struct.unpack(e + "I", tiff[4:8])
                (cnt,) = struct.unpack(e + "H", tiff[ifd:ifd + 2])
                for k in range(cnt):
                    off = ifd + 2 + 12 * k
                    tag, typ = struct.unpack(e + "HH", tiff[off:off + 4])
                    if tag == 0x0112 and typ == 3:  # SHORT
                        (val,) = struct.unpack(
                            e + "H", tiff[off + 8:off + 10]
                        )
                        return val if 1 <= val <= 8 else None
                return None
            i += 2 + ln
    except (struct.error, IndexError):
        return None
    return None


def apply_orientation(arr: np.ndarray, orientation) -> np.ndarray:
    """Apply an EXIF orientation (1..8) to a decoded array so the
    result is upright.  Unknown/None orientations return the array
    unchanged."""
    o = orientation or 1
    if o == 2:
        return arr[:, ::-1]
    if o == 3:
        return arr[::-1, ::-1]
    if o == 4:
        return arr[::-1, :]
    if o == 5:
        return np.swapaxes(arr, 0, 1)
    if o == 6:
        return np.swapaxes(arr, 0, 1)[:, ::-1]
    if o == 7:
        return np.swapaxes(arr, 0, 1)[::-1, ::-1]
    if o == 8:
        return np.swapaxes(arr, 0, 1)[::-1, :]
    return arr


# ------------------------------------------------------- progressive encode


class _CountSink:
    """First pass of a progressive scan: collect the symbol alphabet
    per (tc, th); value bits are discarded."""

    def __init__(self):
        self.syms = {}

    def sym(self, tc, th, s):
        self.syms.setdefault((tc, th), set()).add(s)

    def bits(self, v, n):
        pass


class _EmitSink:
    """Second pass: emit for real through a _BitWriter with the tables
    built from the first pass."""

    def __init__(self, tables):
        self.bw = _BitWriter()
        self.tables = tables

    def sym(self, tc, th, s):
        code, length = self.tables[(tc, th)][s]
        self.bw.put(code, length)

    def bits(self, v, n):
        self.bw.put(v & ((1 << n) - 1), n)


def _uniform_table(symbols):
    """A valid (BITS, HUFFVAL) covering exactly ``symbols``: every code
    the same length L = ceil(log2(n+1)) — suboptimal size (real
    encoders run Annex K.2 optimization) but canonical, complete, and
    it reserves the all-ones code as the spec recommends."""
    vals = sorted(symbols)
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length())
    while (1 << length) <= n:  # strict: leave the all-ones code unused
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, vals


def _prog_dc_scan(sink, comps_idx, comp_zz, samp, qsel, mcus_y, mcus_x,
                  ah, al):
    preds = {ci: 0 for ci in comps_idx}
    interleaved = len(comps_idx) > 1
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in comps_idx:
                hi, vi = (samp[ci] if interleaved else (1, 1))
                th = 0 if qsel[ci] == 0 else 1
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(comp_zz[ci][my * vi + by, mx * hi + bx][0])
                        if ah == 0:
                            t = dc >> al
                            diff = t - preds[ci]
                            preds[ci] = t
                            s = _category(diff)
                            sink.sym(0, th, s)
                            if s:
                                sink.bits(
                                    diff if diff >= 0
                                    else diff + (1 << s) - 1, s,
                                )
                        else:
                            sink.bits((dc >> al) & 1, 1)


def _prog_ac_first_scan(sink, czz, tby, tbx, th, ss, se, al):
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.sym(1, th, r << 4)
            if r:
                sink.bits(eobrun - (1 << r), r)
            eobrun = 0

    for by in range(tby):
        for bx in range(tbx):
            zz = czz[by, bx]
            r = 0
            coded_any = False
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    sink.sym(1, th, 0xF0)
                    r -= 16
                s = t.bit_length()
                sink.sym(1, th, (r << 4) | s)
                tv = t if v >= 0 else -t
                sink.bits(tv if tv >= 0 else tv + (1 << s) - 1, s)
                r = 0
                coded_any = True
            if r > 0 or not coded_any:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()


def _prog_ac_refine_scan(sink, czz, tby, tbx, th, ss, se, al):
    eobrun = 0
    bebits = []  # corrections pending behind the EOB run

    def flush_eob():
        nonlocal eobrun, bebits
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.sym(1, th, r << 4)
            if r:
                sink.bits(eobrun - (1 << r), r)
            eobrun = 0
        for b in bebits:
            sink.bits(b, 1)
        bebits = []

    for by in range(tby):
        for bx in range(tbx):
            zz = czz[by, bx]
            band = [int(zz[k]) for k in range(ss, se + 1)]
            ts = [abs(v) >> al for v in band]
            # jcphuff EOB fold: symbols only up to the LAST newly-nonzero
            eobpos = -1
            for idx, t in enumerate(ts):
                if t == 1:
                    eobpos = idx
            r = 0
            br_run = []  # corrections pending behind the current run
            for idx in range(eobpos + 1):
                t = ts[idx]
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    flush_eob()
                    sink.sym(1, th, 0xF0)
                    for b in br_run:
                        sink.bits(b, 1)
                    br_run = []
                    r -= 16
                if t > 1:  # already nonzero: buffer its correction bit
                    br_run.append(t & 1)
                    continue
                flush_eob()
                sink.sym(1, th, (r << 4) | 1)
                sink.bits(1 if band[idx] >= 0 else 0, 1)
                for b in br_run:
                    sink.bits(b, 1)
                br_run = []
                r = 0
            tail = [ts[idx] & 1 for idx in range(eobpos + 1, len(ts))
                    if ts[idx] > 1]
            if eobpos < len(ts) - 1:
                eobrun += 1
                bebits.extend(br_run + tail)
                if eobrun == 0x7FFF:
                    flush_eob()
            elif br_run:
                raise AssertionError("corrections pending past block end")
    flush_eob()


# libjpeg's standard 10-scan script (jcparam.c) for 3 components,
# (comps, Ss, Se, Ah, Al); grayscale uses the Y-only subset
_PROG_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_PROG_SCRIPT_GREY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def jpeg_encode_progressive(arr: np.ndarray, quality: int = 85,
                            subsampling: str = "4:2:0") -> bytes:
    """Encode as progressive JFIF (SOF2) using libjpeg's standard
    10-scan script — spectral selection + successive approximation,
    DC and AC refinement passes, EOB runs.

    The quantized coefficients are IDENTICAL to :func:`jpeg_encode` at
    the same quality/subsampling (shared :func:`_prepare_components`),
    so ``jpeg_decode`` must produce bit-identical pixels for the two
    encodings — the cross-path equality the tests pin.  Per-scan
    Huffman tables are uniform-length over the scan's symbol alphabet
    (valid, complete; real encoders optimize — fixture size is not a
    goal here).  Restart intervals are not emitted in progressive mode.
    """
    h, w, grey, samp, qsel, comp_zz, qluma, qchroma = _prepare_components(
        arr, quality, subsampling
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    out = _headers(h, w, grey, samp, qsel, qluma, qchroma, 0xC2)
    script = _PROG_SCRIPT_GREY if grey else _PROG_SCRIPT_COLOR
    for comps_idx, ss, se, ah, al in script:
        def run_scan(sink):
            if ss == 0:
                _prog_dc_scan(
                    sink, comps_idx, comp_zz, samp, qsel,
                    mcus_y, mcus_x, ah, al,
                )
            else:
                ci = comps_idx[0]
                hi, vi = samp[ci]
                cw = -(-(w * hi) // hmax)
                ch = -(-(h * vi) // vmax)
                tbx, tby = -(-cw // 8), -(-ch // 8)
                th = 0 if qsel[ci] == 0 else 1
                if ah == 0:
                    _prog_ac_first_scan(
                        sink, comp_zz[ci], tby, tbx, th, ss, se, al
                    )
                else:
                    _prog_ac_refine_scan(
                        sink, comp_zz[ci], tby, tbx, th, ss, se, al
                    )

        counter = _CountSink()
        run_scan(counter)
        tables = {}
        for (tc, th), syms in counter.syms.items():
            bits, vals = _uniform_table(syms)
            out += _dht(tc, th, (bits, vals))
            tables[(tc, th)] = _build_encode_table(bits, vals)
        emitter = _EmitSink(tables)
        run_scan(emitter)
        emitter.bw.pad_to_byte()
        sos = bytearray([len(comps_idx)])
        for ci in comps_idx:
            th = 0 if qsel[ci] == 0 else 1
            sos += bytes([ci + 1, (th << 4) | th])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, bytes(sos))
        out += emitter.bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode


class _BitReader:
    """Reads Huffman symbols / raw bits from an unstuffed ECS chunk.

    A per-BYTE table of 24-bit windows is precomputed with three
    vectorized shifts; the 16-bit lookahead at bit position p is then
    ``(win24[p >> 3] >> (8 - (p & 7))) & 0xFFFF`` — pure O(1) int work
    per symbol, with memory bounded at ~28 bytes per input byte (list
    fast path, chunks < 1 MiB) or 4 bytes per input byte (numpy path
    for larger chunks, so one multi-megabyte scan cannot blow the
    task's memory budget)."""

    _LIST_PATH_MAX = 1 << 20

    def __init__(self, data: bytes):
        arr = np.frombuffer(data, np.uint8)
        a = np.concatenate([arr, np.zeros(4, np.uint8)]).astype(np.uint32)
        win24 = (a[:-2] << 16) | (a[1:-1] << 8) | a[2:]
        self.win = (
            win24.tolist() if len(arr) < self._LIST_PATH_MAX else win24
        )
        self.limit = len(arr) * 8
        self.pos = 0

    def read_sym(self, sym: list, ln: list) -> int:
        p = self.pos
        w = (int(self.win[p >> 3]) >> (8 - (p & 7))) & 0xFFFF
        s, l = sym[w], ln[w]
        if s < 0 or l == 0 or p + l > self.limit:
            raise ValueError("truncated/invalid entropy-coded data")
        self.pos = p + l
        return s

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.limit:
            raise ValueError("truncated entropy-coded data")
        v = ((int(self.win[p >> 3]) >> (8 - (p & 7))) & 0xFFFF) >> (16 - n)
        self.pos = p + n
        return v


def _extend(v: int, n: int) -> int:
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def _split_ecs(data: bytes, start: int):
    """Split the scan's entropy-coded bytes at RSTn markers: returns
    (list of unstuffed chunks, offset of the terminating marker)."""
    chunks, cur, i, n = [], bytearray(), start, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("truncated scan")
        m = data[i + 1]
        if m == 0x00:  # stuffed FF
            cur.append(0xFF)
            i += 2
        elif m == 0xFF:  # fill byte before a marker (B.1.1.2)
            i += 1
        elif 0xD0 <= m <= 0xD7:  # restart
            chunks.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # next real marker terminates the scan
            break
    chunks.append(bytes(cur))
    return chunks, i


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG: returns uint8 (h, w) for
    grayscale, else (h, w, 3) RGB.  Raises ValueError on corruption and
    on arithmetic/hierarchical/12-bit variants and multi-scan
    (non-interleaved) BASELINE files (route those to a C codec via the
    multimodal ``decode_fn`` hook); 0xFF fill bytes before markers are
    tolerated per spec B.1.1.2.  A progressive stream damaged after its
    first completed scan renders the completed scans."""
    return _decode(bytes(data), preview=False)


def jpeg_dc_preview(data: bytes) -> np.ndarray:
    """1/8-scale preview from DC coefficients only: uint8
    (ceil(h/8), ceil(w/8)) or (..., 3) — each pixel is its 8x8 block's
    mean.  THE at-scale thumbnail path: no IDCT at all, and for a
    PROGRESSIVE stream parsing stops as soon as every component's DC
    scan has arrived — a few percent of the bytes, so a 100-TB
    thumbnail job reads file prefixes instead of decoding images.
    Baseline streams still pay the full entropy walk (block boundaries
    are only discoverable by decoding), but skip dequant/IDCT/
    upsampling.  Progressive previews use the first-scan DC
    approximation (missing refinement bits -> up to one quantization
    step coarser than the final DC)."""
    return _decode(bytes(data), preview=True)


def _decode(data, preview):
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (bad SOI)")
    state = {"frame": None, "any_scan": False, "qtabs": {}}
    try:
        return _parse_and_decode(data, state, preview)
    except (ValueError, struct.error, IndexError) as e:
        frame = state["frame"]
        if state["any_scan"] and frame is not None:
            # progressive's defining property: completed scans render;
            # truncation/corruption AFTER the first completed scan
            # degrades quality instead of dropping the image (browser
            # behavior).  Damage before that still raises.
            fin = _reconstruct_preview if preview else _reconstruct
            return fin(frame, state["qtabs"])
        if isinstance(e, ValueError):
            raise
        # struct.error / IndexError from a malformed header segment:
        # normalize to the documented exception type
        raise ValueError(
            f"malformed JPEG: {type(e).__name__}: {e}"
        ) from e


def _parse_and_decode(data, state, preview=False):
    qtabs = state["qtabs"]
    huff: dict = {}
    frame = None
    ri = 0
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        while i + 1 < n and data[i + 1] == 0xFF:  # fill bytes (B.1.1.2)
            i += 1
        m = data[i + 1] if i + 1 < n else None
        if m is None:
            raise ValueError("truncated JPEG")
        if m == 0xD9:  # EOI
            if state["any_scan"]:
                fin = _reconstruct_preview if preview else _reconstruct
                return fin(frame, qtabs)
            raise ValueError("no scan data (EOI reached)")
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated marker segment")
        (seglen,) = struct.unpack(">H", data[i + 2:i + 4])
        body = data[i + 4:i + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated marker segment")
        if m == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq not in (0, 1) or tq > 3:
                    raise ValueError("bad DQT")
                step = 128 if pq else 64
                raw = body[p + 1:p + 1 + step]
                if len(raw) != step:
                    raise ValueError("bad DQT length")
                vals = (
                    np.frombuffer(raw, ">u2").astype(np.int64)
                    if pq else
                    np.frombuffer(raw, np.uint8).astype(np.int64)
                )
                q = np.empty(64, np.int64)
                q[ZIGZAG] = vals  # DQT stores zigzag order
                qtabs[tq] = q
                p += 1 + step
        elif m == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1:p + 17])
                cnt = sum(bits)
                vals = list(body[p + 17:p + 17 + cnt])
                if len(vals) != cnt:
                    raise ValueError("bad DHT length")
                huff[(tc, th)] = _build_decode_lut(bits, vals)
                p += 17 + cnt
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = body[0]
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            fh, fw = struct.unpack(">HH", body[1:5])
            nc = body[5]
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            if fh == 0 or fw == 0:
                raise ValueError("empty image")
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "progressive": m == 0xC2,
            }
            if frame["progressive"]:
                state["frame"] = frame
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{m:02X}")
        elif m == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = {}
            order = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c:3 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
                order.append(cs)
            if not frame["progressive"]:
                return _decode_scan(
                    data, i + 2 + seglen, frame, sel, qtabs, huff, ri,
                    preview,
                )
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            scan = {
                "sel": sel, "order": order, "Ss": ss, "Se": se,
                "Ah": ahal >> 4, "Al": ahal & 0xF,
            }
            i = _decode_scan_progressive(
                data, i + 2 + seglen, frame, scan, huff, ri
            )
            state["any_scan"] = True
            if scan["Ss"] == 0:
                state.setdefault("dc_seen", set()).update(scan["order"])
                if preview and state["dc_seen"] >= {
                    c["id"] for c in frame["comps"]
                }:
                    # preview short-circuit: every component's DC has
                    # arrived — skip the remaining (AC/refinement) scans
                    return _reconstruct_preview(frame, qtabs)
            continue
        # APPn/COM/others: skip
        i += 2 + seglen
    if state["any_scan"]:
        # truncated progressive stream (no EOI): render what arrived —
        # that is the format's defining property
        fin = _reconstruct_preview if preview else _reconstruct
        return fin(frame, qtabs)
    raise ValueError("no SOS marker found")


def _decode_scan(data, start, frame, sel, qtabs, huff, ri, preview=False):
    comps = frame["comps"]
    _alloc_coeffs(frame)
    mcus_x, mcus_y = frame["mcus_x"], frame["mcus_y"]
    # spec A.2.2: a single-component scan is NON-interleaved — data
    # units traverse the component's own block grid in raster order,
    # ignoring its sampling factors (some encoders write h=v=2 on
    # grayscale frames); multi-component scans interleave by MCU
    non_interleaved = len(comps) == 1
    if non_interleaved:
        n_mcus = comps[0]["tby"] * comps[0]["tbx"]
    else:
        n_mcus = mcus_x * mcus_y
    for c in comps:
        if c["id"] not in sel:
            raise ValueError("scan does not cover every component")
        if c["tq"] not in qtabs:
            raise ValueError("missing quantization table")

    chunks, _ = _split_ecs(data, start)
    if ri:
        expected = -(-n_mcus // ri)
        if len(chunks) != expected:
            raise ValueError("restart-interval segment count mismatch")
    elif len(chunks) != 1:
        raise ValueError("unexpected restart marker (no DRI)")

    mcu = 0
    for chunk in chunks:
        br = _BitReader(chunk)
        preds = {c["id"]: 0 for c in comps}
        seg_mcus = min(ri, n_mcus - mcu) if ri else n_mcus
        for _ in range(seg_mcus):
            for c in comps:
                td, ta = sel[c["id"]]
                if (0, td) not in huff or (1, ta) not in huff:
                    raise ValueError("missing Huffman table")
                dsym, dlen = huff[(0, td)]
                asym, alen = huff[(1, ta)]
                if non_interleaved:
                    by0, bx0 = divmod(mcu, c["tbx"])
                    unit_blocks = [(by0, bx0)]
                else:
                    my, mx = divmod(mcu, mcus_x)
                    unit_blocks = [
                        (my * c["v"] + by, mx * c["h"] + bx)
                        for by in range(c["v"])
                        for bx in range(c["h"])
                    ]
                for by, bx in unit_blocks:
                    zz = c["zz"][by, bx]
                    s = br.read_sym(dsym, dlen)
                    if s > 11:
                        raise ValueError("bad DC category")
                    diff = _extend(br.receive(s), s)
                    preds[c["id"]] += diff
                    zz[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        rs = br.read_sym(asym, alen)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflow")
                        zz[k] = _extend(br.receive(s), s)
                        k += 1
            mcu += 1

    return (_reconstruct_preview if preview else _reconstruct)(frame, qtabs)


def _decode_scan_progressive(data, start, frame, scan, huff, ri):
    """Decode one progressive scan (spec G.2) into the frame's
    persistent coefficient grids; returns the offset of the marker that
    terminated the scan.  Handles interleaved DC scans, non-interleaved
    DC/AC scans, successive approximation (Ah/Al), EOB runs, and
    restart intervals."""
    comps = frame["comps"]
    if "zz" not in comps[0]:
        _alloc_coeffs(frame)
    ss, se, ah, al = scan["Ss"], scan["Se"], scan["Ah"], scan["Al"]
    if ss == 0 and se != 0:
        raise ValueError(
            "bad progressive scan band (DC scan requires Se=0)"
        )
    if ss > se or se > 63 or al > 13:
        raise ValueError("bad progressive scan band")
    if ss > 0 and len(scan["order"]) != 1:
        raise ValueError("progressive AC scan must be single-component")
    by_id = {c["id"]: c for c in comps}
    in_scan = []
    for cid in scan["order"]:
        if cid not in by_id:
            raise ValueError("scan names unknown component")
        in_scan.append(by_id[cid])

    interleaved = len(in_scan) > 1
    if interleaved:
        n_units = frame["mcus_x"] * frame["mcus_y"]
    else:
        c = in_scan[0]
        n_units = c["tbx"] * c["tby"]

    chunks, end = _split_ecs(data, start)
    if ri:
        if len(chunks) != -(-n_units // ri):
            raise ValueError("restart-interval segment count mismatch")
    elif len(chunks) != 1:
        raise ValueError("unexpected restart marker (no DRI)")

    dc_scan = ss == 0
    unit = 0
    for chunk in chunks:
        br = _BitReader(chunk)
        preds = {c["id"]: 0 for c in comps}
        eobrun = 0
        seg_units = min(ri, n_units - unit) if ri else n_units
        for _ in range(seg_units):
            if dc_scan:
                if interleaved:
                    my, mx = divmod(unit, frame["mcus_x"])
                    blocks = []
                    for c in in_scan:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blocks.append(
                                    (c, my * c["v"] + by, mx * c["h"] + bx)
                                )
                else:
                    c = in_scan[0]
                    by, bx = divmod(unit, c["tbx"])
                    blocks = [(c, by, bx)]
                for c, by, bx in blocks:
                    zz = c["zz"][by, bx]
                    if ah == 0:
                        td = scan["sel"][c["id"]][0]
                        if (0, td) not in huff:
                            raise ValueError("missing Huffman table")
                        dsym, dlen = huff[(0, td)]
                        s = br.read_sym(dsym, dlen)
                        if s > 11:
                            raise ValueError("bad DC category")
                        preds[c["id"]] += _extend(br.receive(s), s)
                        zz[0] = preds[c["id"]] << al
                    else:  # DC refinement: one raw bit per block
                        zz[0] = int(zz[0]) | (br.receive(1) << al)
            else:
                c = in_scan[0]
                by, bx = divmod(unit, c["tbx"])
                zz = c["zz"][by, bx]
                ta = scan["sel"][c["id"]][1]
                if (1, ta) not in huff:
                    raise ValueError("missing Huffman table")
                asym, alen = huff[(1, ta)]
                if ah == 0:
                    eobrun = _ac_first_block(
                        br, zz, ss, se, al, eobrun, asym, alen
                    )
                else:
                    eobrun = _ac_refine_block(
                        br, zz, ss, se, al, eobrun, asym, alen
                    )
            unit += 1
    return end


def _ac_first_block(br, zz, ss, se, al, eobrun, asym, alen):
    """Spec G.2.2: first AC scan of a band for one block."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.read_sym(asym, alen)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run overflow")
        zz[k] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(br, zz, ss, se, al, eobrun, asym, alen):
    """Spec G.2.3 / jdphuff decode_mcu_AC_refine: refinement AC scan —
    correction bits for already-nonzero coefficients, run/size symbols
    position newly-nonzero ones."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.read_sym(asym, alen)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                val = 0
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if br.receive(1) else m1
            # advance past r zero-HISTORY coefficients, emitting
            # corrections for nonzero-history ones along the way
            while k <= se:
                z = int(zz[k])
                if z != 0:
                    if br.receive(1) and (z & p1) == 0:
                        zz[k] = z + (p1 if z >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = int(zz[k])
            if z != 0:
                if br.receive(1) and (z & p1) == 0:
                    zz[k] = z + (p1 if z >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _alloc_coeffs(frame):
    """Allocate per-component zigzag coefficient grids (MCU-padded) and
    record the interleaved + true (non-interleaved) block geometry."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0:
        raise ValueError("bad sampling factors")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    frame["mcus_x"], frame["mcus_y"] = mcus_x, mcus_y
    for c in comps:
        if c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4):
            raise ValueError("unsupported sampling factors")
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError("non-integral sampling ratio")
        c["zz"] = np.zeros(
            (mcus_y * c["v"], mcus_x * c["h"], 64), np.int64
        )
        # true block grid for non-interleaved scans (spec A.2.2)
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["tbx"], c["tby"] = -(-cw // 8), -(-ch // 8)


def _ycbcr_to_rgb(planes):
    """JFIF YCbCr -> uint8 RGB (shared by full and preview paths)."""
    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _reconstruct_preview(frame, qtabs):
    """1/8-scale reconstruction from DC coefficients only: with the
    orthonormal DCT basis, F00 = 8 * mean(levelshifted block), so each
    preview pixel is dequantized_DC / 8 + 128 — no IDCT."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    ph, pw = -(-h // 8), -(-w // 8)
    planes = []
    for c in comps:
        if "zz" not in c:
            raise ValueError("component never scanned")
        if c["tq"] not in qtabs:
            raise ValueError("missing quantization table")
        q0 = int(qtabs[c["tq"]][0])
        dc = c["zz"][:, :, 0].astype(np.float64) * q0
        plane = np.clip(np.rint(dc / 8.0 + 128.0), 0, 255)
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = plane.repeat(fy, axis=0).repeat(fx, axis=1)
        planes.append(plane[:ph, :pw])
    return _ycbcr_to_rgb(planes)


def _reconstruct(frame, qtabs):
    """Dequant + dezigzag + IDCT + upsample + color — shared by the
    baseline single-scan path and the progressive EOI finish."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        if "zz" not in c:
            raise ValueError("component never scanned")
        if c["tq"] not in qtabs:
            raise ValueError("missing quantization table")
        q = qtabs[c["tq"]]
        zz = c["zz"].reshape(-1, 64) * q[ZIGZAG]
        raster = np.zeros_like(zz)
        raster[:, ZIGZAG] = zz
        blocks = raster.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("kn,bkl,lm->bnm", _D, blocks, _D)
        by, bx = c["zz"].shape[0], c["zz"].shape[1]
        plane = (
            pix.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        plane = np.clip(np.rint(plane + 128.0), 0, 255)
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = plane.repeat(fy, axis=0).repeat(fx, axis=1)
        planes.append(plane[:h, :w])

    return _ycbcr_to_rgb(planes)
