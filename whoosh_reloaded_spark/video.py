"""Pure-Python MJPEG/AVI video container for multimodal columns.

Motion-JPEG inside a RIFF/AVI container is the simplest real video
interchange format — every frame is a standalone baseline JPEG — which
makes it the honest zero-dependency target for the video leg of a
training-data pipeline: the container walk is exact (RIFF chunk
grammar), and frame decode reuses :mod:`whoosh_reloaded_spark.jpeg`.
Codec-compressed containers (H.264/VP9/AV1) still require a C library
through the multimodal ``decode_fn`` hook; this module keeps the
container semantics — frame indexing, every-nth sampling, per-frame
features — real and testable end-to-end without one.

Layout written by :func:`avi_encode_mjpeg` (and accepted, with any
extra chunks skipped, by the readers)::

    RIFF('AVI ')
      LIST('hdrl') avih(56) LIST('strl') strh(56,'vids','MJPG') strf(40)
      LIST('movi') '00dc' <jpeg> '00dc' <jpeg> ...
      idx1 (optional; readers do a sequential walk, never seek via it)

All sizes little-endian; chunks pad to even lengths per RIFF.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Tuple

__all__ = [
    "avi_encode_mjpeg",
    "avi_info",
    "avi_frames",
    "avi_sample_frames",
]


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def avi_encode_mjpeg(frames: List[bytes], width: int, height: int,
                     fps: int = 25) -> bytes:
    """Write an MJPEG AVI from per-frame baseline-JPEG bytes (e.g.
    :func:`whoosh_reloaded_spark.jpeg.jpeg_encode` output)."""
    if not frames:
        raise ValueError("no frames")
    if fps <= 0:
        raise ValueError("bad fps")
    maxbuf = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,      # dwMicroSecPerFrame
        maxbuf * fps,          # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0,                     # dwFlags (no idx1 -> AVIF_HASINDEX off)
        len(frames), 0, 1, maxbuf, width, height,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,                # dwScale / dwRate -> frames per second
        0, len(frames), maxbuf, 0, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, start: int, end: int):
    """Yield (tag, body_start, body_len) for RIFF chunks in a range."""
    i = start
    while i + 8 <= end:
        tag = bytes(data[i:i + 4])
        (ln,) = struct.unpack("<I", data[i + 4:i + 8])
        if i + 8 + ln > end:
            raise ValueError(f"truncated {tag!r} chunk")
        yield tag, i + 8, ln
        i += 8 + ln + (ln % 2)


def _movi_range(data: bytes) -> Tuple[int, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    (total,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + total)
    for tag, off, ln in _walk(data, 12, end):
        if tag == b"LIST" and data[off:off + 4] == b"movi":
            return off + 4, off + ln
    raise ValueError("no movi list")


def avi_info(data: bytes) -> dict:
    """Container metadata from the avih header: width, height,
    n_frames, fps, handler fourcc."""
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    (total,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + total)
    info = None
    handler = None
    for tag, off, ln in _walk(data, 12, end):
        if tag != b"LIST" or data[off:off + 4] != b"hdrl":
            continue
        for t2, o2, l2 in _walk(data, off + 4, off + ln):
            if t2 == b"avih" and l2 >= 40:
                us, _, _, _, nf = struct.unpack("<IIIII", data[o2:o2 + 20])
                w, h = struct.unpack("<II", data[o2 + 32:o2 + 40])
                info = {
                    "width": w, "height": h, "n_frames": nf,
                    "fps": round(1_000_000 / us, 3) if us else None,
                }
            elif t2 == b"LIST" and data[o2:o2 + 4] == b"strl":
                for t3, o3, l3 in _walk(data, o2 + 4, o2 + l2):
                    if t3 == b"strh" and l3 >= 8:
                        if data[o3:o3 + 4] == b"vids":
                            handler = data[o3 + 4:o3 + 8].decode(
                                "ascii", "replace"
                            )
        break
    if info is None:
        raise ValueError("no avih header")
    info["handler"] = handler
    return info


def avi_frames(data: bytes) -> Iterator[bytes]:
    """Yield raw per-frame payloads (JPEG bytes for MJPG) from the movi
    list, in stream order.  Non-video chunks (audio '##wb', rec lists,
    junk) are skipped.  Container validation happens eagerly, before
    the first frame is requested."""
    data = bytes(data)
    lo, hi = _movi_range(data)

    def _iter():
        for tag, off, ln in _walk(data, lo, hi):
            if tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                yield data[off:off + ln]

    return _iter()


def avi_sample_frames(data: bytes, every_nth: int = 1,
                      max_frames: int = 0) -> List[Tuple[int, bytes]]:
    """Every-nth frame sampling without decoding the skipped frames:
    returns [(frame_index, payload), ...].  ``max_frames`` caps the
    result (0 = no cap)."""
    if every_nth < 1:
        raise ValueError("every_nth must be >= 1")
    out = []
    for i, frame in enumerate(avi_frames(data)):
        if i % every_nth:
            continue
        out.append((i, frame))
        if max_frames and len(out) >= max_frames:
            break
    return out
