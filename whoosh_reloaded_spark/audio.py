"""WAV/PCM audio codec for multimodal columns — stdlib + numpy only.

The audio counterpart of :mod:`imaging`: a real RIFF/WAVE chunk parser
(hand-rolled, so tests can cross-validate it against the independent
stdlib ``wave`` encoder) plus the feature extraction a training
pipeline wants per clip — sample rate, channel count, duration, RMS
energy, peak amplitude, and an energy fingerprint over fixed windows
(the audio analogue of the image aHash).

Supports PCM integer formats (8/16/32-bit) — the overwhelmingly common
training-corpus shape; compressed containers route a C-backed decoder
through the same ``decode_fn`` hook in :mod:`multimodal`.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

__all__ = ["wav_decode", "wav_encode", "audio_features", "energy_hash"]


def wav_decode(data: bytes) -> Tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE byte string -> (sample_rate, samples).

    ``samples`` is int32, shape (n_frames, n_channels).  Raises
    ValueError on corruption or non-PCM formats.
    """
    if len(data) < 12 or bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = bytes(data[pos:pos + 4])
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = bytes(data[pos + 8:pos + 8 + size])
        if len(body) != size:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            (audio_fmt, n_ch, rate, _br, _ba, bits) = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:  # PCM only
                raise ValueError(f"unsupported audio format {audio_fmt}")
            if bits not in (8, 16, 32):
                raise ValueError(f"unsupported bit depth {bits}")
            fmt = (n_ch, rate, bits)
        elif tag == b"data":
            pcm = body
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    n_ch, rate, bits = fmt
    if bits == 8:  # unsigned, offset-128
        arr = np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        arr = np.frombuffer(
            pcm[: len(pcm) - (len(pcm) % 2)], dtype="<i2"
        ).astype(np.int32)
    else:
        arr = np.frombuffer(
            pcm[: len(pcm) - (len(pcm) % 4)], dtype="<i4"
        ).astype(np.int32)
    n_frames = len(arr) // n_ch
    return rate, arr[: n_frames * n_ch].reshape(n_frames, n_ch)


def wav_encode(samples: np.ndarray, sample_rate: int = 16000,
               bits: int = 16) -> bytes:
    """Encode (n_frames,) or (n_frames, n_channels) integer samples as a
    PCM WAV byte string (the inverse of :func:`wav_decode`; tests also
    cross-check against the stdlib ``wave`` writer)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_ch = arr.shape
    if bits == 8:
        raw = (arr.astype(np.int32) + 128).clip(0, 255).astype(np.uint8)
    elif bits == 16:
        raw = arr.astype("<i2")
    elif bits == 32:
        raw = arr.astype("<i4")
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    pcm = raw.tobytes()
    ba = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * ba, ba, bits
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def audio_features(data: bytes, n_windows: int = 16) -> dict:
    """Decode + featurize one clip: rate/channels/frames/duration plus
    integer-exact sum-of-squares (the decode invariant an SQL oracle can
    recompute), RMS, peak, and the windowed energy hash."""
    rate, samples = wav_decode(data)
    n_frames, n_ch = samples.shape
    mono = samples.sum(axis=1, dtype=np.int64) // n_ch
    sumsq = int((mono.astype(np.int64) ** 2).sum())
    rms = float(np.sqrt(sumsq / n_frames)) if n_frames else 0.0
    return {
        "sample_rate": rate,
        "channels": n_ch,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 // rate) if rate else 0,
        "sum_sq": sumsq,
        "rms": rms,
        "peak": int(np.abs(mono).max()) if n_frames else 0,
        "energy_hash": energy_hash(mono, n_windows),
    }


def energy_hash(mono: np.ndarray, n_windows: int = 16) -> str:
    """Audio fingerprint: mean |amplitude| over n_windows fixed windows,
    bit = window above the global mean, packed MSB-first as hex — the
    audio analogue of the image aHash (near-duplicate clips differ in
    few bits)."""
    n = len(mono)
    if n == 0:
        return "0" * (n_windows // 4)
    bounds = [(i * n) // n_windows for i in range(n_windows + 1)]
    e = np.array(
        [
            np.abs(mono[bounds[i]:bounds[i + 1]]).mean()
            if bounds[i + 1] > bounds[i]
            else 0.0
            for i in range(n_windows)
        ]
    )
    bits = e > e.mean()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return format(v, "0{}x".format(n_windows // 4))
