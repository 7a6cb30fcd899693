"""MJPEG/AVI container: RIFF grammar roundtrip, frame sampling, header
metadata, corruption handling, and the Spark decode_video pipeline."""

import struct

import numpy as np
import pytest

from whoosh_reloaded_spark.jpeg import jpeg_decode, jpeg_encode
from whoosh_reloaded_spark.video import (
    avi_encode_mjpeg,
    avi_frames,
    avi_info,
    avi_sample_frames,
)


def _frames(n, w=16, h=12, quality=100):
    out = []
    for f in range(n):
        img = np.full((h, w), (f * 37) % 256, np.uint8)
        out.append(jpeg_encode(img, quality=quality))
    return out


def test_container_roundtrip_frames_bytes_exact():
    """The container walk returns the exact per-frame payloads that
    went in — byte-identical, order preserved, odd sizes padded per
    RIFF without corrupting the payload."""
    frames = _frames(5)
    data = avi_encode_mjpeg(frames, 16, 12, fps=10)
    got = list(avi_frames(data))
    assert len(got) == 5
    for a, b in zip(got, frames):
        assert a == b


def test_header_metadata():
    frames = _frames(7, w=24, h=16)
    info = avi_info(avi_encode_mjpeg(frames, 24, 16, fps=20))
    assert info["width"] == 24 and info["height"] == 16
    assert info["n_frames"] == 7
    assert info["fps"] == 20.0
    assert info["handler"] == "MJPG"


def test_every_nth_sampling():
    frames = _frames(10)
    data = avi_encode_mjpeg(frames, 16, 12)
    sampled = avi_sample_frames(data, every_nth=3)
    assert [i for i, _ in sampled] == [0, 3, 6, 9]
    assert all(f == frames[i] for i, f in sampled)
    capped = avi_sample_frames(data, every_nth=1, max_frames=4)
    assert [i for i, _ in capped] == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        avi_sample_frames(data, every_nth=0)


def test_sampled_frames_decode():
    """End of the chain: sampled payloads decode through the JPEG codec
    to the original uniform shades (q100 uniform = bit-exact)."""
    frames = _frames(6)
    data = avi_encode_mjpeg(frames, 16, 12)
    for i, payload in avi_sample_frames(data, every_nth=2):
        arr = jpeg_decode(payload)
        assert arr.shape == (12, 16)
        assert int(arr[0, 0]) == (i * 37) % 256
        assert (arr == arr[0, 0]).all()


def test_foreign_chunks_skipped():
    """Audio chunks ('01wb') and JUNK inside movi are skipped; only
    video '##dc'/'##db' frames come back."""
    frames = _frames(3)
    data = bytearray(avi_encode_mjpeg(frames, 16, 12))
    # splice an audio chunk + junk at the head of the movi payload list
    movi_at = bytes(data).find(b"movi")
    insert = movi_at + 4
    extra = b"01wb" + struct.pack("<I", 6) + b"abcdef" \
        + b"JUNK" + struct.pack("<I", 3) + b"xyz\x00"
    data[insert:insert] = extra
    # fix the two enclosing sizes (LIST movi, RIFF)
    (lsz,) = struct.unpack("<I", data[movi_at - 4:movi_at])
    data[movi_at - 4:movi_at] = struct.pack("<I", lsz + len(extra))
    (rsz,) = struct.unpack("<I", data[4:8])
    data[4:8] = struct.pack("<I", rsz + len(extra))
    got = list(avi_frames(bytes(data)))
    assert got == frames


def test_corruption_raises():
    frames = _frames(2)
    data = avi_encode_mjpeg(frames, 16, 12)
    with pytest.raises(ValueError, match="RIFF"):
        avi_info(b"nope" + data)
    with pytest.raises(ValueError, match="RIFF"):
        avi_frames(b"RIFFxxxxWAVE")  # WAV is not an AVI
    with pytest.raises(ValueError, match="truncated|movi"):
        list(avi_frames(data[:40] + data[40:60]))
    with pytest.raises(ValueError):
        avi_encode_mjpeg([], 16, 12)


# -- Spark pipeline ------------------------------------------------------------


def test_decode_video_pipeline(spark):
    """synthetic_video -> decode_video: one row per sampled frame with
    the closed-form q100 pixel sums; corrupt containers become ok=false
    rows; media_metadata sniffs the container as 'avi'."""
    from whoosh_reloaded_spark.multimodal import (
        decode_video,
        media_metadata,
        synthetic_video,
    )

    ids = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    vids = synthetic_video(ids)
    meta = {r["media_id"]: r for r in media_metadata(vids).collect()}
    assert all(m["kind"] == "avi" for m in meta.values())

    rows = decode_video(vids, every_nth=2).collect()
    by_media = {}
    for r in rows:
        assert r["ok"] and r["err"] is None
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(range(6))
    for d, rs in by_media.items():
        assert sorted(r["frame_no"] for r in rs) == [0, 2, 4, 6]
        for r in rs:
            assert (r["width"], r["height"]) == (16, 16)
            assert r["n_frames"] == 8
            assert r["fps"] == float(10 + d % 5)
            assert r["pixel_sum"] == 256 * ((d * 31 + r["frame_no"] * 16) % 256)
            assert len(r["ahash"]) == 16

    bad = spark.createDataFrame(
        [(99, b"RIFF\x08\x00\x00\x00AVI garbage")],
        "media_id long, payload binary",
    )
    br = decode_video(bad).collect()[0]
    assert br["ok"] is False and br["err"] is not None


def test_decode_video_audio_only_avi_keeps_row(spark):
    """A valid AVI whose movi list has no video frames must still emit
    one ok=True row (one-row-per-container accounting), not vanish."""
    import struct as _s

    from whoosh_reloaded_spark.multimodal import decode_video

    def chunk(tag, body):
        pad = b"\x00" if len(body) % 2 else b""
        return tag + _s.pack("<I", len(body)) + body + pad

    frames = _frames(1)
    base = bytearray(avi_encode_mjpeg(frames, 16, 12, fps=10))
    # rebuild movi with ONLY an audio chunk
    movi_at = bytes(base).find(b"movi")
    (old_sz,) = _s.unpack("<I", base[movi_at - 4:movi_at])
    audio = chunk(b"01wb", b"\x01\x02\x03\x04")
    new_movi = b"movi" + audio
    data = (
        bytes(base[:movi_at - 4])
        + _s.pack("<I", len(new_movi))
        + new_movi
    )
    data = data[:4] + _s.pack("<I", len(data) - 8) + data[8:]
    df = spark.createDataFrame(
        [(7, data)], "media_id long, payload binary"
    )
    rows = decode_video(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["ok"] is True and r["frame_no"] is None
    assert r["n_frames"] == 1 and r["fps"] == 10.0
