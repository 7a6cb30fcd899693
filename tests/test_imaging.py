"""Real PNG codec: roundtrip exactness for every filter type and color
mode, spec-naive unfilter cross-check, corruption handling, perceptual
hash, and the Spark decode_images / synthetic_media pipeline."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from whoosh_reloaded_spark.imaging import (
    average_hash,
    block_means,
    luma,
    png_decode,
    png_encode,
    thumbnail_png,
)

RNG = np.random.default_rng(0xC0FFEE)


def _rand(h, w, ch):
    a = RNG.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    return a[:, :, 0] if ch == 1 else a


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "auto"])
def test_roundtrip_every_filter_and_mode(ch, ft):
    arr = _rand(13, 17, ch)
    out = png_decode(png_encode(arr, filter_type=ft))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, arr)


def _naive_unfilter(data):
    """Scalar PNG unfilter straight from the spec (9.2), independent of
    the vectorized implementation under test."""
    sig = data[:8]
    assert sig == b"\x89PNG\r\n\x1a\n"
    pos, ihdr, idat = 8, None, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    w, h, _, ct, _, _, _ = struct.unpack(">IIBBBBB", ihdr)
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    raw = zlib.decompress(idat)
    stride = w * ch
    recon = []
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        line = list(raw[off + 1:off + 1 + stride])
        rec = [0] * stride
        for x in range(stride):
            a = rec[x - ch] if x >= ch else 0
            b = recon[-1][x] if recon else 0
            c = (recon[-1][x - ch] if x >= ch else 0) if recon else 0
            if ft == 0:
                v = line[x]
            elif ft == 1:
                v = line[x] + a
            elif ft == 2:
                v = line[x] + b
            elif ft == 3:
                v = line[x] + (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = line[x] + pr
            rec[x] = v % 256
        recon.append(rec)
    out = np.array(recon, dtype=np.uint8).reshape(h, w, ch)
    return out[:, :, 0] if ch == 1 else out


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_decoder_matches_spec_naive_unfilter(ft):
    """Our vectorized unfilter == a from-the-spec scalar unfilter on the
    same bytes (catches encoder/decoder sharing a symmetric bug)."""
    arr = _rand(11, 9, 3)
    data = png_encode(arr, filter_type=ft)
    np.testing.assert_array_equal(png_decode(data), _naive_unfilter(data))
    np.testing.assert_array_equal(_naive_unfilter(data), arr)


def test_corruption_raises():
    arr = _rand(8, 8, 3)
    data = bytearray(png_encode(arr))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"nope" + bytes(data))
    flipped = bytearray(data)
    flipped[40] ^= 0xFF  # inside IHDR/IDAT body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC|truncated|IDAT"):
        png_decode(bytes(flipped))
    with pytest.raises(ValueError):
        png_decode(bytes(data[:30]))


def _handmade_png(w, h, depth, ct, interlace, raw, extra=b""):
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + extra
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def test_spec_invalid_variants_rejected():
    """Depth/color combinations the PNG spec forbids (11.2.2) raise."""
    # 16-bit palette, 3-bit depth, 4-bit RGB, interlace method 2
    for w, h, depth, ct, il in [
        (4, 4, 16, 3, 0),
        (4, 4, 3, 0, 0),
        (4, 4, 4, 2, 0),
        (4, 4, 8, 2, 2),
    ]:
        with pytest.raises(ValueError, match="depth|interlace"):
            png_decode(_handmade_png(w, h, depth, ct, il, b"\0" * 100))
    # palette image with no PLTE chunk
    with pytest.raises(ValueError, match="PLTE"):
        png_decode(_handmade_png(2, 1, 8, 3, 0, b"\x00\x00\x01"))
    # palette index beyond the palette
    plte = struct.pack(">I", 3) + b"PLTE" + b"\x10\x20\x30"
    plte += struct.pack(">I", zlib.crc32(b"PLTE" + b"\x10\x20\x30") & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="index"):
        png_decode(_handmade_png(2, 1, 8, 3, 0, b"\x00\x00\x05", plte))


# -- extended variants: palette / low-bit grey / 16-bit / Adam7 -----------------


def test_palette_roundtrip_all_depths():
    from whoosh_reloaded_spark.imaging import png_encode_palette

    for depth in (1, 2, 4, 8):
        n = 1 << depth
        pal = RNG.integers(0, 256, size=(n, 3), dtype=np.uint8)
        idx = RNG.integers(0, n, size=(9, 13), dtype=np.uint8)
        out = png_decode(png_encode_palette(idx, pal, depth=depth))
        np.testing.assert_array_equal(out, pal[idx])


def test_palette_trns_alpha():
    from whoosh_reloaded_spark.imaging import png_encode_palette

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    trns = np.array([0, 128], np.uint8)  # entry 2 defaults opaque
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    out = png_decode(png_encode_palette(idx, pal, trns=trns, depth=2))
    assert out.shape == (2, 3, 4)
    np.testing.assert_array_equal(out[:, :, :3], pal[idx])
    alpha = np.array([0, 128, 255], np.uint8)
    np.testing.assert_array_equal(out[:, :, 3], alpha[idx])


def test_lowbit_grey_scaling():
    """1/2/4-bit greyscale scales exactly to 0..255 (spec 12.5)."""
    from whoosh_reloaded_spark.imaging import png_encode_grey

    for depth, factor in [(1, 255), (2, 85), (4, 17)]:
        maxv = (1 << depth) - 1
        vals = RNG.integers(0, maxv + 1, size=(7, 11), dtype=np.uint8)
        out = png_decode(png_encode_grey(vals, depth))
        assert out.dtype == np.uint8 and out.shape == (7, 11)
        np.testing.assert_array_equal(out, vals.astype(np.int64) * factor)


def test_16bit_roundtrip_lossless():
    for ch in (1, 2, 3, 4):
        a = RNG.integers(0, 65536, size=(6, 5, ch), dtype=np.uint16)
        arr = a[:, :, 0] if ch == 1 else a
        out = png_decode(png_encode(arr))
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, arr)


def test_adam7_handmade_fixture():
    """A hand-laid-out 3x3 interlaced greyscale PNG (pass scanlines
    written in spec order with filter 0) decodes to the expected grid —
    independent of the encoder's pass logic."""
    # pixel value = 10*y + x; Adam7 passes for 3x3:
    #   p1 -> (0,0); p4 -> (2,0); p5 -> (0,2),(2,2);
    #   p6 -> (1,0),(1,2); p7 -> (0,1),(1,1),(2,1)
    raw = bytes(
        [0, 0]                # p1: (0,0)=0
        + [0, 2]              # p4: (2,0)=2
        + [0, 20, 22]         # p5: (0,2),(2,2)
        + [0, 1] + [0, 21]    # p6: two 1-px scanlines y=0,2 -> (1,0),(1,2)
        + [0, 10, 11, 12]     # p7: full row y=1
    )
    out = png_decode(_handmade_png(3, 3, 8, 0, 1, raw))
    expect = np.array([[0, 1, 2], [10, 11, 12], [20, 21, 22]], np.uint8)
    np.testing.assert_array_equal(out, expect)


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 19),
    w=st.integers(1, 19),
    ch=st.sampled_from([1, 2, 3, 4]),
    depth=st.sampled_from([8, 16]),
    ft=st.sampled_from([0, 1, 2, 3, 4, "auto"]),
    seed=st.integers(0, 2**31),
)
def test_adam7_roundtrip_fuzz(h, w, ch, depth, ft, seed):
    """Interlaced encode -> decode is the identity, and equals the
    non-interlaced decode of the same pixels, at every size (including
    sizes with empty passes), channel count, and depth."""
    rng = np.random.default_rng(seed)
    a = rng.integers(
        0, 1 << depth, size=(h, w, ch),
        dtype=np.uint16 if depth == 16 else np.uint8,
    )
    arr = a[:, :, 0] if ch == 1 else a
    out = png_decode(png_encode(arr, filter_type=ft, interlace=True))
    np.testing.assert_array_equal(out, arr)
    np.testing.assert_array_equal(
        out, png_decode(png_encode(arr, filter_type=ft))
    )


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    depth=st.sampled_from([1, 2, 4, 8]),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_palette_fuzz(h, w, depth, interlace, seed):
    from whoosh_reloaded_spark.imaging import png_encode_palette

    rng = np.random.default_rng(seed)
    n = rng.integers(1, (1 << depth) + 1)
    pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
    data = png_encode_palette(idx, pal, depth=depth, interlace=interlace)
    np.testing.assert_array_equal(png_decode(data), pal[idx])


def test_average_hash_known_pattern():
    """Left half dark / right half bright -> every row 00001111 ->
    '0f' * 8; all-constant image -> zero hash (no block above mean)."""
    arr = np.zeros((16, 16, 3), dtype=np.uint8)
    arr[:, 8:, :] = 255
    assert average_hash(arr) == "0f" * 8
    assert average_hash(np.full((8, 8), 7, dtype=np.uint8)) == "00" * 8


def test_average_hash_near_duplicate_property():
    """A small perturbation moves few aHash bits; an unrelated image
    moves many."""
    base = _rand(32, 32, 3)
    tweaked = base.copy()
    tweaked[:2, :2, :] ^= 4  # tiny local change
    other = _rand(32, 32, 3)

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    assert ham(average_hash(base), average_hash(tweaked)) <= 4
    assert ham(average_hash(base), average_hash(other)) >= 10


def test_luma_and_blocks_integer_semantics():
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    arr[:, :, 0] = 255  # pure red
    assert int(luma(arr)[0, 0]) == (299 * 255) // 1000
    bm = block_means(np.arange(64, dtype=np.uint8).reshape(8, 8), 8)
    np.testing.assert_array_equal(
        bm, np.arange(64, dtype=np.int64).reshape(8, 8)
    )


def test_resize_area():
    from whoosh_reloaded_spark.imaging import resize_area

    # downscale agrees with block_means on the square case
    g = _rand(32, 32, 1)
    np.testing.assert_array_equal(
        resize_area(g, 8, 8).astype(np.int64), block_means(g, 8)
    )
    # channels preserved, non-square targets, exact uniform
    rgb = np.full((20, 30, 3), 99, np.uint8)
    out = resize_area(rgb, 7, 11)
    assert out.shape == (7, 11, 3) and (out == 99).all()
    # upscaling replicates source pixels (nearest box)
    small = np.array([[0, 255]], np.uint8)
    up = resize_area(small, 2, 4)
    assert up.shape == (2, 4)
    np.testing.assert_array_equal(up[0], [0, 0, 255, 255])
    # 2x2 downscale = exact integer box means
    a = np.array([[0, 10], [20, 30]], np.uint8)
    assert int(resize_area(a, 1, 1)[0, 0]) == 15


def test_thumbnail_roundtrip():
    arr = _rand(24, 40, 3)
    thumb = png_decode(thumbnail_png(arr, 8))
    np.testing.assert_array_equal(
        thumb, block_means(luma(arr), 8).astype(np.uint8)
    )


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 2, 3, 4]),
    ft=st.sampled_from([0, 1, 2, 3, 4, "auto"]),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_fuzz(h, w, ch, ft, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    arr = a[:, :, 0] if ch == 1 else a
    np.testing.assert_array_equal(
        png_decode(png_encode(arr, filter_type=ft)), arr
    )


# -- Spark pipeline ------------------------------------------------------------


def test_decode_images_on_synthetic_media(spark):
    """End-to-end: synthetic PNGs (all 5 scanline filters across the
    table) -> decode_images -> dims/checksums match the closed-form
    pixel formula; a corrupt payload yields ok=false, not a crash."""
    from whoosh_reloaded_spark.multimodal import decode_images, synthetic_media

    ids = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    media = synthetic_media(ids)
    rows = {r["media_id"]: r for r in decode_images(media).collect()}
    assert len(rows) == 20
    for d, r in rows.items():
        w = 8 * (1 + d % 2)
        h = 8 * (1 + (d // 2) % 2)
        assert r["ok"] and r["err"] is None
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        expect = sum(
            (d * 7 + x * 5 + y * 3 + c * 11) % 256
            for y in range(h) for x in range(w) for c in range(3)
        )
        assert r["pixel_sum"] == expect
        assert len(r["ahash"]) == 16
        thumb = png_decode(bytes(r["thumb_png"]))
        assert thumb.shape == (8, 8)

    bad = spark.createDataFrame(
        [(99, b"\x89PNG\r\n\x1a\n" + b"garbage")],
        "media_id long, payload binary",
    )
    br = decode_images(bad).collect()[0]
    assert br["ok"] is False and br["err"] is not None
    assert br["width"] is None


def test_extract_features_real_png_default(spark):
    """default_decode routes PNG payloads through the real decoder:
    reported dims are the actual image dims, not the fake formula."""
    from whoosh_reloaded_spark.imaging import png_encode as enc
    from whoosh_reloaded_spark.multimodal import extract_features

    arr = _rand(24, 40, 3)
    df = spark.createDataFrame(
        [(0, enc(arr)), (1, b"\xff\xd8\xff\xe0" + b"y" * 50)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in extract_features(df).collect()}
    assert (out[0]["width"], out[0]["height"]) == (40, 24)
    assert out[0]["n_frames"] == 1
    assert len(out[0]["feature"]) == 8
    # non-PNG still flows through the deterministic fallback
    assert out[1]["width"] >= 16
