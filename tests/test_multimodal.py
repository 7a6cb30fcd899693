"""Multimodal binary-column plumbing (decode stubbed, pipeline real)."""

from pyspark.sql import functions as F

from whoosh_reloaded_spark.multimodal import (
    extract_features,
    media_metadata,
    sample_frames,
)


def _media(spark):
    rows = [
        (0, b"\x89PNG\r\n" + b"x" * 100),
        (1, b"\xff\xd8\xff\xe0" + b"y" * 50),
        (2, b"RIFF....WAVE" + b"z" * 200),
        (3, b"garbage-bytes"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_metadata_sniffing(spark):
    meta = {r["media_id"]: r for r in media_metadata(_media(spark)).collect()}
    assert meta[0]["kind"] == "png"
    assert meta[1]["kind"] == "jpeg"
    assert meta[2]["kind"] == "wav"
    assert meta[3]["kind"] == "unknown"
    assert meta[0]["n_bytes"] == 106


def test_ahash_near_dup_pairs(spark):
    """decode -> aHash -> banded near-dup join: a tweaked copy pairs
    with its original, unrelated images don't, and (pigeonhole: with
    max_hamming < bands) the result matches a brute-force hamming scan
    exactly."""
    import numpy as np

    from whoosh_reloaded_spark.imaging import average_hash, png_encode
    from whoosh_reloaded_spark.multimodal import (
        ahash_near_dup_pairs,
        decode_images,
    )

    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    tweak = base.copy()
    tweak[:2, :2, :] ^= 4  # near-duplicate
    rows = [(0, png_encode(base)), (1, png_encode(tweak))]
    imgs = {0: base, 1: tweak}
    for i in range(2, 8):
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        imgs[i] = img
        rows.append((i, png_encode(img)))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    decoded = decode_images(df, with_thumbnail=False)
    pairs = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in ahash_near_dup_pairs(decoded, max_hamming=3).collect()
    }
    assert (0, 1) in pairs

    # brute-force ground truth over the same hashes
    hams = {}
    hashes = {i: average_hash(imgs[i]) for i in imgs}
    for a in imgs:
        for b in imgs:
            if a < b:
                h = bin(int(hashes[a], 16) ^ int(hashes[b], 16)).count("1")
                if h <= 3:
                    hams[(a, b)] = h
    assert pairs == hams


def test_extract_features_stub(spark):
    out = {r["media_id"]: r for r in extract_features(_media(spark)).collect()}
    assert len(out) == 5
    for r in out.values():
        assert r["width"] >= 16 and r["height"] >= 16
        assert len(r["feature"]) == 8
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r for r in extract_features(_media(spark)).collect()}
    assert out[0]["feature"] == again[0]["feature"]


def test_sample_frames(spark):
    df = spark.createDataFrame(
        [(0, 5), (1, 1), (2, 0)], "media_id long, n_frames int"
    )
    rows = sample_frames(df, every_nth=2).collect()
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(r["frame_no"])
    assert got[0] == [0, 2, 4]
    assert got[1] == [0]
    assert got[2] == [0]
