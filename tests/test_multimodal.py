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
