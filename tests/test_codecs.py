"""Position-codec registry: roundtrip identity per codec, phrase-query
parity across codecs, custom codec registration, and the lazy-decode
column-pruning property."""

import pytest
from pyspark.sql import functions as F

from whoosh_reloaded_spark.corpus import PAGES_SCHEMA, generate_rows
from whoosh_reloaded_spark.index import build_index, load_index, save_index
from whoosh_reloaded_spark.index.codecs import codec_names, get_codec, register_codec
from whoosh_reloaded_spark.query import Phrase, Searcher, Term

N = 120


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(list(generate_rows(N)), PAGES_SCHEMA)


def test_registry():
    assert set(codec_names()) >= {"raw", "jvmdelta", "varint"}
    with pytest.raises(ValueError):
        get_codec("nope")


def test_jvmdelta_roundtrip(spark):
    enc, dec = get_codec("jvmdelta")
    df = spark.createDataFrame(
        [([3, 7, 8, 20],), ([0],), ([],), (None,)], "positions array<int>"
    )
    out = df.select(
        F.col("positions"),
        dec(enc(F.col("positions"))).alias("rt"),
        enc(F.col("positions")).alias("deltas"),
    ).collect()
    assert out[0]["rt"] == [3, 7, 8, 20] and out[0]["deltas"] == [3, 4, 1, 12]
    assert out[1]["rt"] == [0]
    assert out[2]["rt"] == []
    assert out[3]["rt"] is None


@pytest.mark.parametrize("codec", ["raw", "jvmdelta", "varint"])
def test_phrase_parity_across_codecs(spark, corpus, codec, tmp_path):
    ix = build_index(corpus)
    path = str(tmp_path / f"ix_{codec}")
    save_index(ix, path, codec=codec)
    s = Searcher(load_index(spark, path))
    hits = [
        (r["uid"], round(r["score"], 9))
        for r in s.search(Phrase(["mary", "had", "little"]), limit=5).collect()
    ]
    assert len(hits) == 1 and hits[0][0].endswith("/little")
    # non-positional query works regardless of codec
    assert s.search(Term("render"), limit=5).count() == 5


def test_jvmdelta_positions_stored_as_deltas(spark, corpus, tmp_path):
    ix = build_index(corpus)
    path = str(tmp_path / "ix_delta_raw")
    save_index(ix, path, codec="jvmdelta")
    raw = spark.read.parquet(f"{path}/postings")
    row = (
        raw.where(F.size("positions") > 1)
        .select("positions")
        .first()["positions"]
    )
    # stored values are deltas: strictly positive after the first element
    # and the decoded absolute list is strictly increasing
    assert all(d > 0 for d in row[1:])


def test_custom_codec_registration(spark, corpus, tmp_path):
    # a reversing "codec" — registration surface check
    register_codec(
        "rev",
        lambda c: F.reverse(c),
        lambda c: F.reverse(c),
    )
    try:
        ix = build_index(corpus)
        path = str(tmp_path / "ix_rev")
        save_index(ix, path, codec="rev")
        s = Searcher(load_index(spark, path))
        hits = s.search(Phrase(["mary", "had", "little"]), limit=5).collect()
        assert len(hits) == 1
    finally:
        from whoosh_reloaded_spark.index import codecs as _c

        _c._CODECS.pop("rev", None)
