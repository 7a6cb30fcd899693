"""Nested parent/child block-join semantics (explicit parent_uid links)."""

import pytest
from pyspark.sql import functions as F

from whoosh_reloaded_spark.index import build_index
from whoosh_reloaded_spark.nested import nested_children, nested_parent
from whoosh_reloaded_spark.query import ColumnQuery, Searcher, Term


@pytest.fixture(scope="module")
def searcher(spark):
    # albums (parents) with tracks (children) — the reference's canonical
    # nested example (tests/test_nested.py uses the same shape)
    rows = [
        # uid, parent_uid, kind, text
        ("album/1", None, "album", "alpha album greatest hits"),
        ("album/1/t1", "album/1", "track", "love song number one"),
        ("album/1/t2", "album/1", "track", "sad ballad love"),
        ("album/2", None, "album", "bravo album second edition"),
        ("album/2/t1", "album/2", "track", "dance beat energy"),
        ("album/2/t2", "album/2", "track", "love dance remix"),
        ("album/3", None, "album", "charlie album instrumental"),
        ("album/3/t1", "album/3", "track", "quiet piano piece"),
    ]
    df = spark.createDataFrame(
        rows, "url string, parent_uid string, kind string, text string"
    )
    ix = build_index(df, stored_cols=["parent_uid", "kind"]).persist()
    return Searcher(ix)


def test_nested_parent_best(searcher):
    parents = ColumnQuery("kind = 'album'")
    hits = nested_parent(searcher, parents, Term("love"), score_fn="best")
    got = {
        r["uid"]: r["score"]
        for r in hits.join(
            searcher.ix.docmeta.select("docid", "uid"), "docid"
        ).collect()
    }
    # albums 1 and 2 have tracks with 'love'; album 3 doesn't
    assert set(got) == {"album/1", "album/2"}
    # best = max child score; album/1 has two 'love' tracks, score >= album/2's
    assert got["album/1"] > 0 and got["album/2"] > 0


def test_nested_parent_count(searcher):
    parents = ColumnQuery("kind = 'album'")
    hits = nested_parent(searcher, parents, Term("love"), score_fn="count")
    got = {
        r["uid"]: r["score"]
        for r in hits.join(
            searcher.ix.docmeta.select("docid", "uid"), "docid"
        ).collect()
    }
    assert got == {"album/1": 2.0, "album/2": 1.0}


def test_nested_children(searcher):
    kids = nested_children(searcher, Term("bravo"))
    got = {
        r["uid"]
        for r in kids.join(
            searcher.ix.docmeta.select("docid", "uid"), "docid"
        ).collect()
    }
    assert got == {"album/2/t1", "album/2/t2"}


def test_nested_query_classes(searcher):
    """The NestedParent / NestedChildren Query classes (reference
    query/nested.py surface) route through searcher.search like any other
    query and agree with the function API."""
    from whoosh_reloaded_spark.query import NestedChildren, NestedParent

    parents = ColumnQuery("kind = 'album'")
    via_fn = {
        r["docid"]: r["score"]
        for r in nested_parent(
            searcher, parents, Term("love"), score_fn="best"
        ).collect()
    }
    via_q = {
        r["docid"]: r["score"]
        for r in searcher.search(
            NestedParent(parents, Term("love")), limit=10
        ).select("docid", "score").collect()
    }
    assert via_q == via_fn

    kids_q = searcher.search(
        NestedChildren(ColumnQuery("kind = 'album'"), Term("bravo")), limit=10
    )
    got = {
        r["uid"]
        for r in kids_q.join(
            searcher.ix.docmeta.select("docid", "uid"), "docid"
        ).collect()
    }
    assert got == {"album/2/t1", "album/2/t2"}
