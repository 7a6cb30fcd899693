"""Golden parity: Or(scale) coordination, Sequence, Ordered, paging,
matched-terms collector."""

import pytest

from tests.conftest import reference_importable
from whoosh_reloaded_spark.corpus import PAGES_SCHEMA, generate_rows
from whoosh_reloaded_spark.index import build_index
from whoosh_reloaded_spark.query import Or, Ordered, Searcher, Sequence, Term

pytestmark = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)


@pytest.fixture(scope="module")
def rows():
    return list(generate_rows(250))


@pytest.fixture(scope="module")
def whoosh_ix(rows, tmp_path_factory):
    from whoosh import fields, index

    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True), text=fields.TEXT
    )
    d = tmp_path_factory.mktemp("whoosh_pos")
    ix = index.create_in(str(d), schema)
    w = ix.writer()
    for url, ts, html, text, lang in rows:
        w.add_document(url=url, text=text)
    w.commit()
    return ix


@pytest.fixture(scope="module")
def ours(spark, rows):
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    return Searcher(build_index(df).persist())


def _theirs(whoosh_ix, wq, limit=10):
    from whoosh.query import Or as WOr

    WOr.matcher_type = WOr.DEFAULT_MATCHER
    with whoosh_ix.searcher() as s:
        try:
            res = s.search(wq, limit=limit)
            return [(h["url"], h.score) for h in res]
        except AssertionError:
            res = s.search(wq, limit=limit, optimize=False)
            return [(h["url"], h.score) for h in res]


def _assert_same(ours_l, theirs_l, name):
    assert [u for u, _ in ours_l] == [u for u, _ in theirs_l], name
    for (u1, s1), (u2, s2) in zip(ours_l, theirs_l):
        assert s1 == pytest.approx(s2, rel=1e-9), (name, u1)


def test_or_scale_coordination(whoosh_ix, ours):
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WT

    for scale in (0.5, 0.9):
        got = [
            (u, sc)
            for _, u, sc in ours.search_list(
                Or((Term("render"), Term("yellow"), Term("red")), scale=scale), 10
            )
        ]
        expected = _theirs(
            whoosh_ix,
            WOr([WT("text", "render"), WT("text", "yellow"), WT("text", "red")],
                scale=scale),
        )
        _assert_same(got, expected, f"scale={scale}")


def test_sequence_equals_phrase(whoosh_ix, ours):
    from whoosh.query import Sequence as WSeq
    from whoosh.query import Term as WT

    got = [
        (u, sc)
        for _, u, sc in ours.search_list(Sequence(("quick", "went")), 10)
    ]
    expected = _theirs(whoosh_ix, WSeq([WT("text", "quick"), WT("text", "went")]))
    _assert_same(got, expected, "sequence")


def test_ordered_semantics(ours, rows):
    """'yellow' before 'render' in position order — verify against a pure
    Python recomputation over the corpus."""
    from whoosh_reloaded_spark.analysis import standard_tokens

    got = {u for _, u, _ in ours.search_list(Ordered(("yellow", "render")), 1000)}
    expected = set()
    for url, ts, html, text, lang in rows:
        toks = standard_tokens(text)
        ys = [p for t, p in toks if t == "yellow"]
        rs = [p for t, p in toks if t == "render"]
        if ys and rs and min(ys) < max(rs):
            expected.add(url)
    assert got == expected


def test_search_page(ours):
    q = Or((Term("render"), Term("yellow"), Term("red")))
    all10 = ours.search_list(q, 10)
    page2 = ours.search_page(q, pagenum=2, pagelen=5).collect()
    assert [(r["docid"], r["uid"]) for r in page2] == [
        (d, u) for d, u, _ in all10[5:10]
    ]


def test_matched_terms(ours):
    q = Or((Term("render"), Term("yellow")))
    mt = {r["docid"]: r["terms"] for r in ours.matched_terms(q).collect()}
    hits = {d for d, _, _ in ours.search_list(q, 1000)}
    assert set(mt) == hits
    ps = ours.ix.postings
    from pyspark.sql import functions as F

    both = {
        r["docid"]
        for r in ps.where(F.col("term").isin(["render", "yellow"]))
        .groupBy("docid")
        .agg(F.count_distinct("term").alias("n"))
        .where(F.col("n") == 2)
        .collect()
    }
    for d in both:
        assert mt[d] == ["render", "yellow"]
