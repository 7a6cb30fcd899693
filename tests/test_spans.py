"""Golden span parity vs the reference matcher tree — mirrors the query
shapes of reference tests/test_spans.py over the same 360-doc permutation
corpus (SimpleAnalyzer, no stop removal)."""

from itertools import permutations

import pytest
from pyspark.sql import functions as F

from tests.conftest import reference_importable
from whoosh_reloaded_spark.analyzers import SimpleAnalyzer
from whoosh_reloaded_spark.index import build_index
from whoosh_reloaded_spark.query import (
    Or,
    Searcher,
    SpanBefore,
    SpanCondition,
    SpanContains,
    SpanFirst,
    SpanNear,
    SpanNear2,
    SpanNot,
    SpanOr,
    Term,
)
from whoosh_reloaded_spark.query.spans import SpanEvaluator

pytestmark = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)

DOMAIN = ("alfa", "bravo", "bravo", "charlie", "delta", "echo")


@pytest.fixture(scope="module")
def texts():
    return [" ".join(ls) for ls in permutations(DOMAIN, 4)]


@pytest.fixture(scope="module")
def whoosh_ix(texts, tmp_path_factory):
    from whoosh import analysis, fields, index

    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True),
        text=fields.TEXT(analyzer=analysis.SimpleAnalyzer(), stored=True),
    )
    d = tmp_path_factory.mktemp("whoosh_spans")
    ix = index.create_in(str(d), schema)
    w = ix.writer()
    for i, t in enumerate(texts):
        w.add_document(url=f"{i:05d}", text=t)
    w.commit()
    return ix


@pytest.fixture(scope="module")
def our_searcher(spark, texts):
    df = spark.createDataFrame(
        [(f"{i:05d}", t) for i, t in enumerate(texts)], "url string, text string"
    )
    ix = build_index(df, analyzer=SimpleAnalyzer()).persist()
    return Searcher(ix)


def ref_spans(whoosh_ix, wq):
    """docnum -> sorted set of (start, end) from the reference matcher."""
    out = {}
    with whoosh_ix.searcher() as s:
        m = wq.matcher(s)
        while m.is_active():
            out[m.id()] = sorted({(sp.start, sp.end) for sp in m.spans()})
            m.next()
    return out

def our_spans(our_searcher, q):
    rows = SpanEvaluator(our_searcher).frame(q).collect()
    return {
        r["docid"]: sorted({(sp["s"], sp["e"]) for sp in r["spans"]})
        for r in rows
    }


def _wt(w):
    from whoosh.query import Term as WT

    return WT("text", w)


def make_cases():
    from whoosh.query import Or as WOr
    from whoosh.query import spans as wsp

    cases = {}
    cases["first_default"] = (
        SpanFirst(Term("alfa")),
        wsp.SpanFirst(_wt("alfa")),
    )
    cases["first_limit1"] = (
        SpanFirst(Term("bravo"), limit=1),
        wsp.SpanFirst(_wt("bravo"), limit=1),
    )
    cases["near_ordered"] = (
        SpanNear(Term("alfa"), Term("bravo"), ordered=True),
        wsp.SpanNear(_wt("alfa"), _wt("bravo"), ordered=True),
    )
    cases["near_unordered"] = (
        SpanNear(Term("alfa"), Term("bravo"), ordered=False),
        wsp.SpanNear(_wt("alfa"), _wt("bravo"), ordered=False),
    )
    cases["near_same_term"] = (
        SpanNear(Term("bravo"), Term("bravo"), ordered=True),
        wsp.SpanNear(_wt("bravo"), _wt("bravo"), ordered=True),
    )
    cases["near_nested"] = (
        SpanNear(SpanNear(Term("alfa"), Term("charlie")), Term("echo")),
        wsp.SpanNear(
            wsp.SpanNear(_wt("alfa"), _wt("charlie")), _wt("echo")
        ),
    )
    cases["near_or_subquery"] = (
        SpanNear(Or([Term("alfa"), Term("charlie")]), Term("echo"),
                 ordered=True),
        wsp.SpanNear(
            WOr([_wt("alfa"), _wt("charlie")]), _wt("echo"), ordered=True
        ),
    )
    cases["near2_slop"] = (
        SpanNear2([Term("bravo"), Term("echo")], slop=3),
        wsp.SpanNear2([_wt("bravo"), _wt("echo")], slop=3),
    )
    cases["span_not"] = (
        SpanNot(SpanNear(Term("alfa"), Term("charlie"), slop=2), Term("bravo")),
        wsp.SpanNot(
            wsp.SpanNear(_wt("alfa"), _wt("charlie"), slop=2), _wt("bravo")
        ),
    )
    cases["span_or"] = (
        SpanOr([SpanNear(Term("alfa"), Term("charlie"), slop=2), Term("bravo")]),
        wsp.SpanOr(
            [wsp.SpanNear(_wt("alfa"), _wt("charlie"), slop=2), _wt("bravo")]
        ),
    )
    cases["span_contains"] = (
        SpanContains(SpanNear(Term("alfa"), Term("charlie"), slop=3),
                     Term("echo")),
        wsp.SpanContains(
            wsp.SpanNear(_wt("alfa"), _wt("charlie"), slop=3), _wt("echo")
        ),
    )
    cases["span_before"] = (
        SpanBefore(Term("alfa"), Term("charlie")),
        wsp.SpanBefore(_wt("alfa"), _wt("charlie")),
    )
    cases["span_condition"] = (
        SpanCondition(Term("alfa"), Term("charlie")),
        wsp.SpanCondition(_wt("alfa"), _wt("charlie")),
    )
    return cases


CASE_NAMES = [
    "first_default", "first_limit1", "near_ordered", "near_unordered",
    "near_same_term", "near_nested", "near_or_subquery", "near2_slop",
    "span_not", "span_or", "span_contains", "span_before", "span_condition",
]


@pytest.mark.parametrize("name", CASE_NAMES)
def test_span_parity(name, whoosh_ix, our_searcher):
    ours_q, theirs_q = make_cases()[name]
    got = our_spans(our_searcher, ours_q)
    want = ref_spans(whoosh_ix, theirs_q)
    assert set(got) == set(want), (
        f"{name}: doc set mismatch (+{sorted(set(got) - set(want))[:5]} "
        f"-{sorted(set(want) - set(got))[:5]})"
    )
    for d in want:
        assert got[d] == want[d], (name, d, got[d], want[d])


def test_spannear2_minicorpus(spark, tmp_path_factory):
    # reference tests/test_spans.py::test_spannear2 — ids 'bcd'
    rows = [
        ("a", "alfa echo"),
        ("b", "alfa bravo echo"),
        ("c", "alfa bravo charlie echo"),
        ("d", "alfa bravo charlie delta echo"),
        ("e", "alfa bravo charlie fox delta echo"),
        ("f", "charlie delta echo fox golf hotel"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    s = Searcher(build_index(df, analyzer=SimpleAnalyzer()))
    q = SpanNear2([Term("bravo"), Term("echo")], slop=3)
    hits = s.search(q, limit=None)
    ids = "".join(sorted(r["uid"] for r in hits.collect()))
    assert ids == "bcd"


def test_span_search_scores(whoosh_ix, our_searcher):
    """End-to-end search() over a span query: rank + score parity."""
    from whoosh.query import spans as wsp

    q_ours = SpanNear(Term("alfa"), Term("bravo"), ordered=True)
    q_theirs = wsp.SpanNear(_wt("alfa"), _wt("bravo"), ordered=True)
    with whoosh_ix.searcher() as s:
        try:
            res = s.search(q_theirs, limit=10)
        except Exception:
            res = s.search(q_theirs, limit=10, optimize=False)
        theirs = [(h["url"], h.score) for h in res]
    ours = [
        (u, sc) for _, u, sc in our_searcher.search_list(q_ours, 10)
    ]
    assert [u for u, _ in ours] == [u for u, _ in theirs]
    for (u1, s1), (u2, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9), u1
