"""Results/Hit display surface: hit.highlights() workflow (mirrors the
reference tests/test_highlighting.py::test_workflow_easy) and the
extend/filter/upgrade/upgrade_and_extend set-combinators
(searching.py:1326-1395)."""

import pytest
from pyspark.sql import functions as F

from whoosh_reloaded_spark.highlight import UppercaseFormatter, WholeFragmenter
from whoosh_reloaded_spark.index import build_index
from whoosh_reloaded_spark.query import Or, Searcher, Term

TITLES = [
    "The man who wasn't there",
    "The dog who barked at midnight",
    "The invisible man",
    "The girl with the dragon tattoo",
    "The woman who disappeared",
]


@pytest.fixture(scope="module")
def searcher(spark):
    df = spark.createDataFrame(
        [(f"doc{i}", t) for i, t in enumerate(TITLES)],
        "url string, text string",
    ).withColumn("title", F.col("text"))
    return Searcher(build_index(df, stored_cols=["title"]))


def test_workflow_easy(searcher):
    """The reference's documented highlight workflow, same outputs."""
    r = searcher.search_results(Term("man"), limit=10,
                                stored_cols=["title"])
    assert len(r) == 2
    r.fragmenter = WholeFragmenter()
    r.formatter = UppercaseFormatter()
    outputs = [hit.highlights("title") for hit in r]
    assert outputs == ["The invisible MAN", "The MAN who wasn't there"]


def test_results_combinators(searcher):
    man = searcher.search_results(Term("man"), limit=10)
    who = searcher.search_results(Term("who"), limit=10)
    assert man.docs() < {0, 1, 2, 3, 4} and len(who) == 3

    # upgrade: shared docs move to the front, relative order kept
    all_r = searcher.search_results(
        Or([Term("man"), Term("who"), Term("girl")]), limit=10
    )
    order_before = [h.docnum for h in all_r]
    all_r.upgrade(who)
    upgraded = [h.docnum for h in all_r]
    assert set(upgraded) == set(order_before)
    assert [d for d in upgraded[: len(who.docs() & set(order_before))]] == [
        d for d in order_before if d in who.docs()
    ]
    assert [h.rank for h in all_r] == list(range(len(all_r)))

    # filter: keep only docs also in `man`
    all_r.filter(man)
    assert all_r.docs() == man.docs() & set(order_before)

    # extend: append missing docs from `who`
    n = len(all_r)
    all_r.extend(who)
    assert all_r.docs() == (man.docs() & set(order_before)) | who.docs()
    assert [h.docnum for h in all_r][:n] == [
        d for d in (d for d in upgraded if d in man.docs())
    ][:n]

    # upgrade_and_extend on fresh results
    a = searcher.search_results(Term("man"), limit=10)
    b = searcher.search_results(Term("woman"), limit=10)
    a.upgrade_and_extend(b)
    assert a.docs() == man.docs() | b.docs()
    assert not a.is_empty() and a.scored_length() == len(a)
    assert list(a.items())[0][0] == a.docnum(0)


def test_results_key_terms_and_more_like(searcher):
    r = searcher.search_results(Term("man"), limit=10)
    kt = r.key_terms(docs=2, numterms=3)
    assert kt and all(isinstance(t, str) for t, _ in kt)
    assert "man" in [t for t, _ in kt]
    ml = r[0].more_like_this(top=5).collect()
    assert all(row["docid"] != r[0].docnum for row in ml)


def test_matched_terms(searcher):
    """terms=True records per-hit matched terms; the reference shape:
    query terms minus matched = terms that hit no top-N doc."""
    r = searcher.search_results(
        Or([Term("man"), Term("dragon"), Term("zzzmissing")]), limit=10,
        terms=True,
    )
    assert r.has_matched_terms()
    assert r.matched_terms() == {"man", "dragon"}
    assert r.terms - r.matched_terms() == {"zzzmissing"}
    for h in r:
        assert h.matched_terms() <= {"man", "dragon"}
        assert h.matched_terms()

    r2 = searcher.search_results(Term("man"), limit=10)
    assert not r2.has_matched_terms()
    import pytest as _pt

    with _pt.raises(ValueError):
        r2.matched_terms()


def test_filter_and_mask(searcher):
    """search(filter=..., mask=...): Query / Results / docnum-set forms
    restrict or exclude BEFORE the top-k cut (searching.py:799-802)."""
    who = searcher.search_results(Term("who"), limit=10)
    # Query filter: man AND who
    r = searcher.search_results(Term("man"), limit=10, filter=Term("who"))
    assert r.docs() == {0}
    # Results filter
    r2 = searcher.search_results(Term("man"), limit=10, filter=who)
    assert r2.docs() == {0}
    # docnum-set mask
    r3 = searcher.search_results(Term("man"), limit=10, mask={0})
    assert r3.docs() == {2}
    # mask with a Query: who-docs minus man-docs
    r4 = searcher.search_results(Term("who"), limit=10, mask=Term("man"))
    assert r4.docs() == {1, 4}
    # scores identical to the unfiltered query for surviving docs
    base = {h.docnum: h.score for h in searcher.search_results(
        Term("man"), limit=10)}
    assert r.score(0) == base[0]


def test_groupedby(spark):
    """groupedby facet workflow (Results.groups): category -> docnums in
    (score desc, docid asc) order over ALL matches."""
    df = spark.createDataFrame(
        [
            ("a", "x", "alpha beta"),
            ("b", "x", "alpha alpha"),
            ("c", "y", "alpha gamma"),
            ("d", "y", "delta"),
        ],
        "url string, tag string, text string",
    )
    s = Searcher(build_index(df, stored_cols=["tag"]))
    r = s.search_results(Term("alpha"), limit=2, groupedby="tag")
    assert r.facet_names() == ["tag"]
    g = r.groups()
    assert set(g) == {"x", "y"}
    assert set(g["x"]) == {0, 1} and g["y"] == [2]
    # per-group order is score desc: doc1 (tf=2, shorter) outranks doc0
    assert g["x"][0] == 1
    with pytest.raises(ValueError):
        s.search_results(Term("alpha"), limit=2).groups()
    with pytest.raises(ValueError):
        s.search_results(Term("alpha"), groupedby="nope")

    # FacetMap variants: Count and Best
    rc = s.search_results(Term("alpha"), limit=2, groupedby="tag",
                          maptype="count")
    assert rc.groups() == {"x": 2, "y": 1}
    rb = s.search_results(Term("alpha"), limit=2, groupedby="tag",
                          maptype="best")
    assert rb.groups() == {"x": 1, "y": 2}


def test_sortedby(spark):
    """sortedby orders hits by a docmeta facet key instead of score
    (SortingCollector), reverse flipping direction; stored fields intact."""
    df = spark.createDataFrame(
        [
            ("a", 3, "alpha common"),
            ("b", 1, "alpha alpha common"),
            ("c", 2, "alpha words common"),
        ],
        "url string, prio long, text string",
    )
    s = Searcher(build_index(df, stored_cols=["prio"]))
    r = s.search_results(Term("alpha"), limit=10, sortedby="prio",
                         stored_cols=["prio"])
    assert [h["prio"] for h in r] == [1, 2, 3]
    assert [h.docnum for h in r] == [1, 2, 0]
    r2 = s.search_results(Term("alpha"), limit=2, sortedby="prio",
                          reverse=True)
    assert [h.docnum for h in r2] == [0, 2]
    # scores still the BM25 scores of the match
    assert all(h.score > 0 for h in r)


def test_collapse(spark):
    """collapse keeps <= collapse_limit best docs per key before top-k
    (CollapseCollector semantics)."""
    df = spark.createDataFrame(
        [
            ("a", "g1", "alpha"),
            ("b", "g1", "alpha alpha"),
            ("c", "g2", "alpha"),
            ("d", "g2", "alpha alpha alpha"),
        ],
        "url string, grp string, text string",
    )
    s = Searcher(build_index(df, stored_cols=["grp"]))
    r = s.search_results(Term("alpha"), limit=10, collapse="grp",
                         stored_cols=["grp"])
    assert len(r) == 2
    assert sorted(h["grp"] for h in r) == ["g1", "g2"]
    # the best doc of each group survives (higher tf in shorter doc wins)
    assert set(r.docs()) == {1, 3}
    r2 = s.search_results(Term("alpha"), limit=10, collapse="grp",
                          collapse_limit=2)
    assert len(r2) == 4
    # collapse composes with sortedby
    r3 = s.search_results(Term("alpha"), limit=10, collapse="grp",
                          sortedby="grp", reverse=True,
                          stored_cols=["grp"])
    assert [h["grp"] for h in r3] == ["g2", "g1"]


def test_extend_does_not_corrupt_donor(searcher):
    """extend/upgrade_and_extend must copy donor hits: the donor's rank,
    _results binding, and matched-terms state stay intact."""
    a = searcher.search_results(Term("man"), limit=10, terms=True)
    b = searcher.search_results(Term("who"), limit=10)
    a_ranks = [h.rank for h in a]
    b.extend(a)
    assert [h.rank for h in a] == a_ranks
    assert a[0]._results is a and a[0].matched_terms() == {"man"}
    # the copies live in b with b's numbering
    assert [h.rank for h in b] == list(range(len(b)))

    c = searcher.search_results(Term("woman"), limit=10)
    c.upgrade_and_extend(a)
    assert a[0]._results is a and [h.rank for h in a] == a_ranks


def test_results_copy(searcher):
    a = searcher.search_results(Term("man"), limit=10, terms=True)
    c = a.copy()
    c.filter(searcher.search_results(Term("who"), limit=10))
    assert len(c) == 1 and len(a) == 2  # original untouched
    assert c.matched_terms() == a.matched_terms()
    assert c[0]._results is c and a[0]._results is a


def test_terms_true_empty_results(searcher):
    """terms=True with zero hits still marks terms as recorded."""
    r = searcher.search_results(Term("zzzmissing"), limit=10, terms=True)
    assert len(r) == 0
    assert r.has_matched_terms() and r.matched_terms() == set()


def test_matched_terms_span_and_prefix(searcher):
    """matched-term recording traverses span attrs and small multiterm
    expansions."""
    from whoosh_reloaded_spark.query import Prefix, SpanOr, Term as T

    r = searcher.search_results(
        SpanOr([T("man"), T("dragon")]), limit=10, terms=True
    )
    assert r.matched_terms() == {"man", "dragon"}
    r2 = searcher.search_results(Prefix("ma"), limit=10, terms=True)
    assert "man" in r2.matched_terms()


def test_groupedby_respects_filter(spark):
    """groups() must be computed from the filtered/masked result set."""
    df = spark.createDataFrame(
        [
            ("a", "x", "alpha beta"),
            ("b", "x", "alpha"),
            ("c", "y", "alpha beta"),
        ],
        "url string, tag string, text string",
    )
    s = Searcher(build_index(df, stored_cols=["tag"]))
    r = s.search_results(
        Term("alpha"), limit=10, groupedby="tag", filter=Term("beta")
    )
    assert r.groups() == {"x": [0], "y": [2]}
    # collapse feeds the facet source too
    r2 = s.search_results(
        Term("alpha"), limit=10, groupedby="tag", collapse="tag",
        maptype="count",
    )
    assert r2.groups() == {"x": 1, "y": 1}


def test_combine_reference_shapes(spark):
    """Mirrors the reference tests/test_results.py::test_combine corpus
    and literal expected orderings — combinator semantics AND BM25 rank
    order must both match for these to pass."""
    docs = [
        ("1", "alfa bravo charlie all"),
        ("2", "bravo charlie echo all"),
        ("3", "charlie echo foxtrot all"),
        ("4", "echo foxtrot india all"),
        ("5", "foxtrot india juliet all"),
        ("6", "india juliet alfa all"),
        ("7", "juliet alfa bravo all"),
        ("8", "charlie charlie charlie all"),
    ]
    df = spark.createDataFrame(docs, "url string, text string")
    s = Searcher(build_index(df))

    def rfor(t):
        return s.search_results(Term(t), limit=None)

    def idsof(r):
        return "".join(h["uid"] for h in r)

    def check(r1, method, r2, ids):
        getattr(r1, method)(r2)
        assert idsof(r1) == ids, (method, idsof(r1))

    # estimated_length counts ALL matches even under a tighter limit
    r_lim = s.search_results(Term("all"), limit=3)
    assert len(r_lim) == 3 and r_lim.scored_length() == 3
    assert r_lim.estimated_length() == 8

    assert idsof(rfor("foxtrot")) == "345"
    check(rfor("foxtrot"), "extend", rfor("charlie"), "345812")
    check(rfor("foxtrot"), "filter", rfor("juliet"), "5")
    check(rfor("charlie"), "filter", rfor("foxtrot"), "3")
    check(rfor("all"), "filter", rfor("foxtrot"), "345")
    check(rfor("all"), "upgrade", rfor("india"), "45612378")
    check(rfor("charlie"), "upgrade_and_extend", rfor("echo"), "23814")


def test_pages_reference_shapes(spark):
    """Mirrors tests/test_results.py::test_pages: Frequency weighting,
    page slicing, and the past-the-end clamping semantics."""
    from whoosh_reloaded_spark.scoring import Frequency

    docs = [(str(i), "alfa " * (7 - i)) for i in range(1, 7)]
    df = spark.createDataFrame(docs, "url string, text string")
    s = Searcher(build_index(df), Frequency())

    r = s.search_results(Term("alfa"), limit=10)
    assert [h["uid"] for h in r] == ["1", "2", "3", "4", "5", "6"]

    p = s.search_page_results(Term("alfa"), 2, pagelen=2)
    assert [h["uid"] for h in p] == ["3", "4"]
    assert p.offset == 2 and not p.is_last_page()

    p2 = s.search_page_results(Term("alfa"), 2, pagelen=4)
    assert p2.total == 6
    assert p2.pagenum == 2
    assert p2.pagelen == 2
    assert [h["uid"] for h in p2] == ["5", "6"]
    assert p2.is_last_page() and p2.pagecount == 2
    assert p2.docnum(0) == p2[0].docnum

    with pytest.raises(ValueError):
        s.search_page_results(Term("alfa"), 0)


def test_highlights_explicit_text(searcher):
    r = searcher.search_results(Term("dragon"), limit=5)
    assert len(r) == 1
    r.fragmenter = WholeFragmenter()
    r.formatter = UppercaseFormatter()
    out = r[0].highlights("title", text="the dragon sleeps")
    assert out == "the DRAGON sleeps"
