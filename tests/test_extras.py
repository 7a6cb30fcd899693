"""Golden parity for the extras: alternative weightings, spelling suggest,
key terms / more-like-this, facets."""

import pytest

from tests.conftest import reference_importable
from whoosh_reloaded_spark.corpus import PAGES_SCHEMA, generate_rows
from whoosh_reloaded_spark.index import build_index
from whoosh_reloaded_spark.query import Or, Searcher, Term

pytestmark = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)

N = 250


@pytest.fixture(scope="module")
def rows():
    return list(generate_rows(N))


@pytest.fixture(scope="module")
def whoosh_ix(rows, tmp_path_factory):
    from whoosh import fields, index

    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True), text=fields.TEXT
    )
    d = tmp_path_factory.mktemp("whoosh_extras")
    ix = index.create_in(str(d), schema)
    w = ix.writer()
    for url, ts, html, text, lang in rows:
        w.add_document(url=url, text=text)
    w.commit()
    return ix


@pytest.fixture(scope="module")
def our_ix(spark, rows):
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    return build_index(df).persist()


def _assert_same(ours, theirs, name):
    assert [u for u, _ in ours] == [u for u, _ in theirs], name
    for (u1, s1), (u2, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9), (name, u1)


def test_dfree_formula(our_ix):
    """The reference's DFreeScorer crashes (calls the nonexistent
    Searcher.weight, scoring.py:378), so DFree is verified against a direct
    evaluation of the published Terrier formula over the index stats."""
    import math

    from pyspark.sql import functions as F

    import whoosh_reloaded_spark.scoring as ss

    s = Searcher(our_ix, ss.DFree())
    got = {d: sc for d, _, sc in s.search_list(Term("render"), 10)}
    stats = our_ix.ensure_stats()
    FL = stats["field_length"]
    cf = float(
        our_ix.term_stats.where(F.col("term") == "render").collect()[0]["total_weight"]
    )
    rows = our_ix.postings.where(F.col("term") == "render").collect()
    from whoosh_reloaded_spark.lengths import byte_to_length

    expected = {}
    for r in rows:
        tf, dl = float(r["weight"]), float(byte_to_length(r["len_byte"]))
        prior, post = tf / dl, (tf + 1.0) / (dl + 1.0)
        invpriorcol = FL / cf
        norm = tf * math.log(post / prior)
        expected[r["docid"]] = norm * (
            tf * math.log(prior * invpriorcol)
            + (tf + 1.0) * math.log(post * invpriorcol)
            + 0.5 * math.log(post / prior)
        )
    for d, sc in got.items():
        assert sc == pytest.approx(expected[d], rel=1e-9), d


@pytest.mark.parametrize("model", ["tfidf", "frequency", "pl2"])
def test_weighting_parity(model, whoosh_ix, our_ix):
    from whoosh import scoring as ws
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WT

    import whoosh_reloaded_spark.scoring as ss

    pairs = {
        "tfidf": (ss.TF_IDF(), ws.TF_IDF()),
        "frequency": (ss.Frequency(), ws.Frequency()),
        "pl2": (ss.PL2(), ws.PL2()),
    }
    ours_w, whoosh_w = pairs[model]
    s = Searcher(our_ix, ours_w)
    ours = [
        (uid, score)
        for _, uid, score in s.search_list(Or((Term("render"), Term("yellow"))), 10)
    ]
    WOr.matcher_type = WOr.DEFAULT_MATCHER
    with whoosh_ix.searcher(weighting=whoosh_w) as ws_:
        theirs = [
            (h["url"], h.score)
            for h in ws_.search(WOr([WT("text", "render"), WT("text", "yellow")]), limit=10)
        ]
    _assert_same(ours, theirs, model)


def test_spelling_suggest_parity(whoosh_ix, our_ix):
    from whoosh_reloaded_spark.spelling import suggest

    s = Searcher(our_ix)
    with whoosh_ix.searcher() as ws_:
        corrector = ws_.corrector("text")
        for word, prefix in [("rendar", 1), ("yelow", 1), ("alpah", 0), ("spakr", 2)]:
            theirs = corrector.suggest(word, limit=5, maxdist=2, prefix=prefix)
            ours = suggest(s, word, limit=5, maxdist=2, prefix=prefix)
            assert ours == theirs, word


def test_spelling_suggest_distributed_path(whoosh_ix, our_ix, monkeypatch):
    """Force the Arrow-UDF path (as if the length-windowed lexicon slice
    exceeded the driver probe limit) and assert results are identical to the
    reference — no unbounded lexicon collect on either path."""
    import whoosh_reloaded_spark.spelling as sp

    monkeypatch.setattr(sp, "FUZZY_DRIVER_LIMIT", 2)
    s = Searcher(our_ix)
    with whoosh_ix.searcher() as ws_:
        corrector = ws_.corrector("text")
        for word, prefix in [("rendar", 1), ("alpah", 0)]:
            theirs = corrector.suggest(word, limit=5, maxdist=2, prefix=prefix)
            ours = sp.suggest(s, word, limit=5, maxdist=2, prefix=prefix)
            assert ours == theirs, word


def test_key_terms_parity(rows, our_ix, tmp_path_factory):
    from whoosh import fields, index

    from whoosh_reloaded_spark.classify import Bo1Model, key_terms

    # key_terms needs term vectors in the reference; build a vectored index
    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True),
        text=fields.TEXT(vector=True),
    )
    d = tmp_path_factory.mktemp("whoosh_vec")
    wix = index.create_in(str(d), schema)
    w = wix.writer()
    for url, ts, html, text, lang in rows:
        w.add_document(url=url, text=text)
    w.commit()

    s = Searcher(our_ix)
    docnums = [0, 3, 4]
    with wix.searcher() as ws_:
        theirs = list(ws_.key_terms(docnums, "text", numterms=5))
    ours = key_terms(s, docnums, numterms=5, model=Bo1Model)
    assert [t for t, _ in ours] == [t for t, _ in theirs]
    for (t1, s1), (t2, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9), t1


def test_key_terms_from_text_parity(rows, our_ix):
    """key_terms_from_text matches the reference Expander.add_text path
    (searching.py:547-559) to 1e-9, including the quirk that the total
    weight counts words absent from the index."""
    from whoosh import fields, index

    from whoosh_reloaded_spark.classify import Bo1Model, key_terms_from_text

    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True),
        text=fields.TEXT(vector=True),
    )
    import tempfile

    d = tempfile.mkdtemp()
    wix = index.create_in(d, schema)
    w = wix.writer()
    for url, ts, html, text, lang in rows:
        w.add_document(url=url, text=text)
    w.commit()

    s = Searcher(our_ix)
    sample = (
        "alfa render yellow charlie render unknownword alfa "
        "spark data zebraword"
    )
    with wix.searcher() as ws_:
        theirs = list(ws_.key_terms_from_text("text", sample, numterms=5))
    ours = key_terms_from_text(s, sample, numterms=5, model=Bo1Model)
    assert [t for t, _ in ours] == [t for t, _ in theirs]
    for (t1, s1), (t2, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-9), t1


def test_more_like_returns_similar(our_ix):
    from whoosh_reloaded_spark.classify import more_like

    s = Searcher(our_ix)
    # fixture doc 7 is "alfa alfa alfa alfa alfa" — its neighbors are the
    # other graded-tf alfa docs
    out = more_like(s, 7, numterms=3, limit=5).collect()
    assert out, "no similar docs"
    assert all(r["docid"] != 7 for r in out)
    assert any("results/tf" in r["uid"] for r in out)


def test_facets(spark, our_ix):
    from pyspark.sql import functions as F

    from whoosh_reloaded_spark.facets import (
        best_per_group,
        collapse,
        group_counts,
        grouped_docs,
        range_facet,
        sort_by,
    )

    s = Searcher(our_ix)
    hits = s._eval(Or((Term("render"), Term("yellow"), Term("alpha"))))
    meta = our_ix.docmeta

    counts = {r["lang_key"]: r["n_docs"] for r in group_counts(
        hits, meta.withColumn("lang_key", F.substring("uid", 9, 1)), ["lang_key"]
    ).collect()}
    assert sum(counts.values()) == hits.count()

    g = grouped_docs(hits, meta.withColumn("k", F.col("docid") % 2), ["k"]).collect()
    assert len(g) == 2

    top1 = best_per_group(hits, meta.withColumn("k", F.col("docid") % 3), ["k"])
    assert top1.count() <= 3

    c = collapse(hits, meta.withColumn("k", F.col("docid") % 5), "k", 2)
    assert c.groupBy("k").count().agg(F.max("count")).collect()[0][0] <= 2

    rf = range_facet(hits, meta, "length", 0, 300, 50)
    assert rf.agg(F.sum("n_docs")).collect()[0][0] <= hits.count()

    sb = sort_by(hits, meta, ["length"], limit=5).collect()
    assert len(sb) == 5
    assert [r["length"] for r in sb] == sorted(r["length"] for r in sb)


def test_highlight():
    from whoosh_reloaded_spark.highlight import snippet

    text = "The quick brown fox jumps over the lazy dog while another fox watches"
    out = snippet(text, ["fox", "dog"], before=10, after=10)
    assert "<b>fox</b>" in out and "<b>dog</b>" in out
    assert snippet(text, ["zebra"]) == ""
    # case-insensitive matching through the analyzer regex
    assert "<b>Fox</b>" in snippet("A Fox ran.", ["fox"], before=5, after=5)


def test_time_limit_collector(spark):
    """TimeLimitCollector analogue (collectors.py:1012): generous budget
    returns results; tiny budget on a slowed plan raises TimeLimit and
    cancels the job."""
    import time

    from pyspark.sql import functions as F

    from whoosh_reloaded_spark.collectors import (
        TimeLimit,
        collect_with_time_limit,
        search_with_time_limit,
    )
    from whoosh_reloaded_spark.corpus import PAGES_SCHEMA, generate_rows
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Or, Searcher, Term

    df = spark.createDataFrame(list(generate_rows(200)), PAGES_SCHEMA)
    s = Searcher(build_index(df).persist())
    q = Or([Term("render"), Term("yellow")])

    rows = search_with_time_limit(s, q, timelimit=120.0, limit=5)
    assert len(rows) == 5

    # an artificially slow frame: per-row sleep via a python UDF
    from pyspark.sql.functions import udf

    @udf("double")
    def slow(x):
        time.sleep(0.5)
        return float(x)

    slow_df = (
        spark.range(2000).repartition(4).select(slow(F.col("id")).alias("v"))
    )
    t0 = time.time()
    with pytest.raises(TimeLimit):
        collect_with_time_limit(slow_df, timelimit=2.0)
    assert time.time() - t0 < 30  # cancelled, not run to completion


def test_characters_format_parity(spark):
    """char_spans must be byte-identical to the reference's Characters
    payloads ((pos, startchar, endchar) per occurrence, formats.py:273-330)
    for the same analyzer, and the distributed frame must agree."""
    if not reference_importable():
        pytest.skip("reference not importable")
    from whoosh import analysis as wana
    from whoosh import fields, formats, index

    from whoosh_reloaded_spark.chars import char_spans, char_spans_df

    texts = [t for _, _, _, t, _ in generate_rows(30)]

    charfield = fields.FieldType(
        formats.Characters(), wana.StandardAnalyzer(), scorable=True
    )
    schema = fields.Schema(url=fields.ID(stored=True, unique=True),
                           text=charfield)
    import tempfile

    d = tempfile.mkdtemp()
    wix = index.create_in(d, schema)
    w = wix.writer()
    for i, t in enumerate(texts):
        w.add_document(url=f"{i:03d}", text=t)
    w.commit()

    # reference golden: docnum -> term -> [(pos, sc, ec), ...]
    golden = {}
    with wix.searcher() as s:
        r = s.reader()
        for term in r.lexicon("text"):
            m = r.postings("text", term)
            while m.is_active():
                golden.setdefault(m.id(), {}).setdefault(
                    term.decode() if isinstance(term, bytes) else term, []
                ).extend(
                    [(p, sc, ec) for p, sc, ec in m.value_as("characters")]
                )
                m.next()

    for i, t in enumerate(texts):
        ours = {}
        for term, pos, sc, ec in char_spans(t):
            ours.setdefault(term, []).append((pos, sc, ec))
        assert ours == golden.get(i, {}), i

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "docid long, text string"
    )
    rows = char_spans_df(df).collect()
    dist = {}
    for r2 in rows:
        dist.setdefault(r2["docid"], {}).setdefault(r2["term"], []).append(
            (r2["pos"], r2["startchar"], r2["endchar"])
        )
    assert dist == {i: g for i, g in golden.items()}


def test_function_translate_storedfield_facets(spark):
    """FunctionFacet / TranslateFacet / StoredFieldFacet(allow_overlap)
    (sorting.py:593-746) as expression-driven aggregations."""
    from whoosh_reloaded_spark.facets import (
        function_facet,
        stored_field_facet,
        translate_facet,
    )

    docmeta = spark.createDataFrame(
        [(0, 5, "red blue"), (1, 17, "blue"), (2, 23, "red green"),
         (3, 41, "green red")],
        "docid long, n long, tags string",
    )
    hits = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (2, 1.0), (3, 1.0)], "docid long, score double"
    )
    # FunctionFacet: bucket n by decade
    ff = {
        r["key"]: r["n_docs"]
        for r in function_facet(hits, docmeta, "int(n / 10)", ["n"]).collect()
    }
    assert ff == {0: 1, 1: 1, 2: 1, 4: 1}
    # TranslateFacet: collapse decades into parity-of-decade
    tf = {
        r["key"]: r["n_docs"]
        for r in translate_facet(
            function_facet(hits, docmeta, "int(n / 10)", ["n"]),
            "key % 2",
        ).collect()
    }
    assert tf == {0: 3, 1: 1}
    # StoredFieldFacet with allow_overlap: split tags, doc counts per piece
    sf = {
        r["key"]: r["n_docs"]
        for r in stored_field_facet(
            hits, docmeta, "tags", allow_overlap=True
        ).collect()
    }
    assert sf == {"red": 3, "blue": 2, "green": 2}


def test_posting_formats(spark, tmp_path):
    """Posting formats (formats.py:109-330): frequency drops positions with
    identical BM25 scores; existence forces constant weight; positional
    queries on position-less indexes raise a clear error."""
    from whoosh_reloaded_spark.index import load_index, save_index
    from whoosh_reloaded_spark.query import Phrase

    rows = list(generate_rows(120))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)

    full = build_index(df)
    freq = build_index(df, format="frequency")
    exist = build_index(df, format="existence")

    assert "positions" not in freq.postings.columns
    assert "positions" not in exist.postings.columns

    q = Or([Term("render"), Term("yellow")])
    want = [(r["docid"], round(r["score"], 9))
            for r in Searcher(full).search(q, 10, with_uid=False).collect()]
    got = [(r["docid"], round(r["score"], 9))
           for r in Searcher(freq).search(q, 10, with_uid=False).collect()]
    assert got == want  # BM25 identical without the position payload

    ew = {r["weight"] for r in exist.postings.select("weight").distinct().collect()}
    assert ew == {1.0}

    with pytest.raises(ValueError, match="positions"):
        Searcher(freq).search(Phrase(["quick", "went"]), 5).collect()

    # save/load round-trip without positions
    save_index(freq, str(tmp_path / "freqix"))
    lx = load_index(spark, str(tmp_path / "freqix"))
    assert "positions" not in lx.postings.columns
    got2 = [(r["docid"], round(r["score"], 9))
            for r in Searcher(lx).search(q, 10, with_uid=False).collect()]
    assert got2 == want


def test_term_vectors_column(spark):
    """store_vector=True: docmeta carries the forward doc->{term: weight}
    map, consistent with the posting rows (fields.py:93-96 vectors)."""
    rows = list(generate_rows(50))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    ix = build_index(df, store_vector=True)
    assert "vector" in ix.docmeta.columns
    sample = ix.docmeta.where("length > 0").select("docid", "vector").limit(5).collect()
    assert sample
    for r in sample:
        posts = {
            p["term"]: p["weight"]
            for p in ix.postings.where(f"docid = {r['docid']}")
            .select("term", "weight").collect()
        }
        assert dict(r["vector"]) == posts
    # Searcher.vector accessor (IndexReader.vector_as("weight"))
    s = Searcher(ix)
    d0 = sample[0]["docid"]
    assert s.vector(d0) == dict(sample[0]["vector"])
    # vector-less index: reuse the module's ix shape cheaply via a tiny df
    tiny = spark.createDataFrame([("u", "a b")], "url string, text string")
    with pytest.raises(ValueError):
        Searcher(build_index(tiny)).vector(0)


def test_scaled_or_zero_term_matchers_yields_docs(spark):
    """Or(scale) whose children contribute ZERO term matchers skips the
    coordination wrapper entirely and scores as a plain Or — the
    reference applies CoordMatcher only `if self.scale and
    any(m.term_matchers())` (compound.py:377, round-5 or-mode fuzz,
    verified live on '* NOT *'): docs are neither dropped nor zeroed."""
    import datetime

    from whoosh_reloaded_spark.query import DateRange

    rows = list(generate_rows(40))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    s = Searcher(build_index(df, stored_cols=["warc_ts"]))
    lo = datetime.datetime(1990, 1, 1)
    hi = datetime.datetime(2100, 1, 1)
    # DISJOINT ranges: since round 5 Or.normalize merges OVERLAPPING
    # same-field ranges like the reference (an overlapping pair would
    # collapse to one range and never reach the scaled-Or path)
    q = Or(
        (
            DateRange("warc_ts", lo, hi),
            DateRange("warc_ts", datetime.datetime(2200, 1, 1),
                      datetime.datetime(2300, 1, 1)),
        ),
        scale=0.5,
    )
    hits = s.search(q, limit=None).collect()
    assert len(hits) == 40  # every doc matches — NOT silently dropped
    # no term matchers -> no CoordMatcher -> plain Or sum (range score 1.0)
    assert all(h["score"] == 1.0 for h in hits)


def test_document_lookup(spark):
    """Searcher.document/documents (searching.py): stored-field equality
    lookup over docmeta, filter pushed to the scan."""
    rows = list(generate_rows(60))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    s = Searcher(build_index(df))
    uid = rows[3][0]
    d = s.document(uid=uid)
    assert d is not None and d["uid"] == uid and d["docid"] == 3
    assert s.document(uid="https://nope.test/") is None
    assert s.documents(docid=5).count() == 1


def test_reader_conveniences(spark):
    """IndexReader-surface wrappers: lexicon / doc_frequency / frequency /
    doc_count / suggest / key_terms / more_like on the Searcher."""
    rows = list(generate_rows(80))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    s = Searcher(build_index(df).persist())
    lex = [r["term"] for r in s.lexicon(prefix="re").limit(5).collect()]
    assert lex == sorted(lex) and all(t.startswith("re") for t in lex)
    assert s.doc_frequency("render") > 0
    assert s.doc_frequency("zzznope") == 0
    assert s.frequency("render") >= s.doc_frequency("render")
    assert s.doc_count() == 80
    sug = s.suggest("rendar")
    assert sug and sug[0] == "render"
    kt = s.key_terms([0, 1], numterms=3)
    assert len(kt) == 3
    ml = s.more_like(0, numterms=3, limit=5).collect()
    assert len(ml) > 0


def test_results_wrapper(spark):
    """Results/Hit access surface (searching.py): len, indexing, score(n),
    docnum(n), fields(n)."""
    rows = list(generate_rows(60))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    s = Searcher(build_index(df, stored_cols=["lang"]))
    res = s.search_results(Or([Term("render"), Term("yellow")]), limit=5,
                           stored_cols=["lang"])
    assert len(res) == 5
    assert res.score(0) >= res.score(1)
    assert res.docnum(0) == res[0].docnum
    f = res.fields(0)
    assert "uid" in f and "lang" in f
    assert "uid" in res[0] and res[0]["lang"] == f["lang"]
    assert [h.rank for h in res] == [0, 1, 2, 3, 4]


def test_constant_score_parity(whoosh_ix, our_ix):
    """ConstantScoreQuery golden parity (reference query/wrappers.py:146-181):
    fixed score for every matching doc, standalone and as an Or clause."""
    from whoosh.query import ConstantScoreQuery as WCSQ
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WT

    from whoosh_reloaded_spark.query import ConstantScoreQuery, Or, Term

    s = Searcher(our_ix)
    with whoosh_ix.searcher() as ws_:
        for ours_q, theirs_q in [
            (
                ConstantScoreQuery(Term("render"), 2.5),
                WCSQ(WT("text", "render"), 2.5),
            ),
            (
                Or((ConstantScoreQuery(Term("render"), 1.5), Term("yellow"))),
                WOr([WCSQ(WT("text", "render"), 1.5), WT("text", "yellow")]),
            ),
        ]:
            ours = [
                (uid, score) for _, uid, score in s.search_list(ours_q, 10)
            ]
            theirs = [
                (h["url"], h.score) for h in ws_.search(theirs_q, limit=10)
            ]
            _assert_same(ours, theirs, repr(ours_q))


def test_weighting_query_parity(whoosh_ix, our_ix):
    """WeightingQuery golden parity (reference query/wrappers.py:184-199).

    The reference's ``WeightingQuery.matcher`` has a state bug: it calls
    ``context.set(weighting=...)`` but ``SearchContext.set`` returns a
    *copy* (searching.py:90-93) which is discarded, so the wrapper is a
    silent no-op — the child scores with the searcher's model.  Per this
    repo's document-and-deviate convention we implement the *intended*
    semantics (subtree scored under the wrapped model) and build the
    golden from the reference's own per-child scores: a standalone
    WeightingQuery(child, W) must equal the reference searching `child`
    with ``weighting=W``, and an Or composition must equal the sum of the
    reference's per-child scores under each child's model."""
    from whoosh import scoring as wsc
    from whoosh.query import Term as WT

    import whoosh_reloaded_spark.scoring as ss
    from whoosh_reloaded_spark.query import Or, Term, WeightingQuery

    s = Searcher(our_ix)

    # standalone: equal to the reference under weighting=TF_IDF
    ours = [
        (uid, score)
        for _, uid, score in s.search_list(
            WeightingQuery(Term("render"), ss.TF_IDF()), 10
        )
    ]
    with whoosh_ix.searcher(weighting=wsc.TF_IDF()) as ws_:
        theirs = [
            (h["url"], h.score)
            for h in ws_.search(WT("text", "render"), limit=10)
        ]
    _assert_same(ours, theirs, "weighting_query standalone")

    # Or composition: reference per-child scores under each child's model
    with whoosh_ix.searcher(weighting=wsc.TF_IDF()) as ws_:
        tfidf_scores = {
            h["url"]: h.score
            for h in ws_.search(WT("text", "render"), limit=None)
        }
    with whoosh_ix.searcher() as ws_:
        bm25_scores = {
            h["url"]: h.score
            for h in ws_.search(WT("text", "yellow"), limit=None)
        }
    expected = {}
    for u, sc in tfidf_scores.items():
        expected[u] = expected.get(u, 0.0) + sc
    for u, sc in bm25_scores.items():
        expected[u] = expected.get(u, 0.0) + sc
    got = s.search_list(
        Or((WeightingQuery(Term("render"), ss.TF_IDF()), Term("yellow"))),
        limit=None,
    )
    assert len(got) == len(expected)
    for _, uid, score in got:
        assert score == pytest.approx(expected[uid], rel=1e-9), uid
