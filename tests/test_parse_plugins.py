"""Parser plugin surface — shapes mirrored from the reference's
tests/test_parse_plugins.py (GtLt, CopyField, Every, dates) and
tests/test_parsing.py::test_multifield."""

from datetime import datetime

import pytest

from whoosh_reloaded_spark.query import ast as Q
from whoosh_reloaded_spark.query.parser import MultifieldParser, QueryParser

SCHEMA = {
    "a": "text",
    "b": "numeric",
    "c": "text",
    "d": "numeric",
    "e": "date",
}


def qp(**kw):
    return QueryParser("a", schema=SCHEMA, **kw)


def test_gtlt_shapes():
    # reference test_parse_plugins.py:348-371
    q = qp().parse("a:hello b:>100 c:<=z there")
    assert isinstance(q, Q.And) and len(q.children) == 4
    assert q.children[0] == Q.Term("hello", "a")
    assert q.children[1] == Q.NumericRange("b", 100.0, None, True, False)
    assert q.children[2] == Q.TermRange(None, "z", "c")
    assert q.children[3] == Q.Term("there", "a")


def test_gtlt_requires_field():
    # bare ">100" has no field specifier -> not a range (plugins.py:1092-1095)
    q = qp().parse("hello >100")
    assert all(not isinstance(c, Q.NumericRange) for c in q.children)


def test_gtlt_date():
    q = qp().parse("e:>=2010-05-12")
    assert q == Q.DateRange("e", datetime(2010, 5, 12), None, False, False)
    q2 = qp().parse("e:>2010")
    assert q2 == Q.DateRange(
        "e", datetime(2010, 12, 31, 23, 59, 59, 999999), None, True, False
    )


def test_numeric_exact_and_range():
    q = qp().parse("b:250")
    assert q == Q.NumericRange("b", 250.0, 250.0, False, False)
    q2 = qp().parse("b:[100 to 200]")
    assert q2 == Q.NumericRange("b", 100.0, 200.0, False, False)
    q3 = qp().parse("b:{100 to 200}")
    assert q3 == Q.NumericRange("b", 100.0, 200.0, True, True)


def test_date_point_spans_period():
    # date:2010 covers the whole year (adatetime floor/ceil, times.py:202-260)
    q = qp().parse("e:2010")
    assert q == Q.DateRange(
        "e",
        datetime(2010, 1, 1),
        datetime(2010, 12, 31, 23, 59, 59, 999999),
        False,
        False,
    )
    q2 = qp().parse("e:2010-05")
    assert q2.start == datetime(2010, 5, 1)
    assert q2.end == datetime(2010, 5, 31, 23, 59, 59, 999999)


def test_date_range_bracket():
    # [2010 to 2012] -> floor(2010) .. ceil(2012) (dateparse.py:943-960)
    q = qp().parse("e:[2010 to 2012]")
    assert q == Q.DateRange(
        "e",
        datetime(2010, 1, 1),
        datetime(2012, 12, 31, 23, 59, 59, 999999),
        False,
        False,
    )


def test_fielded_text_range():
    q = qp().parse("c:[m to p]")
    assert q == Q.TermRange("m", "p", "c")


def test_every():
    # '*:*' is EveryPlugin's UNFIELDED Every; a bare '*' is Wildcard('*'),
    # which normalizes to the default FIELD's Every (reference
    # plugins.py:349-360 vs terms.py:352-355, verified live)
    assert qp().parse("*:*") == Q.Every()
    assert qp().parse("*").normalize() == Q.Every(fieldname="a")
    # the unfielded form ignores a trailing boost; the fielded keeps it
    assert qp().parse("*:*^2") == Q.Every()
    assert qp().parse("*^2").normalize() == Q.Every(2.0, "a")


def test_copyfield():
    # reference test_parse_plugins.py:302-306 (default Or group)
    p = QueryParser("a", schema={"a": "text", "b": "text", "c": "text"},
                    copy_fields={"b": "c"})
    q = p.parse("hello b:matt")
    assert isinstance(q, Q.And)
    assert q.children[0] == Q.Term("hello", "a")
    assert q.children[1] == Q.Or((Q.Term("matt", "b"), Q.Term("matt", "c")))


def test_copyfield_default_field():
    # CopyFieldPlugin applies to the DEFAULT field too (fname = node.fieldname
    # or parser.fieldname, plugins.py:1288)
    p = QueryParser("a", schema={"a": "text", "c": "text"},
                    copy_fields={"a": "c"})
    q = p.parse("hello")
    assert q == Q.Or((Q.Term("hello", "a"), Q.Term("hello", "c")))


def test_multifield():
    # reference test_parsing.py:191-203
    p = MultifieldParser(["x", "y"], schema={"x": "text", "y": "text",
                                             "cat": "text"})
    q = p.parse("alfa (bravo charlie cat:delta) OR (bravo charlie cat:echo)")
    s = repr(q)
    # unfielded terms expand to Or over x/y; fielded cat:delta stays single
    assert "Term(text='delta', fieldname='cat'" in s
    assert "Term(text='bravo', fieldname='x'" in s
    assert "Term(text='bravo', fieldname='y'" in s


def test_multifield_boosts():
    p = MultifieldParser(["x", "y"], fieldboosts={"x": 2.0},
                         schema={"x": "text", "y": "text"})
    q = p.parse("hello")
    assert q == Q.Or((Q.Term("hello", "x", 2.0), Q.Term("hello", "y")))


def test_multifield_phrase():
    p = MultifieldParser(["x", "y"], schema={"x": "text", "y": "text"})
    q = p.parse('"big data"')
    assert q == Q.Or(
        (Q.Phrase(("big", "data"), "x"), Q.Phrase(("big", "data"), "y"))
    )


def test_fielded_phrase():
    p = QueryParser("a", schema={"a": "text", "t": "text"})
    q = p.parse('t:"big data"')
    assert q == Q.Phrase(("big", "data"), "t")


def test_default_grammar_unchanged():
    p = QueryParser("text")
    q = p.parse("render AND yellow")
    assert q == Q.And((Q.Term("render"), Q.Term("yellow")))
    q2 = p.parse("render OR yellow^2")
    assert q2 == Q.Or((Q.Term("render"), Q.Term("yellow", boost=2.0)))


def test_plugin_ast_transform():
    """Plugin extension point: PseudoField/FieldAlias-style rewrites as
    bottom-up AST transforms (plugins.py:60-90 filter protocol analogue)."""
    from dataclasses import replace

    # alias field 'body' -> 'text'
    def alias(q):
        if getattr(q, "fieldname", None) == "body":
            return replace(q, fieldname="text")
        return q

    p = QueryParser("a", schema={"a": "text", "body": "text"}, plugins=[alias])
    q = p.parse("hello body:world")
    assert q == Q.And((Q.Term("hello", "a"), Q.Term("world", "text")))

    # pseudo-field-style: turn terms in field 'rx' into Regex queries
    def rx(q):
        if isinstance(q, Q.Term) and q.fieldname == "rx":
            return Q.Regex(q.text, "a")
        return q

    p2 = QueryParser("a", schema={"a": "text", "rx": "text"}, plugins=[rx])
    q2 = p2.parse("alfa rx:bravo")
    assert q2 == Q.And((Q.Term("alfa", "a"), Q.Regex("bravo", "a")))


def test_sequence_plugin_golden(spark):
    """SequencePlugin (plugins.py:758-833): quoted groups hold arbitrary
    subqueries matched in sequence.  Golden vs the reference parser+engine
    with PhrasePlugin swapped for SequencePlugin."""
    import pytest as _pt

    from tests.conftest import reference_importable

    if not reference_importable():
        _pt.skip("reference not importable")
    from whoosh import fields, index, qparser

    from whoosh_reloaded_spark.corpus import PAGES_SCHEMA, generate_rows
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Searcher

    rows = list(generate_rows(250))
    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True), text=fields.TEXT
    )
    import tempfile

    d = tempfile.mkdtemp()
    wix = index.create_in(d, schema)
    w = wix.writer()
    for url, ts, html, text, lang in rows:
        w.add_document(url=url, text=text)
    w.commit()

    qp_theirs = qparser.QueryParser("text", schema)
    qp_theirs.remove_plugin_class(qparser.PhrasePlugin)
    qp_theirs.add_plugin(qparser.SequencePlugin())

    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    s = Searcher(build_index(df).persist())
    qp_ours = QueryParser("text", sequence_plugin=True)

    for qs in ['"(quick OR fast) went"', '"mary had little"',
               '"qui* went"']:
        wq = qp_theirs.parse(qs)
        with wix.searcher() as ws:
            try:
                res = ws.search(wq, limit=10)
            except Exception:
                res = ws.search(wq, limit=10, optimize=False)
            theirs = [(h["url"], h.score) for h in res]
        ours_q = qp_ours.parse(qs)
        ours = [(u, sc) for _, u, sc in s.search_list(ours_q, 10)]
        assert [u for u, _ in ours] == [u for u, _ in theirs], (qs, ours, theirs)
        for (u1, s1), (u2, s2) in zip(ours, theirs):
            assert s1 == _pt.approx(s2, rel=1e-9), (qs, u1)


def test_relative_dates_golden():
    """Relative dates (today/yesterday/tomorrow/now) vs the reference's
    DateParserPlugin with the SAME basedate."""
    import pytest as _pt

    from tests.conftest import reference_importable

    if not reference_importable():
        _pt.skip("reference not importable")
    from whoosh import fields
    from whoosh.qparser import QueryParser as WQP
    from whoosh.qparser.dateparse import DateParserPlugin

    base = datetime(2010, 9, 20, 15, 16, 6, 454000)
    wschema = fields.Schema(text=fields.TEXT, date=fields.DATETIME)
    wqp = WQP("text", wschema)
    wqp.add_plugin(DateParserPlugin(basedate=base))

    p = QueryParser("text", schema={"text": "text", "date": "date"},
                    basedate=base)

    for text in ("today", "yesterday", "tomorrow"):
        wq = wqp.parse(f"date:{text}")
        ours = p.parse(f"date:{text}")
        assert isinstance(ours, Q.DateRange), text
        # the reference attaches UTC tzinfo to its endpoints; values match
        assert ours.start == wq.startdate.replace(tzinfo=None), (text, ours, wq)
        assert ours.end == wq.enddate.replace(tzinfo=None), (text, ours, wq)

    # 'now' -> exact instant (the reference emits an exact-term query;
    # ours is the equivalent [now, now] range)
    ours_now = p.parse("date:now")
    assert ours_now.start == base and ours_now.end == base


def test_regex_plugin_syntax():
    # reference test_parse_plugins.py::test_regex shapes
    p = QueryParser("a", schema={"a": "text", "b": "text"})
    q = p.parse('a:r"foo-bar" hello')
    assert isinstance(q, Q.And)
    assert q.children[0] == Q.Regex("foo-bar", "a")
    assert q.children[1] == Q.Term("hello", "a")


def test_simple_parser_golden(spark):
    """SimpleParser (+/-/phrase grammar) — rank+score parity vs the
    reference SimpleParser over the shared corpus."""
    import pytest as _pt

    from tests.conftest import reference_importable

    if not reference_importable():
        _pt.skip("reference not importable")
    from whoosh import fields, index
    from whoosh.qparser import SimpleParser as WSimple

    from whoosh_reloaded_spark.corpus import PAGES_SCHEMA, generate_rows
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Searcher
    from whoosh_reloaded_spark.query.parser import SimpleParser

    rows = list(generate_rows(200))
    wschema = fields.Schema(
        url=fields.ID(stored=True, unique=True), text=fields.TEXT
    )
    import tempfile

    d = tempfile.mkdtemp()
    wix = index.create_in(d, wschema)
    w = wix.writer()
    for url, ts, html, text, lang in rows:
        w.add_document(url=url, text=text)
    w.commit()
    wqp = WSimple("text", wschema)

    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    s = Searcher(build_index(df).persist())
    p = SimpleParser("text")

    for qs in ["render yellow", "+render yellow", "render -yellow",
               "+render -yellow red", '"quick went" +render']:
        wq = wqp.parse(qs)
        with wix.searcher() as ws:
            try:
                res = ws.search(wq, limit=10)
            except Exception:
                res = ws.search(wq, limit=10, optimize=False)
            theirs = [(h["url"], h.score) for h in res]
        ours = [(u, sc) for _, u, sc in s.search_list(p.parse(qs), 10)]
        assert [u for u, _ in ours] == [u for u, _ in theirs], (qs, ours, theirs)
        for (u1, s1), (u2, s2) in zip(ours, theirs):
            assert s1 == _pt.approx(s2, rel=1e-9), (qs, u1)


def test_field_alias_and_copy_mirror():
    # FieldAliasPlugin (plugins.py:1206-1238) + CopyFieldPlugin mirror=True
    p = QueryParser("content", schema={"content": "text"},
                    field_aliases={"content": ["body", "text"]})
    assert p.parse("body:hello") == Q.Term("hello", "content")
    assert p.parse("text:hello") == Q.Term("hello", "content")

    p2 = QueryParser("a", schema={"a": "text", "b": "text", "c": "text"},
                     copy_fields={"b": "c"}, copy_fields_mirror=True)
    q = p2.parse("c:matt")
    assert q == Q.Or((Q.Term("matt", "c"), Q.Term("matt", "b")))


def test_operators_plugin_custom_tokens():
    """OperatorsPlugin custom syntax (plugins.py:895-1015): replacing the
    default keywords with symbol operators, incl. operators embedded inside
    a token ('this&!that') and removed defaults becoming plain terms."""
    p = QueryParser(
        "f", schema={"f": "text"},
        operators={"And": "&", "Or": r"\|", "AndNot": "&!",
                   "AndMaybe": "&~", "Not": "-"},
    )
    q = p.parse("alfa | bravo")
    assert q == Q.Or((Q.Term("alfa", "f"), Q.Term("bravo", "f")))

    q = p.parse("alfa&!bravo")
    assert q == Q.AndNot(Q.Term("alfa", "f"), Q.Term("bravo", "f"))

    q = p.parse("alfa&~bravo")
    assert q == Q.AndMaybe(Q.Term("alfa", "f"), Q.Term("bravo", "f"))

    # custom ops replace the defaults: NOT is now a plain (analyzed) term
    q = p.parse("alfa -bravo charlie")
    assert isinstance(q, Q.And)
    assert Q.Not(Q.Term("bravo", "f")) in q.children
    assert Q.Term("alfa", "f") in q.children

    q = p.parse("echo & foxtrot")
    assert q == Q.And((Q.Term("echo", "f"), Q.Term("foxtrot", "f")))


def test_operators_plugin_require_default():
    p = QueryParser("f", schema={"f": "text"})
    q = p.parse("alfa REQUIRE bravo")
    assert q == Q.Require(Q.Term("alfa", "f"), Q.Term("bravo", "f"))


def test_function_plugin():
    """FunctionPlugin '#name[args](group)' (plugins.py:558-656)."""
    calls = []

    def fake(qs, *args, **kwargs):
        calls.append((tuple(qs), args, kwargs))
        return qs[0] if qs else Q.NullQuery()

    def fuzzy(qs, prefix=0, maxdist=2):
        t = qs[0]
        return Q.FuzzyTerm(t.text, t.fieldname, maxdist=int(maxdist),
                           prefixlength=int(prefix))

    p = QueryParser("f", schema={"f": "text"},
                    functions={"foo": fake, "fuzzy": fuzzy})

    q = p.parse("alfa #foo(charlie delta) echo")
    (qs, args, kwargs) = calls[-1]
    assert [type(x) for x in qs] == [Q.Term, Q.Term]  # two separate entries
    assert args == () and kwargs == {}
    assert isinstance(q, Q.And)

    p.parse("alfa #foo(charlie AND delta) echo")
    (qs, args, kwargs) = calls[-1]
    assert len(qs) == 1 and isinstance(qs[0], Q.And)  # explicit op binds

    p.parse("alfa #foo[a] charlie")
    (qs, args, kwargs) = calls[-1]
    assert qs == () and args == ("a",)

    p.parse("alfa #foo[a, b](charlie delta) echo")
    (qs, args, kwargs) = calls[-1]
    assert args == ("a", "b") and len(qs) == 2

    p.parse("alfa #foo[a,b,c=d](charlie AND delta) echo")
    (qs, args, kwargs) = calls[-1]
    assert args == ("a", "b") and kwargs == {"c": "d"}

    p.parse("alfa #foo[a=1,b=2](charlie AND delta)^2.0 echo")
    (qs, args, kwargs) = calls[-1]
    assert kwargs == {"a": "1", "b": "2", "boost": 2.0}

    q = p.parse("#fuzzy[maxdist=2](bravo) charlie")
    assert isinstance(q, Q.And)
    assert Q.FuzzyTerm("bravo", "f", maxdist=2, prefixlength=0) in q.children

    # unknown #name degrades to a plain word (not an error)
    q = p.parse("#nosuch alfa")
    assert isinstance(q, Q.And) or isinstance(q, Q.Term)


def test_single_quote_plugin():
    """SingleQuotePlugin (plugins.py:110-117): quoted terms with spaces;
    multitoken text builds the field's default And-of-terms
    (default.py:196-204)."""
    p = QueryParser("f", schema={"f": "text"})
    q = p.parse("'bravo'")
    assert q == Q.Term("bravo", "f")

    q = p.parse("'big apple'")
    assert q == Q.And((Q.Term("big", "f"), Q.Term("apple", "f")))

    q = p.parse("f:'over the rainbow' alfa")
    assert isinstance(q, Q.And)

    # date-field single quotes route through the NL date grammar
    p2 = QueryParser("f", schema={"f": "text", "dt": "date"},
                     basedate=datetime(2010, 9, 20, 15, 16, 6))
    q = p2.parse("dt:'last tuesday'")
    assert isinstance(q, Q.DateRange)
    assert q.start == datetime(2010, 9, 14, 0, 0, 0, 0)


def test_dangling_fuzzy_boost_group_context():
    """The reference's clean_boost (plugins.py:251-262) neutralizes a
    dangling `~^n` boost ONLY at the top level: it runs after
    GroupPlugin's whole-input unwrap (plugins.py:341-344) and never
    recurses into groups, so inside a surviving group the BoostNode
    waits for do_boost(510) and attaches to the merged FuzzyTermNode.
    Every case below verified live against the reference parser
    (round-5 fuzz finding: 'text:(text:(alfa~ AND alfa~^2)^1)' scored
    2x because the inner pair survives as And([fuzzy^1, fuzzy^2]))."""
    p = QueryParser()
    fz = lambda b: Q.FuzzyTerm(
        "alfa", "text", boost=b, maxdist=1, prefixlength=0
    )

    # effective top level (incl. the whole-input-group unwrap): dropped
    assert p.parse("alfa~^2") == fz(1.0)
    assert p.parse("(alfa~^2)") == fz(1.0)
    assert p.parse("(alfa~ AND alfa~^2)") == fz(1.0)  # dedup after drop

    # inside any surviving group: attached
    assert p.parse("text:(alfa~^2)") == fz(2.0)
    assert p.parse("((alfa~ AND alfa~^2))") == Q.And((fz(1.0), fz(2.0)))
    assert p.parse("text:(text:(alfa~ AND alfa~^2)^1)") == \
        Q.And((fz(1.0), fz(2.0)))
    q = p.parse("(alfa~^2) AND bravo")
    assert q == Q.And((fz(2.0), Q.Term("bravo", "text")))
    q = p.parse("(alfa~^2 OR bravo)^2")
    assert isinstance(q, Q.Or) and q.boost == 2.0
    assert q.children[0] == fz(2.0)

    # top-level null-operand behavior unchanged
    assert isinstance(p.parse("alfa~^2 OR bravo"), Q.And)


def test_dismax_parser_parity(spark):
    """DisMaxParser (default.py:427-449): SimpleParser grammar with
    per-term DisjunctionMax expansion across fieldboosts — rank+score
    parity vs the reference over a two-field corpus."""
    import pytest as _pt

    from tests.conftest import reference_importable

    if not reference_importable():
        _pt.skip("reference not importable")
    from whoosh import fields, index
    from whoosh.qparser import DisMaxParser as WDisMax

    from whoosh_reloaded_spark.multifield import (
        FieldSpec,
        MultiFieldSearcher,
        build_multi_index,
    )
    from whoosh_reloaded_spark.query.parser import DisMaxParser

    vocab = ["alfa", "bravo", "charlie", "delta", "echo", "foxtrot"]
    rows = [
        (f"d{i:02d}",
         " ".join(vocab[(i * 5 + j) % len(vocab)] for j in range(3)),
         " ".join(vocab[(i * 3 + j * 2) % len(vocab)] for j in range(5)))
        for i in range(25)
    ]
    wschema = fields.Schema(
        key=fields.ID(stored=True, unique=True),
        name=fields.TEXT,
        value=fields.TEXT,
    )
    import tempfile

    d = tempfile.mkdtemp()
    wix = index.create_in(d, wschema)
    w = wix.writer()
    for key, name, value in rows:
        w.add_document(key=key, name=name, value=value)
    w.commit()
    # Work around the documented reference bug (see test_search_parity
    # q11 note): DisjunctionMaxMatcher.score() maxes over sub-matchers
    # that are merely ACTIVE, leaking a sibling field's score from
    # whatever LATER doc its cursor is parked on.  Patch to the
    # documented max-at-current-doc semantics so the parity check tests
    # intended behavior.
    from whoosh.matching.binary import DisjunctionMaxMatcher

    def _score(self):
        did = self.id()
        a_at = self.a.is_active() and self.a.id() == did
        b_at = self.b.is_active() and self.b.id() == did
        if a_at and b_at:
            return max(self.a.score(), self.b.score())
        return self.a.score() if a_at else self.b.score()

    boosts = {"name": 1.0, "value": 2.0}
    wqp = WDisMax(boosts, wschema)

    df = spark.createDataFrame(rows, "key string, name string, value string")
    idx = build_multi_index(
        df, {"name": FieldSpec("name"), "value": FieldSpec("value")},
        uid_col="key",
    )
    s = MultiFieldSearcher(idx, default_field="name")
    p = DisMaxParser(boosts)

    # patch immediately before the guarded block so a setup failure
    # can't leak the patched score into later reference-parity tests
    orig_score = DisjunctionMaxMatcher.score
    DisjunctionMaxMatcher.score = _score
    try:
        for qs in ["alfa bravo", "+alfa bravo", "alfa -bravo",
                   '+alfa -bravo "charlie delta"', "name:alfa", "echo"]:
            wq = wqp.parse(qs)
            with wix.searcher() as ws:
                try:
                    res = ws.search(wq, limit=None)
                except Exception:
                    res = ws.search(wq, limit=None, optimize=False)
                theirs = {h["key"]: h.score for h in res}
            ours = {u: sc for _, u, sc in s.search_list(p.parse(qs), 100)}
            assert set(ours) == set(theirs), (qs, sorted(ours), sorted(theirs))
            for u, sc in theirs.items():
                assert ours[u] == _pt.approx(sc, rel=1e-6), (qs, u)
    finally:
        DisjunctionMaxMatcher.score = orig_score


def test_simple_parser_sign_and_phrase_splitting():
    """The reference's Plus/Minus/Phrase taggers match at ANY position,
    splitting words: 'alfa-bravo' PROHIBITS bravo, 'alfa+bravo' REQUIRES
    bravo, a quote opens a phrase mid-token, and an all-null required
    group nukes the query (BooleanQuery null cascade).  All verified
    live vs the reference SimpleParser (round-5 review findings)."""
    from whoosh_reloaded_spark.query.parser import SimpleParser

    p = SimpleParser("text")
    t = lambda w: Q.Term(w, "text")
    assert p.parse('-"alfa bravo"') == Q.NullQuery()
    assert p.parse('+"alfa bravo"') == Q.Phrase(("alfa", "bravo"), "text")
    assert p.parse('alfa"bravo charlie"') == Q.Or(
        (t("alfa"), Q.Phrase(("bravo", "charlie"), "text"))
    )
    assert p.parse("alfa-bravo") == Q.AndNot(t("alfa"), t("bravo"))
    assert p.parse("alfa+bravo") == Q.AndMaybe(t("bravo"), t("alfa"))
    assert p.parse("+the alfa") == Q.NullQuery()  # required stopword
    assert p.parse("-the alfa") == t("alfa")
    assert p.parse("+the +alfa bravo") == Q.AndMaybe(t("alfa"), t("bravo"))
    assert p.parse("+-alfa bravo") == Q.AndNot(t("bravo"), t("alfa"))
    assert p.parse("alfa - bravo") == Q.AndNot(t("alfa"), t("bravo"))
    assert p.parse("charlie -") == t("charlie")
    assert p.parse("a-") == Q.NullQuery()


def test_simple_parser_fuzz(spark):
    """Property fuzz of the +/-/phrase grammar vs the reference
    SimpleParser: random sign/word/phrase/hyphen token streams, rank+score
    parity on a shared corpus."""
    import pytest as _pt

    from tests.conftest import reference_importable

    if not reference_importable():
        _pt.skip("reference not importable")
    import os as _os

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from whoosh import fields, index
    from whoosh.qparser import SimpleParser as WSimple

    from whoosh_reloaded_spark.query import Searcher
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query.parser import SimpleParser

    vocab = ["alfa", "bravo", "charlie", "delta", "echo", "the", "a"]
    docs = [
        " ".join(vocab[(i * 3 + j) % 5] for j in range(4 + i % 3))
        for i in range(25)
    ]
    wschema = fields.Schema(
        url=fields.ID(stored=True, unique=True), text=fields.TEXT
    )
    import tempfile

    d = tempfile.mkdtemp()
    wix = index.create_in(d, wschema)
    w = wix.writer()
    for i, text in enumerate(docs):
        w.add_document(url=f"d{i:02d}", text=text)
    w.commit()
    df = spark.createDataFrame(
        [(f"d{i:02d}", t) for i, t in enumerate(docs)], "url string, text string"
    )
    ours = Searcher(build_index(df).persist())
    wqp = WSimple("text", wix.schema)
    p = SimpleParser("text")

    # same reference-bug workaround as the main fuzz: AndNotMatcher's
    # first-doc exclusion leak (binary.py:573-575) would otherwise make
    # the reference return docs its own semantics exclude
    from tests.test_parser_fuzz import _patch_reference_andnot

    _patch_reference_andnot()

    word = st.sampled_from(vocab + ["zebra"])
    token = st.one_of(
        word,
        st.tuples(st.sampled_from("+-"), word).map(lambda t: t[0] + t[1]),
        st.tuples(word, st.sampled_from("+-"), word).map(
            lambda t: f"{t[0]}{t[1]}{t[2]}"
        ),
        st.tuples(word, word).map(lambda t: f'"{t[0]} {t[1]}"'),
        st.tuples(st.sampled_from("+-"), word, word).map(
            lambda t: f'{t[0]}"{t[1]} {t[2]}"'
        ),
        st.sampled_from(["+", "-"]),
    )
    qstrs = st.lists(token, min_size=1, max_size=4).map(" ".join)

    @settings(
        max_examples=int(_os.environ.get("WRS_SIMPLE_FUZZ_EXAMPLES", "150")),
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
        ],
    )
    @given(qs=qstrs)
    def run(qs):
        got = {u: sc for _, u, sc in ours.search_list(p.parse(qs), 100)}
        with wix.searcher() as ws:
            try:
                res = ws.search(wqp.parse(qs), limit=None)
            except Exception:
                res = ws.search(wqp.parse(qs), limit=None, optimize=False)
            expected = {h["url"]: h.score for h in res}
        assert set(got) == set(expected), qs
        for u, sc in expected.items():
            assert got[u] == _pt.approx(sc, rel=1e-6), (qs, u)

    run()
