"""Parser property fuzz vs the reference (VERDICT r4 #4): random query
strings from the grammar (fields, quotes, AND/OR/NOT/ANDNOT/ANDMAYBE,
ranges, boosts, wildcards, fuzzy) parsed by BOTH parsers and searched on
the same small corpus — url sets and per-url scores must match.

Score comparison is per-url (rel 1e-6) rather than rank-sequence, so
tie ORDER differences cannot flake the test while any real scoring or
matching divergence still fails it.  Reference quirks encountered by the
fuzz are pinned in test_parser.py-style goldens once found; none are
currently known for the grammar below.
"""

import os

import pytest
from hypothesis import HealthCheck, event, given, settings
from hypothesis import strategies as st

from tests.conftest import reference_importable

pytestmark = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)

VOCAB = [
    "alfa", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima",
]
OOV = ["zebra", "quux"]

# deterministic 30-doc corpus over a small vocabulary: every generated
# term has a real chance of matching, phrases occur, df varies
DOCS = [
    " ".join(
        VOCAB[(i * 7 + j * 3) % len(VOCAB)]
        for j in range(4 + (i % 5))
    )
    for i in range(30)
]

word = st.sampled_from(VOCAB + OOV)

leaf = st.one_of(
    word,
    word.map(lambda w: w + "~"),
    # explicit maxdist / prefixlength, and the dropped trailing boost
    st.tuples(word, st.integers(1, 2)).map(lambda t: f"{t[0]}~{t[1]}"),
    st.tuples(word, st.integers(1, 2), st.integers(1, 2)).map(
        lambda t: f"{t[0]}~{t[1]}/{t[2]}"
    ),
    st.tuples(word, st.integers(2, 3)).map(lambda t: f"{t[0]}~^{t[1]}"),
    word.map(lambda w: w[:3] + "*"),
    word.map(lambda w: w[0] + "?" + w[2:4] + "*"),
    st.tuples(word, st.integers(1, 3)).map(lambda t: f"{t[0]}^{t[1]}"),
    st.tuples(word, st.integers(2, 3)).map(lambda t: f"{t[0][:3]}*^{t[1]}"),
    st.tuples(word, word).map(lambda t: f'"{t[0]} {t[1]}"'),
    st.tuples(word, word, st.integers(1, 3)).map(
        lambda t: f'"{t[0]} {t[1]}"~{t[2]}'
    ),
    # phrase boosts, incl. the 1-word collapse dropping its boost
    st.tuples(word, word, st.integers(2, 3)).map(
        lambda t: f'"{t[0]} {t[1]}"^{t[2]}'
    ),
    st.tuples(word, word, st.integers(1, 2), st.integers(2, 3)).map(
        lambda t: f'"{t[0]} {t[1]}"~{t[2]}^{t[3]}'
    ),
    st.tuples(word, st.integers(2, 3)).map(lambda t: f'"{t[0]}"^{t[1]}'),
    st.tuples(word, word).map(
        lambda t: f"[{min(t)} TO {max(t)}]"
    ),
    st.tuples(word, word).map(
        lambda t: f"{{{min(t)} TO {max(t)}}}"
    ),
    # boosted and open-ended ranges
    st.tuples(word, word, st.integers(2, 3)).map(
        lambda t: f"[{min(t[:2])} TO {max(t[:2])}]^{t[2]}"
    ),
    word.map(lambda w: f"[{w} TO]"),
    word.map(lambda w: f"[TO {w}]"),
    # SingleQuotePlugin: 'two words' is one verbatim node whose analysis
    # builds the multitoken And; a trailing ^boost or ~fuzz DEFEATS the
    # squote regex (its (?=\s|...) lookahead), so those lex as plain
    # words — "'a b'^2" boosts only the trailing token (round-5 probes)
    st.tuples(word, word).map(lambda t: f"'{t[0]} {t[1]}'"),
    st.tuples(word, word, st.integers(2, 3)).map(
        lambda t: f"'{t[0]} {t[1]}'^{t[2]}"
    ),
    st.tuples(word, word, st.integers(1, 2)).map(
        lambda t: f"'{t[0]} {t[1]}'~{t[2]}"
    ),
    # EveryPlugin / bare-star Wildcard: '*' is the field's Every and
    # absorbs same-field And/Or siblings in normalize; '*:*' is the
    # unfielded Every absorbing the whole compound, boost dropped
    st.just("*"),
    st.just("*:*"),
    st.tuples(st.integers(2, 3)).map(lambda t: f"*^{t[0]}"),
)

expr = st.recursive(
    leaf,
    lambda inner: st.one_of(
        st.tuples(
            inner,
            st.sampled_from(
                [" AND ", " OR ", " ANDNOT ", " ANDMAYBE ", " NOT ",
                 " REQUIRE ", " "]
            ),
            inner,
        ).map(lambda t: f"{t[0]}{t[1]}{t[2]}"),
        inner.map(lambda s: f"({s})"),
        # boosted paren groups exercise the AndGroup merging splice
        # ("(a b)^2 AND c" boosts c — see test_merging_splice_goldens);
        # redundant parens make their own group and BLOCK the splice
        st.tuples(inner, st.integers(1, 3)).map(
            lambda t: f"({t[0]})^{t[1]}"
        ),
        st.tuples(inner, st.integers(2, 3)).map(
            lambda t: f"(({t[0]})^{t[1]})"
        ),
        st.tuples(inner, st.integers(2, 3), st.integers(2, 3)).map(
            lambda t: f"(({t[0]})^{t[1]})^{t[2]}"
        ),
        # only the real field: our parser routes unknown fields to the
        # default (test_known_fields_routing), the reference keeps them
        # and matches nothing — a documented deviation, not fuzz target
        inner.map(lambda s: f"text:({s})"),
        st.tuples(inner, st.integers(1, 3)).map(
            lambda t: f"text:({t[0]})^{t[1]}"
        ),
    ),
    max_leaves=5,
)


def _patch_reference_andnot():
    """Work around a REFERENCE bug so fuzz comparisons check intended
    semantics: AndNotMatcher._find_first (matching/binary.py:573-575)
    only runs the exclusion check when a.id() == b.id() at init — when
    the prohibited matcher starts at a LOWER docid than the required
    one, the first required document is never checked against b and
    leaks through (e.g. AndNot(Term(bravo), Or([alfa, bravo])) returns
    the first bravo doc).  Single-Term b-sides usually escape by luck.
    Pinned by test_reference_andnot_first_doc_leak below; our planner's
    anti-join implements the intended semantics."""
    from whoosh.matching.binary import AndNotMatcher

    def _find_first(self):
        if self.a.is_active() and self.b.is_active():
            if self.b.id() < self.a.id():
                self.b.skip_to(self.a.id())
            if self.b.is_active() and self.a.id() == self.b.id():
                self._find_next()

    AndNotMatcher._find_first = _find_first


@pytest.fixture(scope="module")
def fuzz_engines(spark, tmp_path_factory):
    from whoosh import fields, index

    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Searcher

    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True), text=fields.TEXT
    )
    d = tmp_path_factory.mktemp("whoosh_fuzz_ix")
    wix = index.create_in(str(d), schema)
    w = wix.writer()
    for i, text in enumerate(DOCS):
        w.add_document(url=f"d{i:02d}", text=text)
    w.commit()

    df = spark.createDataFrame(
        [(f"d{i:02d}", t) for i, t in enumerate(DOCS)],
        "url string, text string",
    )
    ours = Searcher(build_index(df).persist())
    return wix, ours


@settings(
    max_examples=int(os.environ.get("WRS_FUZZ_EXAMPLES", "300")),
    deadline=None,
    # deterministic in CI so suite outcome never depends on the draw
    # (VERDICT r5 #3); the env-gated soak explores fresh examples
    derandomize="WRS_FUZZ_EXAMPLES" not in os.environ,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(qs=expr)
def test_parsed_search_parity_fuzz(qs, fuzz_engines):
    from whoosh.qparser import FuzzyTermPlugin
    from whoosh.qparser import QueryParser as WQP
    from whoosh.query import Or as WOr

    from whoosh_reloaded_spark.query.parser import QueryParser

    WOr.matcher_type = WOr.DEFAULT_MATCHER
    _patch_reference_andnot()
    wix, ours = fuzz_engines

    # ours must never crash on a grammar-generated string
    q = QueryParser().parse(qs)
    got = {u: s for _, u, s in ours.search_list(q, 100)}

    with wix.searcher() as s:
        # FuzzyTermPlugin: our parser supports ~ syntax natively; the
        # reference needs the plugin enabled for the same grammar
        wqp = WQP("text", wix.schema)
        wqp.add_plugin(FuzzyTermPlugin())
        wq = wqp.parse(qs)
        try:
            hits = s.search(wq, limit=None)
            expected = {h["url"]: h.score for h in hits}
        except AssertionError:
            hits = s.search(wq, limit=None, optimize=False)
            expected = {h["url"]: h.score for h in hits}
        except Exception as e:  # reference itself crashed: record, skip
            event(f"reference raised {type(e).__name__}")
            return

    assert set(got) == set(expected), qs
    for u, sc in expected.items():
        assert got[u] == pytest.approx(sc, rel=1e-6), (qs, u)


def test_reference_andnot_first_doc_leak(fuzz_engines):
    """Pin the reference bug _patch_reference_andnot works around: with
    an Or b-side starting at a lower docid, the reference's unpatched
    AndNotMatcher leaks the first required-side document; our anti-join
    returns the intended empty set.  (If upstream ever fixes this, the
    first assertion fails and the workaround can be dropped.)"""
    from whoosh.matching.binary import AndNotMatcher
    from whoosh.query import AndNot as WAndNot
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WT

    from whoosh_reloaded_spark.query.ast import AndNot, Or, Term

    wix, ours = fuzz_engines
    # restore the original method for this test
    orig = AndNotMatcher._find_first
    try:
        def _unpatched(self):
            if (
                self.a.is_active()
                and self.b.is_active()
                and self.a.id() == self.b.id()
            ):
                self._find_next()

        AndNotMatcher._find_first = _unpatched
        with wix.searcher() as s:
            wq = WAndNot(
                WT("text", "bravo"),
                WOr([WT("text", "alfa"), WT("text", "bravo")]),
            )
            leaked = [h["url"] for h in s.search(wq, limit=None)]
        assert leaked == ["d01"]  # the bug: first bravo doc escapes
    finally:
        AndNotMatcher._find_first = orig

    q = AndNot(Term("bravo"), Or((Term("alfa"), Term("bravo"))))
    assert ours.search_list(q, 10) == []  # intended semantics


def test_multiterm_singleton_boost_drop_golden(fuzz_engines):
    """Pin the reference quirk the planner mirrors (planner.py _MultiTerm
    boost): MultiTerm.matcher builds boost-LESS Terms and returns qs[0]
    directly when the expansion is a single term (terms.py:221,227-228),
    silently dropping the query's own boost — while a multi-term
    expansion goes through Or(qs, boost), whose _tree_matcher applies it
    (compound.py:232-233).  Found by the round-5 parser fuzz
    ("(((alfa~)^2))").  If upstream ever fixes the discontinuity, the
    reference-side assertions fail and the mirror can be dropped."""
    from whoosh.qparser import FuzzyTermPlugin
    from whoosh.qparser import QueryParser as WQP

    from whoosh_reloaded_spark.query.parser import QueryParser

    wix, ours = fuzz_engines

    def ref_scores(qs):
        wqp = WQP("text", wix.schema)
        wqp.add_plugin(FuzzyTermPlugin())
        with wix.searcher() as s:
            return {
                h["url"]: h.score for h in s.search(wqp.parse(qs), limit=None)
            }

    def our_scores(qs):
        q = QueryParser().parse(qs)
        return {u: s for _, u, s in ours.search_list(q, 100)}

    # alfa~ expands to the single term {alfa} on this corpus: the
    # reference drops the ^2 entirely
    plain, boosted = ref_scores("alfa~"), ref_scores("(alfa~)^2")
    assert plain and boosted == plain
    # [alfa TO bravo] expands to {alfa, bravo}: the reference applies ^2
    rplain, rboosted = (
        ref_scores("[alfa TO bravo]"),
        ref_scores("([alfa TO bravo])^2"),
    )
    assert rplain and rboosted == {
        u: pytest.approx(2 * s, rel=1e-9) for u, s in rplain.items()
    }
    # ours mirrors both sides of the discontinuity
    for qs, expected in [
        ("(alfa~)^2", plain),
        ("([alfa TO bravo])^2", rboosted),
    ]:
        got = our_scores(qs)
        assert set(got) == set(expected), qs
        for u, sc in expected.items():
            assert got[u] == pytest.approx(sc, rel=1e-6), (qs, u)


# -- MultifieldParser fuzz (second surface: unfielded Or-expansion) ------------

MF_DOCS = [
    (f"m{i:02d}",
     " ".join(VOCAB[(i * 5 + j) % len(VOCAB)] for j in range(3)),
     " ".join(VOCAB[(i * 3 + j * 2) % len(VOCAB)] for j in range(5)))
    for i in range(25)
]

mf_leaf = st.one_of(
    word,
    st.tuples(st.sampled_from(["name", "value"]), word).map(
        lambda t: f"{t[0]}:{t[1]}"
    ),
    st.tuples(word, st.integers(1, 3)).map(lambda t: f"{t[0]}^{t[1]}"),
    st.tuples(st.sampled_from(["name", "value"]), word,
              st.integers(1, 3)).map(lambda t: f"{t[0]}:{t[1]}^{t[2]}"),
    st.tuples(word, word).map(lambda t: f'"{t[0]} {t[1]}"'),
    # squote whole-node expansion (Or of per-field Ands) vs the boosted
    # form that defeats the squote regex (And of per-token Ors)
    st.tuples(word, word).map(lambda t: f"'{t[0]} {t[1]}'"),
    st.tuples(word, word, st.integers(2, 3)).map(
        lambda t: f"'{t[0]} {t[1]}'^{t[2]}"
    ),
    st.just("*"),
    st.just("*:*"),
)

mf_expr = st.recursive(
    mf_leaf,
    lambda inner: st.one_of(
        st.tuples(
            inner,
            st.sampled_from([" AND ", " OR ", " ANDNOT ", " NOT ", " "]),
            inner,
        ).map(lambda t: f"{t[0]}{t[1]}{t[2]}"),
        inner.map(lambda s: f"({s})"),
        # boosted groups + fielded groups: the OrGroup/AndGroup merging
        # splice surface (test_merging_splice_goldens)
        st.tuples(inner, st.integers(1, 3)).map(
            lambda t: f"({t[0]})^{t[1]}"
        ),
        st.tuples(st.sampled_from(["name", "value"]), inner).map(
            lambda t: f"{t[0]}:({t[1]})"
        ),
    ),
    max_leaves=4,
)


@pytest.fixture(scope="module")
def mf_engines(spark, tmp_path_factory):
    from whoosh import fields, index

    from whoosh_reloaded_spark.multifield import (
        FieldSpec,
        MultiFieldSearcher,
        build_multi_index,
    )

    schema = fields.Schema(
        key=fields.ID(stored=True, unique=True),
        name=fields.TEXT,
        value=fields.TEXT,
    )
    d = tmp_path_factory.mktemp("whoosh_mf_fuzz")
    wix = index.create_in(str(d), schema)
    w = wix.writer()
    for key, name, value in MF_DOCS:
        w.add_document(key=key, name=name, value=value)
    w.commit()

    df = spark.createDataFrame(MF_DOCS, "key string, name string, value string")
    idx = build_multi_index(
        df,
        {"name": FieldSpec("name"), "value": FieldSpec("value")},
        uid_col="key",
    )
    for ix in idx.values():
        ix.persist()
    return wix, MultiFieldSearcher(idx, default_field="value")


@settings(
    max_examples=int(os.environ.get("WRS_MF_FUZZ_EXAMPLES", "150")),
    deadline=None,
    derandomize="WRS_MF_FUZZ_EXAMPLES" not in os.environ,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(qs=mf_expr)
def test_multifield_parsed_parity_fuzz(qs, mf_engines):
    from whoosh.qparser import MultifieldParser as WMFP
    from whoosh.query import Or as WOr

    from whoosh_reloaded_spark.query.parser import MultifieldParser

    WOr.matcher_type = WOr.DEFAULT_MATCHER
    _patch_reference_andnot()
    wix, ours = mf_engines

    q = MultifieldParser(["name", "value"]).parse(qs)
    got = {u: s for _, u, s in ours.search_list(q, 100)}

    with wix.searcher() as s:
        wq = WMFP(["name", "value"], wix.schema).parse(qs)
        try:
            expected = {
                h["key"]: h.score for h in s.search(wq, limit=None)
            }
        except AssertionError:
            expected = {
                h["key"]: h.score
                for h in s.search(wq, limit=None, optimize=False)
            }
        except Exception as e:
            event(f"reference raised {type(e).__name__}")
            return

    assert set(got) == set(expected), qs
    for u, sc in expected.items():
        assert got[u] == pytest.approx(sc, rel=1e-6), (qs, u)


def _patch_reference_coord():
    """Work around a REFERENCE scoring artifact so the or-mode fuzz
    checks intended SQR semantics: CoordMatcher._replacement
    (matching/wrappers.py:546-547) rebuilds with a termcount recomputed
    from the REPLACED (partially exhausted) tree, so once the last term
    matcher dies mid-iteration the survivors score with termcount 0 —
    docs with IDENTICAL content score differently depending on their
    docid relative to matcher exhaustion (pinned by
    test_reference_coord_exhaustion_artifact).  Freeze the
    construction-time termcount instead; our planner's SQR uses the
    construction-time live-tree count throughout."""
    from whoosh.matching.wrappers import CoordMatcher

    if not hasattr(CoordMatcher, "_replacement_pristine"):
        CoordMatcher._replacement_pristine = CoordMatcher._replacement

    def _replacement(self, newchild):
        m = self.__class__(newchild, scale=self._scale)
        m._termcount = self._termcount
        return m

    CoordMatcher._replacement = _replacement


@settings(
    max_examples=int(os.environ.get("WRS_OR_FUZZ_EXAMPLES", "150")),
    deadline=None,
    derandomize="WRS_OR_FUZZ_EXAMPLES" not in os.environ,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(qs=expr)
def test_orgroup_parsed_search_parity_fuzz(qs, fuzz_engines):
    """Same grammar, or-by-default parsers: QueryParser(group='or') with
    the coordination scale vs the reference QueryParser(group=
    OrGroup.factory(0.9)) — juxtaposition/parens/multitoken all group Or,
    explicit AND still Ands, the top wrap carries the scale."""
    from whoosh.qparser import FuzzyTermPlugin, OrGroup
    from whoosh.qparser import QueryParser as WQP
    from whoosh.query import Or as WOr

    from whoosh_reloaded_spark.query.parser import QueryParser

    WOr.matcher_type = WOr.DEFAULT_MATCHER
    _patch_reference_andnot()
    _patch_reference_coord()
    wix, ours = fuzz_engines

    q = QueryParser(group="or", group_scale=0.9).parse(qs)
    got = {u: s for _, u, s in ours.search_list(q, 100)}

    with wix.searcher() as s:
        wqp = WQP("text", wix.schema, group=OrGroup.factory(0.9))
        wqp.add_plugin(FuzzyTermPlugin())
        wq = wqp.parse(qs)
        try:
            hits = s.search(wq, limit=None)
            expected = {h["url"]: h.score for h in hits}
        except AssertionError:
            hits = s.search(wq, limit=None, optimize=False)
            expected = {h["url"]: h.score for h in hits}
        except Exception as e:
            event(f"reference raised {type(e).__name__}")
            return

    assert set(got) == set(expected), qs
    for u, sc in expected.items():
        assert got[u] == pytest.approx(sc, rel=1e-6), (qs, u)


def test_reference_coord_exhaustion_artifact(fuzz_engines):
    """Pin the reference artifact _patch_reference_coord works around:
    in a scaled Or, docs visited AFTER every term matcher is exhausted
    score with a REBUILT termcount of 0 (CoordMatcher._replacement,
    wrappers.py:546-547) — so two docs with identical term content
    score differently depending on docid.  If upstream ever freezes the
    construction-time termcount, the inequality below fails and the
    workaround can be dropped."""
    from whoosh.qparser import OrGroup
    from whoosh.qparser import QueryParser as WQP

    wix, ours = fuzz_engines
    wqp = WQP("text", wix.schema, group=OrGroup.factory(0.9))
    # d11 and d29 both contain NONE of alfa/hotel/kilo, yet the
    # unpatched reference scores d29 (past the last hotel doc d28) with
    # the degenerate rebuilt termcount
    import whoosh.matching.wrappers as ww

    # the or-mode fuzz may already have patched _replacement globally;
    # run this probe against the PRISTINE reference method
    orig = ww.CoordMatcher._replacement
    pristine = getattr(
        ww.CoordMatcher, "_replacement_pristine", orig
    )
    ww.CoordMatcher._replacement = pristine
    try:
        q = wqp.parse('alfa NOT "hotel kilo"')
        with wix.searcher() as s:
            res = {h["url"]: h.score for h in s.search(q, limit=None)}
        assert res["d29"] == 0.0  # the artifact
        assert res["d11"] > 0.0  # identical content, different score
    finally:
        ww.CoordMatcher._replacement = orig

    # our planner scores identical content identically (frozen tc)
    from whoosh_reloaded_spark.query.parser import QueryParser

    oq = QueryParser(group="or", group_scale=0.9).parse(
        'alfa NOT "hotel kilo"'
    )
    got = {u: sc for _, u, sc in ours.search_list(oq, 100)}
    assert got["d29"] == pytest.approx(got["d11"], rel=1e-9)


def test_orgroup_boost_inside_sqr_golden(fuzz_engines):
    """Round-5 or-mode fuzz find, pinned (VERDICT r5 #1): the Or node's
    boost applies INSIDE the SQR coordination formula — the reference
    wraps WrappingMatcher(m, boost) first (_tree_matcher) and
    CoordMatcher outside it (DefaultOr._matcher), so the per-doc bonus
    (matching-1)/(termcount-scale)^2 is NOT multiplied by the boost.
    Repro: a boosted squote multitoken (duplicate term, different
    boosts) nested under And; d12 scored 11.8446 ours vs 11.4314
    reference before the fix (diff = bonus*factor*(boost-1))."""
    from whoosh.qparser import FuzzyTermPlugin, OrGroup
    from whoosh.qparser import QueryParser as WQP
    from whoosh.query import Or as WOr

    from whoosh_reloaded_spark.query.parser import QueryParser

    WOr.matcher_type = WOr.DEFAULT_MATCHER
    _patch_reference_andnot()
    _patch_reference_coord()
    wix, ours = fuzz_engines

    qs = "text:(alfa AND ('alfa alfa'^2)^2)"
    q = QueryParser(group="or", group_scale=0.9).parse(qs)
    got = {u: s for _, u, s in ours.search_list(q, 100)}

    with wix.searcher() as s:
        wqp = WQP("text", wix.schema, group=OrGroup.factory(0.9))
        wqp.add_plugin(FuzzyTermPlugin())
        expected = {
            h["url"]: h.score for h in s.search(wqp.parse(qs), limit=None)
        }

    assert set(got) == set(expected)
    for u, sc in expected.items():
        assert got[u] == pytest.approx(sc, rel=1e-6), u
    # the round-5 absolute value, so this golden also guards the
    # reference side of the comparison
    assert got["d12"] == pytest.approx(11.431384739246685, rel=1e-9)


def test_orgroup_termless_andnot_side_golden(fuzz_engines):
    """Round-6 or-mode soak find, pinned: scaled-Or SQR `matching` count
    for an AndNot child whose a side is term-less (Every).  At an
    AndNot-matched doc the prohibited side's cursor is elsewhere and
    Every carries no term, so matching = 0 — the reference scores
    (1 + (0-1)/(2-0.9)^2) * (2-1)/2 = 0.086777 at alfa-less docs; we
    previously fell back to a constant count that included the
    prohibited side's term (scoring 0.5)."""
    from whoosh.qparser import FuzzyTermPlugin, OrGroup
    from whoosh.qparser import QueryParser as WQP
    from whoosh.query import Or as WOr

    from whoosh_reloaded_spark.query.parser import QueryParser

    WOr.matcher_type = WOr.DEFAULT_MATCHER
    _patch_reference_andnot()
    _patch_reference_coord()
    wix, ours = fuzz_engines

    qs = "* ANDNOT 'alfa alfa'^2"
    q = QueryParser(group="or", group_scale=0.9).parse(qs)
    got = {u: s for _, u, s in ours.search_list(q, 100)}

    with wix.searcher() as s:
        wqp = WQP("text", wix.schema, group=OrGroup.factory(0.9))
        wqp.add_plugin(FuzzyTermPlugin())
        expected = {
            h["url"]: h.score for h in s.search(wqp.parse(qs), limit=None)
        }

    assert set(got) == set(expected)
    for u, sc in expected.items():
        assert got[u] == pytest.approx(sc, rel=1e-6), u
    # alfa-less docs score with matching = 0, not the constant fallback
    assert got["d01"] == pytest.approx(0.08677685950413228, rel=1e-9)
