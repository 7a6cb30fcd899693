"""Parser golden tests: parsed-string queries must produce the same search
RESULTS as the reference QueryParser + Searcher on the same corpus."""

import pytest

from tests.conftest import reference_importable
from whoosh_reloaded_spark.query.parser import QueryParser
from whoosh_reloaded_spark.query import ast as Q

# pure-AST structure tests (no reference needed)


def test_parse_structures():
    p = QueryParser()
    assert p.parse("render") == Q.Term("render")
    assert p.parse("render yellow") == Q.And((Q.Term("render"), Q.Term("yellow")))
    assert p.parse("render OR yellow") == Q.Or((Q.Term("render"), Q.Term("yellow")))
    assert p.parse("render NOT yellow") == Q.And((Q.Term("render"), Q.Not(Q.Term("yellow"))))
    assert p.parse('"quick went"') == Q.Phrase(("quick", "went"))
    assert p.parse("render^2") == Q.Term("render", boost=2.0)
    assert p.parse("rend*") == Q.Prefix("rend")  # wildcard normalizes
    assert p.parse("re?der") == Q.Wildcard("re?der")
    assert p.parse("[re TO rf]") == Q.TermRange("re", "rf")
    assert p.parse("{re TO rf}") == Q.TermRange("re", "rf", startexcl=True, endexcl=True)
    assert p.parse("render~") == Q.FuzzyTerm("render")
    assert p.parse("render ANDNOT yellow") == Q.AndNot(Q.Term("render"), Q.Term("yellow"))
    assert p.parse("render ANDMAYBE yellow") == Q.AndMaybe(Q.Term("render"), Q.Term("yellow"))
    assert p.parse("(render OR yellow) red") == Q.And(
        (Q.Or((Q.Term("render"), Q.Term("yellow"))), Q.Term("red"))
    )
    # stop words vanish from query text like the reference parser
    assert p.parse("the render") == Q.Term("render")
    assert p.parse("field:render") == Q.Term("render")


# result-level golden tests vs the reference parser + searcher

pytestmark_golden = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)

PARSE_CASES = [
    "render",
    "render yellow",
    "render OR yellow OR red",
    "render NOT yellow",
    '"quick went"',
    "yellow render^2",
    "render* red",
    "[re TO rf]",
    "(yellow OR alpha) AND red",
    "red ANDNOT yellow",
    "red ANDMAYBE yellow",
]


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    from whoosh import fields, index

    from whoosh_reloaded_spark.corpus import PAGES_SCHEMA, generate_rows
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Searcher

    rows = list(generate_rows(250))
    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True), text=fields.TEXT
    )
    d = tmp_path_factory.mktemp("whoosh_pix")
    wix = index.create_in(str(d), schema)
    w = wix.writer()
    for url, ts, html, text, lang in rows:
        w.add_document(url=url, text=text)
    w.commit()

    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    ours = Searcher(build_index(df).persist())
    return wix, ours


@pytestmark_golden
@pytest.mark.parametrize("qs", PARSE_CASES)
def test_parsed_query_results_match(qs, engines):
    from whoosh.qparser import QueryParser as WQP
    from whoosh.query import Or as WOr

    WOr.matcher_type = WOr.DEFAULT_MATCHER  # large-index strategy (see
    # test_search_parity.whoosh_topk for why)
    wix, ours = engines
    with wix.searcher() as s:
        wq = WQP("text", wix.schema).parse(qs)
        try:
            expected = [(h["url"], h.score) for h in s.search(wq, limit=10)]
        except AssertionError:
            expected = [
                (h["url"], h.score) for h in s.search(wq, limit=10, optimize=False)
            ]
    got = [
        (uid, score) for _, uid, score in ours.search_list(QueryParser().parse(qs), 10)
    ]
    assert [u for u, _ in got] == [u for u, _ in expected], qs
    for (u1, s1), (u2, s2) in zip(got, expected):
        assert s1 == pytest.approx(s2, rel=1e-9), (qs, u1)


def test_parse_degenerate_inputs():
    p = QueryParser()
    assert p.parse("") == Q.NullQuery()
    assert p.parse("   ") == Q.NullQuery()
    assert p.parse("the a an") == Q.NullQuery()  # all stop words
    assert p.parse("render AND") == Q.Term("render")  # dangling operator
    assert p.parse("(((") == Q.NullQuery()
    assert p.parse('"unclosed phrase') is not None  # no crash


def test_known_fields_routing():
    p = QueryParser("value", known_fields={"name", "value"})
    assert p.parse("name:yellow") == Q.Term("yellow", "name")
    assert p.parse("value:red") == Q.Term("red", "value")
    assert p.parse("other:red") == Q.Term("red", "value")  # unknown -> default
    assert p.parse("name:yellow AND red") == Q.And(
        (Q.Term("yellow", "name"), Q.Term("red", "value"))
    )


def test_variations_generator_parity():
    """Byte-parity of the LiteMorph engine vs the reference generator over a
    word sample (the 3k-word fuzz runs in CI spirit; keep a fast subset)."""
    import pytest

    from tests.conftest import reference_importable

    if not reference_importable():
        pytest.skip("reference not importable")
    from whoosh.lang.morph_en import variations as ref_var

    from whoosh_reloaded_spark.variations import variations as our_var

    for w in ["render", "pull", "data", "tries", "happiness", "tokenizes",
              "judges", "quickly", "happily", "schema", "datum", "arise",
              "analysis", "fully", "spy", "betray", "fix", "unflag", "bed",
              "toccata", "full", "spoon", "business", "kiss", "crisis"]:
        assert set(ref_var(w)) == set(our_var(w)), w
