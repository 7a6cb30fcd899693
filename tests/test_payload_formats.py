"""PositionBoosts / Characters / CharacterBoosts posting formats: golden
parity of the decoded payload tuples vs the reference formats
(formats.py:273-470), plus save/load roundtrip and the Searcher.payloads
accessor."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import reference_importable
from whoosh_reloaded_spark.analysis import StandardAnalyzer
from whoosh_reloaded_spark.index import build_index, load_index, save_index
from whoosh_reloaded_spark.query import Phrase, Searcher, Term

pytestmark = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)

BOOST_TEXTS = [
    "image render^2 file^0.5 render",
    "alpha^3 beta gamma^1.5 beta^2 alpha",
    "plain words only here",
    "edge^ trailing^2.0 mixed^x keep",
]
WS_PATTERN = r"[^ \t\r\n]+"


def _ref_ana():
    from whoosh.analysis import (
        DelimitedAttributeFilter,
        LowercaseFilter,
        RegexTokenizer,
    )

    return (
        RegexTokenizer(WS_PATTERN)
        | DelimitedAttributeFilter()
        | LowercaseFilter()
    )


def _golden(fmt, decode, texts):
    """docidx -> term -> (freq, weight, decoded payload tuples)."""
    out = {}
    for i, text in enumerate(texts):
        for w, freq, weight, value in fmt.word_values(text, _ref_ana()):
            out.setdefault(i, {})[w] = (freq, weight, decode(value))
    return out


def _ours(spark, format, texts):
    df = spark.createDataFrame(
        [(i, str(i), t) for i, t in enumerate(texts)],
        "docid long, url string, text string",
    )
    ana = StandardAnalyzer(WS_PATTERN, stoplist=None, minsize=0)
    ix = build_index(
        df, uid_col="url", text_col="text", analyzer=ana,
        format=format, boost_delim="^", with_docids=True,
    )
    return ix


def test_position_boosts_golden(spark):
    """Decoded (pos, boost) pairs, tf and weight match the reference
    PositionBoosts format (formats.py:345-408) token for token — including
    the unparseable-suffix rows only where the reference doesn't raise."""
    from whoosh import formats

    fmt = formats.PositionBoosts()
    # drop the unparseable-boost doc: the reference raises on float("")/
    # float("x"); we keep the token at boost 1.0 (documented divergence)
    texts = BOOST_TEXTS[:3]
    golden = _golden(fmt, fmt.decode_position_boosts, texts)

    ix = _ours(spark, "position_boosts", texts)
    rows = ix.postings.select(
        "docid", "term", "tf", "weight", "positions", "pos_boosts"
    ).collect()
    ours = {}
    for r in rows:
        assert len(r["positions"]) == len(r["pos_boosts"]) == r["tf"]
        ours.setdefault(r["docid"], {})[r["term"]] = (
            r["tf"],
            r["weight"],
            list(zip(r["positions"], r["pos_boosts"])),
        )
    assert ours == golden


def test_character_boosts_golden(spark):
    """Decoded (pos, startchar, endchar, boost) quadruples match the
    reference CharacterBoosts format (formats.py:411-470)."""
    from whoosh import formats

    fmt = formats.CharacterBoosts()
    texts = BOOST_TEXTS[:3]
    golden = _golden(fmt, fmt.decode_character_boosts, texts)

    ix = _ours(spark, "character_boosts", texts)
    rows = ix.postings.collect()
    ours = {}
    for r in rows:
        quads = list(
            zip(r["positions"], r["startchars"], r["endchars"],
                r["pos_boosts"])
        )
        ours.setdefault(r["docid"], {})[r["term"]] = (
            r["tf"], r["weight"], quads
        )
    assert ours == golden


def test_characters_default_analyzer_matches_char_spans(spark):
    """format='characters' under the default StandardAnalyzer stores the
    same (pos, startchar, endchar) triples chars.char_spans computes (which
    are themselves golden-tested byte-identical to the reference)."""
    from whoosh_reloaded_spark.chars import char_spans
    from whoosh_reloaded_spark.corpus import generate_rows

    texts = [t for _, _, _, t, _ in generate_rows(20)]
    df = spark.createDataFrame(
        [(i, str(i), t) for i, t in enumerate(texts)],
        "docid long, url string, text string",
    )
    ix = build_index(
        df, uid_col="url", text_col="text", format="characters",
        with_docids=True,
    )
    rows = ix.postings.collect()
    ours = {}
    for r in rows:
        for p, sc, ec in zip(r["positions"], r["startchars"],
                             r["endchars"]):
            ours.setdefault(r["docid"], {}).setdefault(
                r["term"], []
            ).append((p, sc, ec))
    for d in ours.values():
        for v in d.values():
            v.sort()
    for i, t in enumerate(texts):
        exp = {}
        for term, pos, sc, ec in char_spans(t):
            exp.setdefault(term, []).append((pos, sc, ec))
        assert ours.get(i, {}) == exp, i


def test_payload_index_queries_and_roundtrip(spark, tmp_path):
    """Payload columns survive save/load (with a position codec applied to
    positions only), phrase queries still run, BM25 weight folds the
    boosts, and Searcher.payloads exposes the aligned arrays."""
    texts = BOOST_TEXTS[:3] + ["mary had a little lamb"]
    df = spark.createDataFrame(
        [(i, str(i), t) for i, t in enumerate(texts)],
        "docid long, url string, text string",
    )
    ana = StandardAnalyzer(WS_PATTERN, stoplist=None, minsize=0)
    ix = build_index(
        df, uid_col="url", text_col="text", analyzer=ana,
        format="character_boosts", boost_delim="^", with_docids=True,
    )
    path = str(tmp_path / "ix_payload")
    save_index(ix, path, codec="jvmdelta")
    s = Searcher(load_index(spark, path))

    hits = s.search(Phrase(["little", "lamb"]), limit=5).collect()
    assert [h["uid"] for h in hits] == ["3"]

    # boosted term outscores tf alone: doc0 has render tf=2 with one ^2
    pay = {r["docid"]: r for r in s.payloads("render").collect()}
    assert pay[0]["tf"] == 2 and pay[0]["weight"] == pytest.approx(3.0)
    assert list(pay[0]["pos_boosts"]) == [2.0, 1.0]
    assert len(pay[0]["startchars"]) == 2
    # positions decoded back to absolute after the jvmdelta roundtrip
    assert list(pay[0]["positions"]) == [1, 3]

    # a Term search over the boosted index ranks doc0 first for render
    top = s.search(Term("render"), limit=2).collect()
    assert top[0]["uid"] == "0"
