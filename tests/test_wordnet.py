"""Wordnet Thesaurus analogue (reference lang/wordnet.py:40-241):
parse/synonyms golden parity vs the reference on a wn_s.pl fixture,
parquet storage roundtrip, and Or-expansion search."""

import io

import pytest

from tests.conftest import reference_importable
from whoosh_reloaded_spark.wordnet import Thesaurus, parse_file, synonyms

# wn_s.pl-shaped fixture: synsets for hail/acclaim/herald/come, a
# non-alpha entry that must be skipped, and a non-s( line
WN_FIXTURE = """\
s(200001742,1,'hail',v,1,0).
s(200001742,2,'acclaim',v,1,4).
s(200001742,3,'herald',v,2,1).
s(200002325,1,'hail',v,2,0).
s(200002325,2,'come',v,11,5).
s(200003000,1,'well-known',a,1,0).
s(200003000,2,'famous',a,1,2).
sk(200001742,1,'hail%2:32:01::').
s(200004000,1,'Light',n,1,0).
s(200004000,2,'illumination',n,1,0).
"""


def test_parse_and_synonyms_golden_vs_reference():
    """word2nums/num2words and synonyms() match the reference parser on
    the same fixture bytes (reference wordnet.py:40-96)."""
    if not reference_importable():
        pytest.skip("reference not importable")
    from whoosh.lang import wordnet as ref

    ours_w2n, ours_n2w = parse_file(io.StringIO(WN_FIXTURE))
    ref_w2n, ref_n2w = ref.parse_file(io.StringIO(WN_FIXTURE))
    assert dict(ours_w2n) == dict(ref_w2n)
    assert dict(ours_n2w) == dict(ref_n2w)
    for w in list(ours_w2n) + ["missing"]:
        assert synonyms(ours_w2n, ours_n2w, w) == ref.synonyms(
            ref_w2n, ref_n2w, w
        )


def test_thesaurus_semantics():
    """hail -> acclaim, come, herald (the reference's own doctest shape);
    'well-known' skipped (isalpha); 'Light' lowercased."""
    t = Thesaurus.from_file(io.StringIO(WN_FIXTURE))
    assert t.synonyms("hail") == ["acclaim", "come", "herald"]
    assert t.synonyms("HAIL") == ["acclaim", "come", "herald"]
    assert t.synonyms("famous") == []  # well-known was skipped
    assert t.synonyms("light") == ["illumination"]
    assert t.synonyms("nope") == []


def test_thesaurus_bytes_and_filename(tmp_path):
    p = tmp_path / "wn_s.pl"
    p.write_bytes(WN_FIXTURE.encode())
    t = Thesaurus.from_filename(str(p))
    assert t.synonyms("acclaim") == ["hail", "herald"]


def test_thesaurus_storage_roundtrip(spark, tmp_path):
    """to_storage -> from_storage preserves every lookup (reference
    wordnet.py:189-228 THES-index analogue, parquet-backed)."""
    t = Thesaurus.from_file(io.StringIO(WN_FIXTURE))
    path = str(tmp_path / "thes")
    t.to_storage(spark, path)
    t2 = Thesaurus.from_storage(spark, path)
    for w in ["hail", "acclaim", "come", "herald", "light", "illumination"]:
        assert t2.synonyms(w) == t.synonyms(w)
    df = t2.to_dataframe(spark)
    assert df.columns == ["word", "syns"]
    # hail acclaim herald come famous light illumination ('well-known'
    # itself skipped by isalpha, but 'famous' still parses)
    assert df.count() == 7


def test_expand_search(spark):
    """expand() builds Or([Term(word), Term(syns)...]) and finds docs
    containing only a synonym of the query word."""
    from whoosh_reloaded_spark.index import build_index
    from whoosh_reloaded_spark.query import Searcher
    from whoosh_reloaded_spark.query.ast import Or, Term

    t = Thesaurus.from_file(io.StringIO(WN_FIXTURE))
    q = t.expand("hail")
    assert isinstance(q, Or)
    assert [c.text for c in q.children] == [
        "hail", "acclaim", "come", "herald"
    ]
    # single-term fallback
    assert isinstance(t.expand("illumination"), Or)
    assert isinstance(t.expand("nope"), Term)

    df = spark.createDataFrame(
        [
            ("d0", "the crowd began to acclaim the victor"),
            ("d1", "storms may hail in april"),
            ("d2", "nothing relevant here"),
        ],
        "url string, text string",
    )
    s = Searcher(build_index(df))
    hits = {r["uid"] for r in s.search(t.expand("hail"), limit=10).collect()}
    assert hits == {"d0", "d1"}
