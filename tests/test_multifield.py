"""Multi-field golden parity vs the reference's two-field schema
(the test_searching.make_index shape: name=TEXT / value=TEXT)."""

import pytest

from tests.conftest import reference_importable
from whoosh_reloaded_spark.multifield import (
    FieldSpec,
    MultiFieldSearcher,
    build_multi_index,
)
from whoosh_reloaded_spark.query import And, Or, Phrase, Term

pytestmark = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)

# the reference's canonical 5-doc two-field fixture (test_searching.py:12-27)
DOCS = [
    ("A", "Yellow brown", "Blue red green render purple?"),
    ("B", "Alpha beta", "Gamma delta epsilon omega."),
    ("C", "One two", "Three rendered four five."),
    ("D", "Quick went", "Every red town."),
    ("E", "Yellow uptown", "Interest rendering outer photo!"),
]
# pad with generated two-field docs so stats aren't trivial
import random

rng = random.Random(7)
WORDS = "yellow red render town quick alpha brown blue green photo outer".split()
for i in range(60):
    DOCS.append(
        (
            f"Z{i:03d}",
            " ".join(rng.choices(WORDS, k=4)),
            " ".join(rng.choices(WORDS, k=9)),
        )
    )


@pytest.fixture(scope="module")
def whoosh_ix(tmp_path_factory):
    from whoosh import fields, index

    schema = fields.Schema(
        key=fields.ID(stored=True, unique=True),
        name=fields.TEXT,
        value=fields.TEXT,
    )
    d = tmp_path_factory.mktemp("whoosh_mf")
    ix = index.create_in(str(d), schema)
    w = ix.writer()
    for key, name, value in DOCS:
        w.add_document(key=key, name=name, value=value)
    w.commit()
    return ix


@pytest.fixture(scope="module")
def ours(spark):
    df = spark.createDataFrame(DOCS, "key string, name string, value string")
    idx = build_multi_index(
        df,
        {"name": FieldSpec("name"), "value": FieldSpec("value")},
        uid_col="key",
    )
    for ix in idx.values():
        ix.persist()
    return MultiFieldSearcher(idx, default_field="value")


def _theirs(whoosh_ix, wq, limit=10):
    from whoosh.query import Or as WOr

    WOr.matcher_type = WOr.DEFAULT_MATCHER
    with whoosh_ix.searcher() as s:
        try:
            return [(h["key"], h.score) for h in s.search(wq, limit=limit)]
        except AssertionError:
            return [
                (h["key"], h.score)
                for h in s.search(wq, limit=limit, optimize=False)
            ]


def _compare(ours_s, q, whoosh_ix, wq, name):
    got = [(u, sc) for _, u, sc in ours_s.search_list(q, 10)]
    expected = _theirs(whoosh_ix, wq)
    assert [u for u, _ in got] == [u for u, _ in expected], name
    for (u1, s1), (u2, s2) in zip(got, expected):
        assert s1 == pytest.approx(s2, rel=1e-9), (name, u1)


def test_fielded_term(ours, whoosh_ix):
    from whoosh.query import Term as WT

    _compare(ours, Term("yellow", "name"), whoosh_ix, WT("name", "yellow"),
             "name:yellow")
    _compare(ours, Term("red", "value"), whoosh_ix, WT("value", "red"),
             "value:red")


def test_cross_field_or(ours, whoosh_ix):
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WT

    _compare(
        ours,
        Or((Term("yellow", "name"), Term("red", "value"))),
        whoosh_ix,
        WOr([WT("name", "yellow"), WT("value", "red")]),
        "name:yellow OR value:red",
    )


def test_cross_field_and(ours, whoosh_ix):
    from whoosh.query import And as WAnd
    from whoosh.query import Term as WT

    _compare(
        ours,
        And((Term("yellow", "name"), Term("red", "value"))),
        whoosh_ix,
        WAnd([WT("name", "yellow"), WT("value", "red")]),
        "name:yellow AND value:red",
    )


def test_fielded_phrase(ours, whoosh_ix):
    from whoosh.query import Phrase as WPhrase

    _compare(
        ours,
        Phrase(("quick", "went"), "name"),
        whoosh_ix,
        WPhrase("name", ["quick", "went"]),
        'name:"quick went"',
    )


def test_glob_dynamic_fields(spark):
    """Dynamic glob fields (fields.py:1447-1452 / tests/test_flexible.py):
    '*_text' expands to every matching corpus column, each searchable as
    its own field."""
    from whoosh_reloaded_spark.multifield import (
        FieldSpec,
        MultiFieldSearcher,
        build_multi_index_glob,
    )
    from whoosh_reloaded_spark.query import Term

    rows = [
        ("u0", "alpha body words", "title alpha here", "ignored"),
        ("u1", "bravo body words", "charlie title words", "ignored"),
        ("u2", "alpha charlie body", "bravo in title", "ignored"),
    ]
    df = spark.createDataFrame(
        rows, "url string, body_text string, title_text string, other string"
    )
    idxs = build_multi_index_glob(
        df, {"*_text": FieldSpec(text_col="")}, uid_col="url"
    )
    assert set(idxs) == {"body_text", "title_text"}
    s = MultiFieldSearcher(idxs, default_field="body_text")
    got = {u for _, u, _ in s.search_list(Term("alpha", "title_text"), 10)}
    assert got == {"u0"}
    got2 = {u for _, u, _ in s.search_list(Term("alpha", "body_text"), 10)}
    assert got2 == {"u0", "u2"}
