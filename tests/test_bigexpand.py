"""Golden parity for OVERFLOWING multiterm expansions (> TOO_MANY_CLAUSES).

The reference expands multiterm queries FULLY (terms.py:293-307) — its
TOO_MANY_CLAUSES is an Or *strategy* threshold (compound.py:282), not a
result cap.  Round 2 silently truncated expansions at 1,025 terms; these
tests build a lexicon with >1,024 terms under one prefix and assert

  * expand_terms reports overflow (returns None) so _eval switches to the
    relational postings<->lexicon-frame join plan, and
  * that plan's hit COUNT and top-10 (docid, score) are rank/score-identical
    to the reference's fully-expanded results.
"""

import datetime

import pytest

from tests.conftest import reference_importable
from whoosh_reloaded_spark.corpus import PAGES_SCHEMA
from whoosh_reloaded_spark.index import build_index
from whoosh_reloaded_spark.query import (
    Prefix,
    Searcher,
    TermRange,
    Wildcard,
)
from whoosh_reloaded_spark.query.planner import TOO_MANY_CLAUSES

pytestmark = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)

N_DOCS = 1400  # > TOO_MANY_CLAUSES distinct zz-prefixed terms
LIMIT = 10


def _rows():
    ts = datetime.datetime(2020, 1, 1)
    rows = []
    for i in range(N_DOCS):
        # each doc: one unique zz-term + shared filler whose frequency
        # varies so scores differ across docs (tie-break also exercised)
        uniq = f"zz{i:05d}"
        filler = " ".join(["common"] * (1 + i % 7) + ["alfa"] * (i % 3))
        text = f"{uniq} {filler}"
        rows.append((f"http://x/{i:05d}", ts, b"", text, "en"))
    return rows


@pytest.fixture(scope="module")
def both(spark, tmp_path_factory):
    rows = _rows()
    from whoosh import fields, index

    schema = fields.Schema(
        url=fields.ID(stored=True, unique=True), text=fields.TEXT
    )
    d = tmp_path_factory.mktemp("whoosh_big")
    wix = index.create_in(str(d), schema)
    w = wix.writer()
    for url, ts, html, text, lang in rows:
        w.add_document(url=url, text=text)
    w.commit()

    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    ours = Searcher(build_index(df).persist())
    return ours, wix


def _whoosh_res(wix, wq, limit):
    from whoosh.query import Or as WOr

    WOr.matcher_type = WOr.DEFAULT_MATCHER
    with wix.searcher() as s:
        res = s.search(wq, limit=limit, optimize=False)
        return len(res), [(h["url"], h.score) for h in res]


def _ours_res(searcher, q, limit):
    hits = searcher.search(q, limit=None)
    total = hits.count()
    top = [
        (uid, score) for _, uid, score in searcher.search_list(q, limit)
    ]
    return total, top


def _assert_parity(ours, theirs, name):
    assert ours[0] == theirs[0], f"{name}: hit-count {ours[0]} != {theirs[0]}"
    assert [u for u, _ in ours[1]] == [u for u, _ in theirs[1]], (
        f"{name}: rank mismatch\nours:   {ours[1]}\ntheirs: {theirs[1]}"
    )
    for (u1, s1), (u2, s2) in zip(ours[1], theirs[1]):
        assert s1 == pytest.approx(s2, rel=1e-9), f"{name}: score at {u1}"


def test_overflow_detected(both):
    ours, _ = both
    assert ours.expand_terms(Prefix("zz")) is None
    # count path still exact, fully distributed
    assert ours._multiterm_frame(Prefix("zz")).count() == N_DOCS


def test_small_expansion_still_list(both):
    ours, _ = both
    terms = ours.expand_terms(Prefix("zz0000"))
    assert terms == [f"zz0000{i}" for i in range(10)]


def test_prefix_overflow_parity(both):
    ours, wix = both
    from whoosh.query import Prefix as WPrefix

    _assert_parity(
        _ours_res(ours, Prefix("zz"), LIMIT),
        _whoosh_res(wix, WPrefix("text", "zz"), LIMIT),
        "prefix_overflow",
    )


def test_wildcard_overflow_parity(both):
    ours, wix = both
    from whoosh.query import Wildcard as WWildcard

    # '?????' keeps it a true wildcard (not prefix-normalizable) while
    # matching all 1400 zz-terms -> overflow
    _assert_parity(
        _ours_res(ours, Wildcard("zz?????"), LIMIT),
        _whoosh_res(wix, WWildcard("text", "zz?????"), LIMIT),
        "wildcard_overflow",
    )


def test_termrange_overflow_parity(both):
    ours, wix = both
    from whoosh.query import TermRange as WTermRange

    _assert_parity(
        _ours_res(ours, TermRange("zz00000", "zz99999"), LIMIT),
        _whoosh_res(
            wix, WTermRange("text", "zz00000", "zz99999"), LIMIT
        ),
        "termrange_overflow",
    )


def test_threshold_sanity():
    assert TOO_MANY_CLAUSES == 1024
