"""Golden parity: our NL date grammar vs the reference English date parser
(qparser/dateparse.py) over the full shape inventory of the reference's own
test_dateparse.py, plus the QueryParser integration surface."""

import datetime

import pytest

from tests.conftest import reference_importable
from whoosh_reloaded_spark.query.dateparse import (
    AD,
    add_relative,
    parse_date,
    parse_span,
    relative_days,
)

pytestmark = pytest.mark.skipif(
    not reference_importable(), reason="reference not importable"
)

BASE = datetime.datetime(2010, 9, 20, 15, 16, 6, 454000)

SHAPES = [
    # simple
    "2005", "200505", "20050510", "2005051001", "200505100108",
    "20050510010835", "2005-05", "2005 05 10", "2005.05.10.01",
    "2005/05/10 01:08", "2005.05.10  01:08:35",
    "2005 02 31", "2005-13-32",
    # times
    "13:05", "28:91", "3pm", "3 pm", "10pm", "10 pm", "3am", "3:15 am",
    "5:10pm", "12:45am", "12:45pm", "5:45:05 pm", "noon", "midnight",
    "15 am", "24:00", "12:65",
    # dmy
    "25 may 2011", "may 2 2011", "2011 25 may", "2011 may 5", "apr",
    "september", "2001", "july 2525", "nov 30", "25 2525",
    "25 may, 2011", "may 2nd, 2011", "2011, 25 may", "2011, may 5th",
    "today", "tomorrow", "yesterday", "this month", "this year", "now",
    # plustime / reldate
    "+1hr", "+5mins", "+20s", "- 2 h", "- 25 minutes", "-400 secs",
    "+1hr 5m", "-8hr 12m", "+1hr 5s", "+1hr 12m 5s", "-1hr 5s",
    "-1hr 12m 5s", "+1y", "+2mo", "+3w", "+5d", "+5days", "-6yr",
    "- 7 mons", "-8 wks", "- 9 dy", "+1y 12mo 400d", "-7mo 8d",
    "+5wks 2d", "-1y 1w", "+1y 2d 5h 12s",
    # daynames
    "next tuesday", "last tuesday", "next sunday", "last sun", "next th",
    # bundles
    "mar 29 1972 2:45am", "16:10:45 14 February 2005",
    "1985 sept 12 12:01", "5pm 21st oct 2005", "5:59:59pm next thur",
    "may 32 2005", "2005 may 32",
    # ranges
    "last tuesday to next tuesday", "last monday to dec 25",
    "oct 25 to feb 14", "3am oct 12 to 5pm", "3am feb 12 to 5pm today",
    "feb to oct", "oct 25 2005 11am to 5pm tomorrow",
    "oct 5 2005 to november 20", "2007 to 2010", "2007 to oct 12",
    "-2d to +1w", "feb to nov", "2005 to 10 oct 2009",
    "jan 12 to oct 10 2009", "jan to oct 2009", "mar 2005 to oct",
    "jan 10 to jan 25", "jan 2005 to feb 2009", "jan 5000 to mar",
    "jun 5000 to jan", "oct 2010 to feb", "5pm to 3am",
    "5am to 3 am tomorrow", "3am to 5 pm tomorrow", "-2hrs to +20min",
    "oct 25 2009 to feb 14 2008", "oct 25 5000 to tomorrow",
]


def _ref_engine():
    from whoosh.qparser.dateparse import English

    return English()


def _naive(dt):
    return dt.replace(tzinfo=None)


@pytest.mark.parametrize("text", SHAPES)
def test_parity(text):
    from whoosh.qparser.dateparse import timespan

    eng = _ref_engine()
    base_aware = BASE.replace(tzinfo=datetime.timezone.utc)
    try:
        ref = eng.date_from(text, base_aware)
    except Exception:
        ref = None
    ours = parse_span(text, BASE)
    if ref is None:
        assert ours is None, f"{text!r}: ours={ours} ref=None"
        return
    assert ours is not None, f"{text!r}: ours=None ref={ref}"
    if isinstance(ref, timespan):
        want = (_naive(ref.start), _naive(ref.end))
    else:
        want = (_naive(ref), _naive(ref))
    assert ours == want, f"{text!r}: ours={ours} want={want}"


def test_relative_days_table():
    # the reference's documented truth table (test_dateparse.py:181-204)
    assert relative_days(0, 0, 1) == 7
    assert relative_days(0, 0, -1) == -7
    assert relative_days(2, 1, 1) == 6
    assert relative_days(2, 1, -1) == -1
    assert relative_days(6, 0, -1) == -6
    assert relative_days(6, 0, 1) == 1
    assert relative_days(1, 2, 1) == 1
    assert relative_days(3, 2, -1) == -1


def test_add_relative_calendar_math():
    d = datetime.datetime(2020, 1, 31)
    assert add_relative(d, months=1) == datetime.datetime(2020, 2, 29)
    assert add_relative(d, years=1, months=1) == datetime.datetime(2021, 2, 28)


def test_parse_date_partial_shapes():
    v = parse_date("nov 30", BASE)
    assert isinstance(v, AD) and v.month == 11 and v.day == 30 and v.year is None


def test_queryparser_nl_dates():
    """DateParserPlugin surface: NL dates through field queries."""
    from whoosh_reloaded_spark.query import ast as Q
    from whoosh_reloaded_spark.query.parser import QueryParser

    qp = QueryParser("text", schema={"text": "text", "dt": "date"},
                     basedate=BASE)
    q = qp.parse("dt:'next friday'")
    assert isinstance(q, Q.DateRange)
    assert q.start == datetime.datetime(2010, 9, 24, 0, 0, 0, 0)
    assert q.end == datetime.datetime(2010, 9, 24, 23, 59, 59, 999999)

    q = qp.parse('dt:"last tuesday to next tuesday"')
    assert isinstance(q, Q.DateRange)
    assert q.start == datetime.datetime(2010, 9, 14, 0, 0, 0, 0)
    assert q.end == datetime.datetime(2010, 9, 21, 23, 59, 59, 999999)

    q = qp.parse("dt:'-3 weeks'")
    assert isinstance(q, Q.DateRange)
    assert q.start == q.end == BASE - datetime.timedelta(weeks=3)

    q = qp.parse("dt:'3pm'")
    assert isinstance(q, Q.DateRange)
    assert q.start == datetime.datetime(2010, 9, 20, 15, 0, 0, 0)
    assert q.end == datetime.datetime(2010, 9, 20, 15, 59, 59, 999999)


# -- hypothesis fuzz over the composable date grammar (round 5) ----------------

from hypothesis import event, given, settings
from hypothesis import strategies as hst

_MONTHS = ["january", "jan", "february", "feb", "march", "mar", "april",
           "apr", "may", "june", "jun", "july", "jul", "august", "aug",
           "september", "sept", "sep", "october", "oct", "november",
           "nov", "december", "dec"]
_DAYNAMES = ["monday", "mon", "tuesday", "tue", "wednesday", "wed",
             "thursday", "thu", "th", "friday", "fri", "saturday", "sat",
             "sunday", "sun"]
_UNITS = ["y", "yr", "yrs", "mo", "mon", "mons", "w", "wk", "wks", "d",
          "dy", "days", "h", "hr", "hrs", "m", "min", "mins", "s",
          "sec", "secs"]

_atom = hst.one_of(
    hst.integers(1000, 9999).map(str),                       # year
    hst.integers(0, 40).map(str),                            # day-ish
    hst.sampled_from(_MONTHS),
    hst.sampled_from(["today", "tomorrow", "yesterday", "now",
                      "this month", "this year", "noon", "midnight"]),
    hst.tuples(hst.integers(0, 30), hst.integers(0, 70)).map(
        lambda t: f"{t[0]}:{t[1]:02d}"
    ),
    hst.tuples(hst.integers(1, 15), hst.sampled_from(["am", "pm"])).map(
        lambda t: f"{t[0]}{t[1]}"
    ),
    hst.tuples(
        hst.sampled_from(["+", "-"]),
        hst.integers(1, 500),
        hst.sampled_from(_UNITS),
    ).map(lambda t: f"{t[0]}{t[1]}{t[2]}"),
    hst.tuples(hst.sampled_from(["next", "last"]),
               hst.sampled_from(_DAYNAMES)).map(lambda t: f"{t[0]} {t[1]}"),
)

_bag = hst.lists(_atom, min_size=1, max_size=4).map(" ".join)
_datestr = hst.one_of(
    _bag,
    hst.tuples(_bag, _bag).map(lambda t: f"{t[0]} to {t[1]}"),
)


@settings(max_examples=500, deadline=None)
@given(text=_datestr)
def test_dateparse_fuzz(text):
    """Random compositions of the grammar's atoms (dates, times,
    relative deltas, daynames, bags, ranges) parse to the same span as
    the reference English engine — or both reject.  A rejection is the
    reference returning None; when the reference CRASHES instead (its
    own bugs: "1am to now" hits timespan end datetimes without .ceil(),
    "32 january" leaks ValueError from its [123][0-9] day regex past
    date_from), there is no sane expected value — record the event,
    require only that OURS doesn't crash, and skip (the
    test_parser_fuzz precedent for reference-raised examples)."""
    from whoosh.qparser.dateparse import timespan

    eng = _ref_engine()
    base_aware = BASE.replace(tzinfo=datetime.timezone.utc)
    ref_crashed = None
    try:
        ref = eng.date_from(text, base_aware)
    except Exception as e:
        ref, ref_crashed = None, type(e).__name__
    ours = parse_span(text, BASE)  # must never raise, even on ref crashes
    if ref_crashed is not None:
        event(f"reference raised {ref_crashed}")
        return
    if ref is None:
        assert ours is None, f"{text!r}: ours={ours} ref=None"
        return
    assert ours is not None, f"{text!r}: ours=None ref={ref}"
    if isinstance(ref, timespan):
        want = (_naive(ref.start), _naive(ref.end))
    else:
        want = (_naive(ref), _naive(ref))
    assert ours == want, f"{text!r}: ours={ours} want={want}"
