"""Absolute-date parsing for query strings — the subset of the reference's
dateparse grammar (qparser/dateparse.py:786+, util/times.py adatetime) that
covers ISO-style absolute dates and ranges.

A partial date ('2010', '2010-05', '20100512', '2010-05-12 14:30') is an
"ambiguous" point covering a SPAN: floor() fills unspecified components with
their lowest values, ceil() with their highest (times.py:202-260), so
`date:2010` queries the whole year — exactly the reference's
DateTimeNode -> DateRange(floor, ceil) behavior (dateparse.py:916-960).

The relative keyword subset (now/today/yesterday/tomorrow/'this month'/
'this year') is in :func:`relative_span`; richer NL phrases ('next
friday', '3 days ago') remain out of scope.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta
from typing import Optional, Tuple

# YYYY[-MM[-DD]][ T]HH[:MM[:SS]] with -, /, or no separator for the date part
_DATE_RE = re.compile(
    r"""^
    (?P<y>\d{4})
    (?:[-/]?(?P<m>\d{2})
       (?:[-/]?(?P<d>\d{2})
          (?:[T\s'](?P<H>\d{2})
             (?::?(?P<M>\d{2})
                (?::?(?P<S>\d{2}))?
             )?
          )?
       )?
    )?
    $""",
    re.VERBOSE,
)


def parse_adate(text: str) -> Optional[Tuple]:
    """'2010-05' -> (2010, 5, None, None, None, None); None if not a date."""
    m = _DATE_RE.match(text.strip())
    if not m:
        return None
    g = m.groupdict()
    parts = tuple(int(g[k]) if g[k] is not None else None
                  for k in ("y", "m", "d", "H", "M", "S"))
    # reject impossible dates early (month 13 etc.) — fall back to text
    try:
        _floor(parts)
        _ceil(parts)
    except ValueError:
        return None
    return parts


def _floor(p) -> datetime:
    y, m, d, H, M, S = p
    return datetime(y, m or 1, d or 1, H or 0, M or 0, S or 0, 0)


def _last_day(y: int, m: int) -> int:
    nxt = datetime(y + 1, 1, 1) if m == 12 else datetime(y, m + 1, 1)
    return (nxt - timedelta(days=1)).day


def _ceil(p) -> datetime:
    y, m, d, H, M, S = p
    m2 = m if m is not None else 12
    d2 = d if d is not None else _last_day(y, m2)
    return datetime(
        y, m2, d2,
        H if H is not None else 23,
        M if M is not None else 59,
        S if S is not None else 59,
        999999,
    )


def floor(text: str) -> Optional[datetime]:
    p = parse_adate(text)
    return _floor(p) if p else None


def ceil(text: str) -> Optional[datetime]:
    p = parse_adate(text)
    return _ceil(p) if p else None


def span(text: str) -> Optional[Tuple[datetime, datetime]]:
    """The (floor, ceil) span a partial date covers, or None."""
    p = parse_adate(text)
    if p is None:
        return None
    return _floor(p), _ceil(p)


def relative_span(text: str, basedate: datetime):
    """Relative-date subset of the reference grammar (dateparse.py:700-736):
    now / today / yesterday / tomorrow / 'this month' / 'this year' ->
    (floor, ceil) span relative to `basedate` (the reference's basedate
    parameter; adatetime semantics).  None when `text` is not one of them."""
    t = text.strip().lower()
    if t == "now":
        return basedate, basedate
    if t == "today":
        d = basedate.date()
    elif t == "yesterday":
        d = basedate.date() - timedelta(days=1)
    elif t == "tomorrow":
        d = basedate.date() + timedelta(days=1)
    elif t in ("this month", "this_month"):
        p = (basedate.year, basedate.month, None, None, None, None)
        return _floor(p), _ceil(p)
    elif t in ("this year", "this_year"):
        p = (basedate.year, None, None, None, None, None)
        return _floor(p), _ceil(p)
    else:
        return None
    p = (d.year, d.month, d.day, None, None, None)
    return _floor(p), _ceil(p)
