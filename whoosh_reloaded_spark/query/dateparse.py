"""Full English natural-language date grammar — behavior parity with the
reference's DateParserPlugin/English (qparser/dateparse.py:603-782) and its
ambiguous-datetime algebra (util/times.py adatetime/timespan), re-implemented
from scratch as plain regex-driven functions (no combinator class machinery).

Covered shapes (the reference's test_dateparse.py inventory):
  * simple:   2005 / 200505 / 2005-05-10 / 2005.05.10 01:08:35
  * dmy:      25 may 2011 / may 2nd, 2011 / 2011 25 may / nov 30 / apr / 2001
  * times:    13:05 / 3pm / 12:45am / 5:45:05 pm / noon / midnight / now
  * named:    today / tomorrow / yesterday / this month / this year
  * daynames: next tuesday / last sun / next th
  * deltas:   +1hr / -8hr 12m / +1y 12mo 400d / - 9 dy
  * bundles:  mar 29 1972 2:45am / 5:59:59pm next thur
  * ranges:   last tuesday to next tuesday / feb to nov / -2d to +1w /
              5pm to 3am (wraps to next day) / oct 25 5000 to tomorrow (swap)

A parse yields a ``datetime`` (unambiguous point), an :class:`AD` (partially
specified), or an (AD|datetime, AD|datetime) pair for ``X to Y``; ``None``
when the text isn't a date.  :func:`parse_span` disambiguates to a concrete
(start, end) datetime span against a ``basedate``, replicating
``timespan.disambiguated`` (times.py:329-421): year borrowing between ends,
month/day borrowing with the time-order exception, out-of-order repair by
year adjustment or swap, and same-day time wrap to the next day.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta
from typing import Optional, Tuple, Union


class DateParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AD: ambiguous datetime (adatetime behavior, times.py:93-302)
# ---------------------------------------------------------------------------

_FIELDS = ("year", "month", "day", "hour", "minute", "second", "microsecond")


class AD:
    """Partially-specified datetime: any unit may be None (= unspecified)."""

    __slots__ = _FIELDS

    def __init__(self, year=None, month=None, day=None, hour=None,
                 minute=None, second=None, microsecond=None):
        if month is not None and not 1 <= month <= 12:
            raise DateParseError("month out of range")
        if day is not None and day < 1:
            raise DateParseError("day out of range")
        if (
            year is not None
            and month is not None
            and day is not None
            and day > calendar.monthrange(year, month)[1]
        ):
            raise DateParseError("day out of range for month")
        if hour is not None and not 0 <= hour <= 23:
            raise DateParseError("hour out of range")
        if minute is not None and not 0 <= minute <= 59:
            raise DateParseError("minute out of range")
        if second is not None and not 0 <= second <= 59:
            raise DateParseError("second out of range")
        if microsecond is not None and not 0 <= microsecond <= 999999:
            raise DateParseError("microsecond out of range")
        self.year, self.month, self.day = year, month, day
        self.hour, self.minute, self.second = hour, minute, second
        self.microsecond = microsecond

    @classmethod
    def of(cls, dt: datetime) -> "AD":
        return cls(dt.year, dt.month, dt.day, dt.hour, dt.minute, dt.second,
                   dt.microsecond)

    def tuple(self):
        return tuple(getattr(self, f) for f in _FIELDS)

    def __repr__(self):
        return f"AD{self.tuple()!r}"

    def is_void(self) -> bool:
        return all(v is None for v in self.tuple())

    def is_full(self) -> bool:
        return all(v is not None for v in self.tuple())

    def has_no_date(self) -> bool:
        return self.year is None and self.month is None and self.day is None

    def merged(self, other: "AD") -> "AD":
        """Units set here win; unset units come from `other` (the Sequence/
        Bag fill_in merge, times.py:436-451) — revalidates, so an impossible
        combination (feb 31) raises and fails the alternative."""
        return AD(*(a if a is not None else b
                    for a, b in zip(self.tuple(), other.tuple())))

    def floor(self) -> datetime:
        return datetime(
            self.year, self.month or 1, self.day or 1, self.hour or 0,
            self.minute or 0, self.second or 0, self.microsecond or 0,
        )

    def ceil(self) -> datetime:
        m = self.month if self.month is not None else 12
        d = (
            self.day
            if self.day is not None
            else calendar.monthrange(self.year, m)[1]
        )
        return datetime(
            self.year, m, d,
            self.hour if self.hour is not None else 23,
            self.minute if self.minute is not None else 59,
            self.second if self.second is not None else 59,
            self.microsecond if self.microsecond is not None else 999999,
        )


Point = Union[AD, datetime]
ParseResult = Union[Point, Tuple[Point, Point], None]


def relative_days(current_wday: int, wday: int, direction: int) -> int:
    """Days to the next/last given weekday (times.py:37-60): same weekday
    means a full week away, otherwise the nearest in `direction`."""
    if current_wday == wday:
        return 7 * direction
    if direction == 1:
        return (wday + 7 - current_wday) % 7
    return -((current_wday + 7 - wday) % 7)


def add_relative(dt: datetime, years=0, months=0, weeks=0, days=0, hours=0,
                 minutes=0, seconds=0) -> datetime:
    """relativedelta-style shift: calendar math for years/months (day
    clamped to the target month's length), plain timedelta for the rest."""
    y = dt.year + years
    mo = dt.month + months
    y += (mo - 1) // 12
    mo = (mo - 1) % 12 + 1
    d = min(dt.day, calendar.monthrange(y, mo)[1])
    out = dt.replace(year=y, month=mo, day=d)
    return out + timedelta(weeks=weeks, days=days, hours=hours,
                           minutes=minutes, seconds=seconds)


# ---------------------------------------------------------------------------
# element regexes (grammar constants from the reference's English setup,
# dateparse.py:675-782 — the patterns are part of the published grammar)
# ---------------------------------------------------------------------------

_SEP = re.compile(r"(\s+|\s*,\s*)")
_I = re.IGNORECASE

_DAY = re.compile(r"(?P<day>([123][0-9])|[1-9])(st|nd|rd|th)?(?=\W|$)", _I)
_YEAR = re.compile(r"(?P<year>[0-9]{4})(?=\W|$)")

_MONTH_PATS = [
    "january|jan", "february|febuary|feb", "march|mar", "april|apr", "may",
    "june|jun", "july|jul", "august|aug", "september|sept|sep",
    "october|oct", "november|nov", "december|dec",
]
_MONTH = re.compile(
    "(?P<month>" + "|".join(f"({p})" for p in _MONTH_PATS) + ")", _I
)
_MONTH_ONE = [re.compile(p, _I) for p in _MONTH_PATS]

_DAYNAME_PATS = [
    "monday|mon|mo", "tuesday|tues|tue|tu", "wednesday|wed|we",
    "thursday|thur|thu|th", "friday|fri|fr", "saturday|sat|sa",
    "sunday|sun|su",
]
_DAYNAME = re.compile(
    r"(?P<dir>next|last) +(?P<day>" + "|".join(_DAYNAME_PATS) + r")(?=\W|$)",
    _I,
)
_DAYNAME_ONE = [re.compile(p, _I) for p in _DAYNAME_PATS]

_TIME24 = re.compile(
    r"(?P<hour>([0-1][0-9])|(2[0-3])):(?P<mins>[0-5][0-9])"
    r"(:(?P<secs>[0-5][0-9])(\.(?P<usecs>[0-9]{1,5}))?)?(?=\W|$)",
    _I,
)
_TIME12 = re.compile(
    r"(?P<hour>[1-9]|10|11|12)(:(?P<mins>[0-5][0-9])"
    r"(:(?P<secs>[0-5][0-9])(\.(?P<usecs>[0-9]{1,5}))?)?)?"
    r"\s*(?P<ampm>am|pm)(?=\W|$)",
    _I,
)
_NOON = re.compile("noon", _I)
_MIDNIGHT = re.compile("midnight", _I)
_NOW = re.compile("now", _I)
_TODAY = re.compile("today", _I)
_TOMORROW = re.compile("tomorrow", _I)
_YESTERDAY = re.compile("yesterday", _I)
_THISYEAR = re.compile("this year", _I)
_THISMONTH = re.compile("this month", _I)

_PLUS_UNITS = [
    ("years", "years|year|yrs|yr|ys|y"),
    ("months", "months|month|mons|mon|mos|mo"),
    ("weeks", "weeks|week|wks|wk|ws|w"),
    ("days", "days|day|dys|dy|ds|d"),
    ("hours", "hours|hour|hrs|hr|hs|h"),
    ("minutes", "minutes|minute|mins|min|ms|m"),
    ("seconds", "seconds|second|secs|sec|s"),
]
_PLUSDATE = re.compile(
    r"(?P<dir>[+-]) *"
    + " *".join(
        f"((?P<{name}>[0-9]+) *({pat}))?" for name, pat in _PLUS_UNITS
    )
    + r"(?=\W|$)",
    _I,
)

# the 'simple' progressive numeric form: YYYY[MM[DD[HH[MM[SS[usec]]]]]]
# with any of "- .:/" between components, anchored by a \s|$ lookahead
_SIMPLE = re.compile(
    r"(?P<year>[0-9]{4})(?:[- .:/]*(?P<month>[0-1][0-9])"
    r"(?:[- .:/]*(?P<day>[0-3][0-9])"
    r"(?:[- .:/]*(?P<hour>([0-1][0-9])|(2[0-3]))"
    r"(?:[- .:/]*(?P<minute>[0-5][0-9])"
    r"(?:[- .:/]*(?P<second>[0-5][0-9])"
    r"(?:[- .:/]*(?P<microsecond>[0-9]{6}))?)?)?)?)?)?(?=\s|$)"
)

_TO = re.compile("to", _I)


# ---------------------------------------------------------------------------
# element parsers: (text, pos, base) -> (result, newpos) | (None, None)
# ---------------------------------------------------------------------------


def _int(g) -> Optional[int]:
    return int(g) if g is not None else None


def _p_day(text, pos, base):
    m = _DAY.match(text, pos)
    if not m:
        return None, None
    try:
        return AD(day=int(m.group("day"))), m.end()
    except DateParseError:
        return None, None


def _p_year(text, pos, base):
    m = _YEAR.match(text, pos)
    return (AD(year=int(m.group("year"))), m.end()) if m else (None, None)


def _p_month(text, pos, base):
    m = _MONTH.match(text, pos)
    if not m:
        return None, None
    s = m.group("month")
    for i, one in enumerate(_MONTH_ONE):
        if one.match(s):
            return AD(month=i + 1), m.end()
    return None, None


def _p_dayname(text, pos, base):
    m = _DAYNAME.match(text, pos)
    if not m:
        return None, None
    direction = -1 if m.group("dir").lower() == "last" else 1
    daynum = next(
        i for i, one in enumerate(_DAYNAME_ONE) if one.match(m.group("day"))
    )
    d = base.date() + timedelta(
        days=relative_days(base.weekday(), daynum, direction)
    )
    return AD(year=d.year, month=d.month, day=d.day), m.end()


def _p_time24(text, pos, base):
    m = _TIME24.match(text, pos)
    if not m:
        return None, None
    try:
        return (
            AD(hour=int(m.group("hour")), minute=_int(m.group("mins")),
               second=_int(m.group("secs")),
               microsecond=_int(m.group("usecs"))),
            m.end(),
        )
    except DateParseError:
        return None, None


def _p_time12(text, pos, base):
    m = _TIME12.match(text, pos)
    if not m:
        return None, None
    hr = int(m.group("hour"))
    isam = m.group("ampm").lower().startswith("a")
    if hr == 12:
        hr = 0 if isam else 12
    elif not isam:
        hr += 12
    try:
        return (
            AD(hour=hr, minute=_int(m.group("mins")),
               second=_int(m.group("secs")),
               microsecond=_int(m.group("usecs"))),
            m.end(),
        )
    except DateParseError:
        return None, None


def _p_time(text, pos, base):
    for fn in (_p_time12, _p_time24):
        v, np = fn(text, pos, base)
        if v is not None:
            return v, np
    m = _MIDNIGHT.match(text, pos)
    if m:
        return AD(hour=0, minute=0, second=0, microsecond=0), m.end()
    m = _NOON.match(text, pos)
    if m:
        return AD(hour=12, minute=0, second=0, microsecond=0), m.end()
    m = _NOW.match(text, pos)
    if m:
        return base, m.end()
    return None, None


def _p_named_day(text, pos, base):
    for rx, delta in ((_TOMORROW, 1), (_YESTERDAY, -1), (_TODAY, 0)):
        m = rx.match(text, pos)
        if m:
            d = base.date() + timedelta(days=delta)
            return AD(year=d.year, month=d.month, day=d.day), m.end()
    m = _THISYEAR.match(text, pos)
    if m:
        return AD(year=base.year), m.end()
    m = _THISMONTH.match(text, pos)
    if m:
        return AD(year=base.year, month=base.month), m.end()
    return None, None


def _p_plusdate(text, pos, base):
    m = _PLUSDATE.match(text, pos)
    if not m or all(m.group(n) is None for n, _ in _PLUS_UNITS):
        return None, None
    sign = -1 if m.group("dir") == "-" else 1
    kw = {n: sign * int(m.group(n) or 0) for n, _ in _PLUS_UNITS}
    return add_relative(base, **kw), m.end()


def _p_simple(text, pos, base):
    m = _SIMPLE.match(text, pos)
    if not m:
        return None, None
    try:
        return (
            AD(**{f: _int(m.group(f)) for f in _FIELDS}),
            m.end(),
        )
    except DateParseError:
        return None, None


def _p_seq(elements):
    """All elements in order, separated by whitespace/comma, merged."""

    def run(text, pos, base):
        d = AD()
        first = True
        for e in elements:
            if not first:
                sm = _SEP.match(text, pos)
                if not sm:
                    return None, None
                pos = sm.end()
            v, np = e(text, pos, base)
            if v is None:
                return None, None
            try:
                d = d.merged(v if isinstance(v, AD) else AD.of(v))
            except DateParseError:
                return None, None
            pos = np
            first = False
        return d, pos

    return run


# dmy Choice in the reference's alternative order (dateparse.py:753-776):
# full triples first, then pairs, then singles, then the named/relative days
_DMY_ALTS = [
    _p_seq((_p_day, _p_month, _p_year)),
    _p_seq((_p_month, _p_day, _p_year)),
    _p_seq((_p_year, _p_month, _p_day)),
    _p_seq((_p_year, _p_day, _p_month)),
    _p_seq((_p_day, _p_month)),
    _p_seq((_p_month, _p_day)),
    _p_seq((_p_month, _p_year)),
    _p_month,
    _p_year,
    _p_dayname,
    _p_named_day,
]


def _p_dmy(text, pos, base):
    for alt in _DMY_ALTS:
        v, np = alt(text, pos, base)
        if v is not None:
            return v, np
    m = _NOW.match(text, pos)
    if m:
        return base, m.end()
    return None, None


def _p_datetime_bag(text, pos, base):
    """time + dmy in either order, each at most once (Bag semantics,
    dateparse.py:289-378): a second match of a seen element fails the
    whole bag; merge results."""
    d = AD()
    got: Point = d
    seen = [False, False]
    first = True
    elements = (_p_time, _p_dmy)
    while True:
        npos = pos
        if not first:
            sm = _SEP.match(text, pos)
            if not sm:
                break
            npos = sm.end()
        for i, e in enumerate(elements):
            v, xpos = e(text, npos, base)
            if v is not None:
                if seen[i]:
                    return None, None
                seen[i] = True
                if isinstance(v, datetime):
                    got = v  # 'now' — a full point; merge keeps it
                    v = AD.of(v)
                try:
                    d = d.merged(v)
                except DateParseError:
                    return None, None
                npos = xpos
                break
        else:
            break
        pos = npos
        if all(seen):
            break
        first = False
    if not any(seen):
        return None, None
    if isinstance(got, datetime) and d.is_full():
        return d.floor(), pos
    return d, pos


def _p_bundle(text, pos, base):
    for e in (_p_plusdate, _p_datetime_bag, _p_simple):
        v, np = e(text, pos, base)
        if v is not None:
            return v, np
    return None, None


def _p_torange(text, pos, base):
    a, np = _p_bundle(text, pos, base)
    if a is None:
        return None, None
    sm = _SEP.match(text, np)
    if not sm:
        return None, None
    tm = _TO.match(text, sm.end())
    if not tm:
        return None, None
    sm2 = _SEP.match(text, tm.end())
    if not sm2:
        return None, None
    b, np2 = _p_bundle(text, sm2.end(), base)
    if b is None:
        return None, None
    return (a, b), np2


def parse_date(text: str, base: datetime) -> ParseResult:
    """Parse the WHOLE string as a date point or range; None otherwise."""
    text = text.strip()
    for e in (_p_torange, _p_bundle):
        v, np = e(text, 0, base)
        if v is not None and np == len(text):
            return v
    return None


# ---------------------------------------------------------------------------
# disambiguation (timespan.disambiguated, times.py:329-421)
# ---------------------------------------------------------------------------


def _span_disambiguated(start: Point, end: Point,
                        base: datetime) -> Tuple[datetime, datetime]:
    s = AD.of(start) if isinstance(start, datetime) else AD(*start.tuple())
    e = AD.of(end) if isinstance(end, datetime) else AD(*end.tuple())
    s_year_amb = s.year is None
    e_year_amb = e.year is None

    if s.has_no_date() and e.has_no_date():
        # pure times: both anchored on the basedate's day
        s.year, s.month, s.day = base.year, base.month, base.day
        e.year, e.month, e.day = base.year, base.month, base.day
    else:
        if s.year is None and e.year is None:
            s.year = e.year = base.year
        elif s.year is None:
            s.year = e.year
        elif e.year is None:
            e.year = max(s.year, base.year)

    if s.year == e.year:
        # month/day borrowing: copy end's month+day to a date-less start
        # unless that reads backwards in time-of-day, then use the basedate;
        # a date-less END always uses the basedate (times.py:375-395)
        s_dm = not (s.month is None and s.day is None)
        e_dm = not (e.month is None and e.day is None)
        if e_dm and not s_dm:
            if s.floor().time() > e.ceil().time():
                s.month, s.day = base.month, base.day
            else:
                s.month, s.day = e.month, e.day
        elif s_dm and not e_dm:
            e.month, e.day = base.month, base.day

    if s.floor().date() > e.ceil().date():
        # out of order: repair via the side whose year was unspecified,
        # else swap outright
        if s_year_amb:
            s.year = e.year - 1
        elif e_year_amb:
            e.year = s.year + 1
        else:
            s, e = e, s

    lo, hi = s.floor(), e.ceil()
    if lo.date() == hi.date() and lo.time() > hi.time():
        # same-day wrap: "5pm to 3am" runs into the next day
        hi += timedelta(days=1)
    return lo, hi


def disambiguate(v: ParseResult,
                 base: datetime) -> Optional[Tuple[datetime, datetime]]:
    """Resolve a parse result to a concrete (start, end) span; a full point
    becomes the degenerate (dt, dt) span."""
    if v is None:
        return None
    if isinstance(v, tuple):
        return _span_disambiguated(v[0], v[1], base)
    if isinstance(v, datetime):
        return v, v
    if v.is_full():
        dt = v.floor()
        return dt, dt
    return _span_disambiguated(v, v, base)


def parse_span(text: str,
               base: datetime) -> Optional[Tuple[datetime, datetime]]:
    """Parse + disambiguate in one step — the DateParserPlugin entry.

    An impossible-but-lexable date ("32 january": the reference's day
    regex [123][0-9] admits 32-39, then timespan construction raises
    inside date_from) is a rejection, not a crash — mirror by mapping
    the ValueError from floor()/ceil() datetime construction to None
    (round-5 dateparse fuzz)."""
    try:
        return disambiguate(parse_date(text, base), base)
    except DateParseError:
        raise
    except ValueError:
        return None
