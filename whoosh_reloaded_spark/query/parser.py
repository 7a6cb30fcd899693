"""Query-string parser — the reference's default QueryParser grammar subset.

Covers the default plugin set (qparser/default.py:95-111): whitespace
grouping with implicit AND, AND/OR/NOT/ANDNOT/ANDMAYBE operators
(plugins.py:895+), quoted phrases (plugins.py:673), [a TO b] / {a TO b}
ranges (plugins.py:835), ^boost (plugins.py:217), parenthesized groups
(plugins.py:285), trailing-* prefix and * / ? wildcards, fuzzy~ terms,
and `field:` prefixes routed to `known_fields` (unknown prefixes fall back
to the default field).

Query words are analyzed with the index analyzer in query mode
(FieldType.process_text, fields.py:196-207): lowercased, stop words dropped
(a stopped word vanishes from the query like the reference's parser output).

Pure driver-side Python — parsing is not a hot path.
"""

from __future__ import annotations

import re
from typing import List, Optional

from whoosh_reloaded_spark.analysis import StandardAnalyzer
from whoosh_reloaded_spark.query import ast as Q

_TOKEN_RE = re.compile(
    r"""
    (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<phrase>"(?P<phrase_body>[^"]*)"(~(?P<slop>\d+))?)
  | (?P<range>[\[{]\s*(?P<r_lo>\S+)?\s+TO(\s+(?P<r_hi>\S+?))?\s*[\]}])
  | (?P<word>[^\s()]+)
""",
    re.VERBOSE,
)

_BOOST_RE = re.compile(r"\^(\d+(\.\d+)?)$")
_FUZZY_RE = re.compile(r"~(\d*)$")


class _Tok:
    def __init__(self, kind, value, **kw):
        self.kind = kind
        self.value = value
        self.__dict__.update(kw)

    def __repr__(self):
        return f"_Tok({self.kind}, {self.value!r})"


def _lex(s: str) -> List[_Tok]:
    out = []
    for m in _TOKEN_RE.finditer(s):
        if m.group("lparen"):
            out.append(_Tok("(", "("))
        elif m.group("rparen"):
            out.append(_Tok(")", ")"))
        elif m.group("phrase") is not None:
            out.append(
                _Tok(
                    "phrase",
                    m.group("phrase_body"),
                    slop=int(m.group("slop")) if m.group("slop") else 1,
                )
            )
        elif m.group("range") is not None:
            raw = m.group("range")
            out.append(
                _Tok(
                    "range",
                    raw,
                    lo=m.group("r_lo"),
                    hi=m.group("r_hi"),
                    loexcl=raw.startswith("{"),
                    hiexcl=raw.endswith("}"),
                )
            )
        elif m.group("word"):
            out.append(_Tok("word", m.group("word")))
    return out


class QueryParser:
    """parse(text) -> normalized Query AST for the default text field."""

    def __init__(self, fieldname: str = "text",
                 analyzer: Optional[StandardAnalyzer] = None,
                 group: str = "and", known_fields=None):
        self.fieldname = fieldname
        self.analyzer = analyzer or StandardAnalyzer()
        self.group = group
        # fields a `field:` prefix may select (FieldsPlugin, plugins.py:364);
        # unknown prefixes fall back to the default field
        self.known_fields = set(known_fields or ())

    # -- recursive descent ---------------------------------------------------

    def parse(self, s: str) -> Q.Query:
        self._toks = _lex(s)
        self._i = 0
        if not self._toks:
            return Q.NullQuery()
        q = self._or_expr()
        return q.normalize()

    def _peek(self) -> Optional[_Tok]:
        return self._toks[self._i] if self._i < len(self._toks) else None

    def _next(self) -> _Tok:
        t = self._toks[self._i]
        self._i += 1
        return t

    def _or_expr(self) -> Q.Query:
        left = self._and_expr()
        parts = [left]
        while True:
            t = self._peek()
            if t is not None and t.kind == "word" and t.value == "OR":
                self._next()
                parts.append(self._and_expr())
            else:
                break
        return parts[0] if len(parts) == 1 else Q.Or(tuple(parts))

    def _and_expr(self) -> Q.Query:
        parts = [self._not_expr()]
        ops: List[str] = []
        while True:
            t = self._peek()
            if t is None or t.kind == ")":
                break
            if t.kind == "word" and t.value == "OR":
                break
            if t.kind == "word" and t.value in ("AND", "ANDNOT", "ANDMAYBE"):
                ops.append(t.value)
                self._next()
                parts.append(self._not_expr())
                continue
            ops.append("AND")
            parts.append(self._not_expr())
        if len(parts) == 1:
            return parts[0]
        # fold left, honoring ANDNOT / ANDMAYBE binary ops
        out = parts[0]
        pending_and: List[Q.Query] = [out]
        for op, rhs in zip(ops, parts[1:]):
            if op == "AND":
                pending_and.append(rhs)
            else:
                left = (
                    pending_and[0]
                    if len(pending_and) == 1
                    else Q.And(tuple(pending_and))
                )
                left = Q.AndNot(left, rhs) if op == "ANDNOT" else Q.AndMaybe(left, rhs)
                pending_and = [left]
        return (
            pending_and[0] if len(pending_and) == 1 else Q.And(tuple(pending_and))
        )

    def _not_expr(self) -> Q.Query:
        t = self._peek()
        if t is not None and t.kind == "word" and t.value == "NOT":
            self._next()
            return Q.Not(self._not_expr())
        return self._primary()

    def _primary(self) -> Q.Query:
        if self._peek() is None:
            # dangling operator at end of input (e.g. "foo AND") — the
            # reference's parser degrades gracefully; match that
            return Q.NullQuery()
        t = self._next()
        if t.kind == "(":
            q = self._or_expr()
            nxt = self._peek()
            if nxt is not None and nxt.kind == ")":
                self._next()
            # group boost: (a b)^2 arrives as a word "^2" — peek
            nxt = self._peek()
            if nxt is not None and nxt.kind == "word" and nxt.value.startswith("^"):
                try:
                    boost = float(nxt.value[1:])
                    self._next()
                    return self._boosted(q, boost)
                except ValueError:
                    pass
            return q
        if t.kind == "phrase":
            words = self.analyzer.query_terms(t.value)
            if not words:
                return Q.NullQuery()
            return Q.Phrase(tuple(words), self.fieldname, slop=t.slop)
        if t.kind == "range":
            lo = self._analyze_rangeterm(t.lo)
            hi = self._analyze_rangeterm(t.hi)
            return Q.TermRange(lo, hi, self.fieldname, t.loexcl, t.hiexcl)
        return self._word(t.value)

    @staticmethod
    def _boosted(q: Q.Query, boost: float) -> Q.Query:
        from dataclasses import replace

        if hasattr(q, "boost"):
            return replace(q, boost=q.boost * boost)
        return q

    def _analyze_rangeterm(self, raw: Optional[str]) -> Optional[str]:
        if raw is None:
            return None
        return raw.lower()

    def _word(self, raw: str) -> Q.Query:
        boost = 1.0
        fieldname = self.fieldname
        m = _BOOST_RE.search(raw)
        if m:
            boost = float(m.group(1))
            raw = raw[: m.start()]
        if ":" in raw:
            field, rest = raw.split(":", 1)
            raw = rest
            if field in self.known_fields:
                fieldname = field
        maxdist = None
        m = _FUZZY_RE.search(raw)
        if m and not raw.endswith('~"'):
            maxdist = int(m.group(1)) if m.group(1) else 1
            raw = raw[: m.start()]
        if "*" in raw or "?" in raw:
            return Q.Wildcard(raw.lower(), fieldname, boost)
        terms = self.analyzer.query_terms(raw)
        if not terms:
            return Q.NullQuery()
        if maxdist is not None:
            return Q.FuzzyTerm(terms[0], fieldname, boost, maxdist=maxdist)
        if len(terms) == 1:
            return Q.Term(terms[0], fieldname, boost)
        # multi-token word (e.g. hyphenated) -> phrase-like AND
        return Q.And(tuple(Q.Term(w, fieldname, boost) for w in terms))
