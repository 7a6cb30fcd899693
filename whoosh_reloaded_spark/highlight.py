"""Highlighting — fragment + format matched terms in stored text.

Reference-parity pipeline (highlight.py:60-975): analyzer token stream
with char offsets and per-token matched flags → a Fragmenter yields
Fragments → BasicFragmentScorer ranks them → a Formatter renders the top
fragments.  It runs over the TOP-K stored texts only (tiny data), so this
is driver-side Python by design — same as the reference, which highlights
per displayed Hit.

Implemented surface: WholeFragmenter / SentenceFragmenter /
ContextFragmenter; NullFormatter / UppercaseFormatter / HtmlFormatter;
FIRST/SCORE/LONGER/SHORTER orders; ``highlight()`` with the reference's
signature.  Golden-tested byte-identical against the reference's own
test_highlighting.py shapes.  PinpointFragmenter is unnecessary here:
indexes built with the Characters formats store char spans as columns
(chars.py / build_index(format="characters")), and retokenizing the k
displayed texts is cheaper than a distributed payload fetch.

:func:`snippet` keeps the earlier lightweight window API.
"""

from __future__ import annotations

import re
from collections import deque
from dataclasses import dataclass, field
from heapq import nlargest
from html import escape as _htmlescape
from typing import Iterable, List, Optional, Tuple

from whoosh_reloaded_spark.analysis import DEFAULT_PATTERN

DEFAULT_CHARLIMIT = 2**15


@dataclass
class Tok:
    """A highlight token: char span + matched flag (the subset of the
    reference's analysis.Token the fragmenters consume)."""

    text: str
    startchar: int
    endchar: int
    matched: bool = False
    boost: float = 1.0


@dataclass
class Fragment:
    """A candidate excerpt: char window into `text` plus the matched
    tokens inside it (reference highlight.Fragment, highlight.py:82-160)."""

    text: str
    matches: List[Tok]
    startchar: int = 0
    endchar: int = -1
    matched_terms: frozenset = field(init=False)

    def __post_init__(self):
        if self.endchar == -1:
            self.endchar = len(self.text)
        self.matched_terms = frozenset(t.text for t in self.matches)

    def __len__(self):
        return self.endchar - self.startchar

    def __lt__(self, other):
        return self.startchar < other.startchar


def _bounded(text: str, tokens: List[Tok], first: Optional[int],
             endchar: int, ) -> Fragment:
    start = 0 if first is None else max(0, first)
    return Fragment(text, tokens, start, min(len(text), endchar))


def tokenize_highlight(text: str, analyzer=None) -> List[Tok]:
    """Char-offset token stream with stop words RETAINED (the reference
    highlights with removestops=False so context char accounting sees
    every token)."""
    pattern = getattr(analyzer, "pattern", None) or re.compile(
        DEFAULT_PATTERN, re.UNICODE
    )
    return [
        Tok(m.group(0).lower(), m.start(), m.end())
        for m in pattern.finditer(text)
    ]


# -- fragmenters (highlight.py:283-515) --------------------------------------


class WholeFragmenter:
    """The entire text as one fragment (highlight.py:313-348)."""

    def __init__(self, charlimit: int = DEFAULT_CHARLIMIT):
        self.charlimit = charlimit

    def fragment_tokens(self, text: str, tokens: Iterable[Tok]):
        hits = []
        for t in tokens:
            if self.charlimit and t.endchar > self.charlimit:
                break
            if t.matched:
                hits.append(t)
        return [Fragment(text, hits)]


class SentenceFragmenter:
    """One fragment per sentence that contains a match — sentence ends
    detected as punctuation directly after a token (highlight.py:355-427).
    Use an analyzer that keeps stop words."""

    def __init__(self, maxchars: int = 200, sentencechars: str = ".!?",
                 charlimit: int = DEFAULT_CHARLIMIT):
        self.maxchars = maxchars
        self.sentencechars = frozenset(sentencechars)
        self.charlimit = charlimit

    def fragment_tokens(self, text: str, tokens: Iterable[Tok]):
        ends = self.sentencechars
        n = len(text)
        first = None
        hits: List[Tok] = []
        used = 0
        endchar = 0
        for t in tokens:
            if self.charlimit and t.endchar > self.charlimit:
                break
            if first is None:
                first = t.startchar
                used = 0
            endchar = t.endchar
            used += t.endchar - t.startchar
            if t.matched:
                hits.append(t)
            if endchar < n and text[endchar] in ends:
                if endchar + 1 < n and text[endchar + 1] in ends:
                    continue  # "..." is not a sentence break
                if hits and used <= self.maxchars:
                    yield _bounded(text, hits, first, endchar)
                hits, first, used = [], None, 0
        if hits:
            yield _bounded(text, hits, first, endchar)


class ContextFragmenter:
    """Matched terms aggregated with `surround` chars of context either
    side, split when a fragment would exceed `maxchars`
    (highlight.py:429-515)."""

    def __init__(self, maxchars: int = 200, surround: int = 20,
                 charlimit: int = DEFAULT_CHARLIMIT):
        self.maxchars = maxchars
        self.surround = surround
        self.charlimit = charlimit

    def fragment_tokens(self, text: str, tokens: Iterable[Tok]):
        surround = self.surround
        # char budget remaining before the open fragment closes; negative
        # means no fragment is open
        budget = -1
        first: Optional[int] = None
        # startchars of recent non-matched tokens: the pre-context pool
        pre: deque = deque()
        hits: List[Tok] = []
        used = 0
        endchar = 0
        for t in tokens:
            if self.charlimit and t.endchar > self.charlimit:
                break
            tlen = t.endchar - t.startchar
            endchar = t.endchar
            if budget < 0 and not t.matched:
                pre.append(t.startchar)
                while pre and endchar - pre[0] > surround:
                    pre.popleft()
            elif used + tlen > self.maxchars:
                budget = 0
            elif t.matched:
                budget = surround
                if first is None:
                    if pre:
                        first = pre[0]
                    else:
                        first = t.startchar
                        budget += surround  # unused front context
                hits.append(t)
            if budget >= 0:
                used += tlen
                budget -= tlen
                if budget <= 0:
                    yield _bounded(text, hits, first, endchar)
                    hits, first, used = [], None, 0
                    pre = deque()
        if hits:
            yield _bounded(text, hits, first, endchar)


class PinpointFragmenter:
    """NON-retokenizing fragmenter: builds fragments directly from matched
    char spans (highlight.py:517-601).  Pairs with indexes built with the
    Characters formats, whose postings already store
    startchars/endchars — see :func:`highlight_spans`."""

    def __init__(self, maxchars: int = 200, surround: int = 20,
                 autotrim: bool = False,
                 charlimit: int = DEFAULT_CHARLIMIT):
        self.maxchars = maxchars
        self.surround = surround
        self.autotrim = autotrim
        self.charlimit = charlimit

    def fragment_tokens(self, text: str, tokens: Iterable[Tok]):
        return self.fragment_matches(
            text, [t for t in tokens if t.matched]
        )

    def _trim(self, f: Fragment) -> None:
        text, start, end = f.text, f.startchar, f.endchar
        sp = text.find(" ", start, end)
        if sp > 0:
            start = sp + 1
        sp = text.rfind(" ", start, end)
        if sp > 0:
            end = sp
        if f.matches:
            start = min(start, f.matches[0].startchar)
            end = max(end, f.matches[-1].endchar)
        f.startchar, f.endchar = start, end

    def fragment_matches(self, text: str, tokens: List[Tok]):
        maxchars, surround = self.maxchars, self.surround
        j = -1
        for i, t in enumerate(tokens):
            if j >= i:
                continue
            j = i
            left, right = t.startchar, t.endchar
            if self.charlimit and right > self.charlimit:
                break
            used = right - left
            # greedily absorb following matches while they stay within
            # the surround gap and the fragment char budget
            while j < len(tokens) - 1 and used < maxchars:
                nxt = tokens[j + 1]
                if (nxt.endchar - right <= surround
                        and nxt.endchar - left <= maxchars):
                    j += 1
                    used += nxt.endchar - nxt.startchar
                    right = nxt.endchar
                else:
                    break
            f = Fragment(
                text, tokens[i:j + 1],
                max(0, left - surround), min(len(text), right + surround),
            )
            if self.autotrim:
                self._trim(f)
            yield f


def highlight_spans(text: str, spans, formatter=None,
                    fragmenter=None, top: int = 3, scorer=None,
                    minscore: float = 1, order=None) -> str:
    """Highlight from STORED char spans — (term, startchar, endchar)
    triples, e.g. one row of ``Searcher.payloads(term)`` on an index built
    with ``format="characters"`` — without re-analyzing the text (the
    reference's PinpointFragmenter path for Characters-format fields)."""
    toks = sorted(
        (Tok(t, sc, ec, matched=True) for t, sc, ec in spans),
        key=lambda x: x.startchar,
    )
    fragmenter = fragmenter or PinpointFragmenter()
    formatter = formatter or HtmlFormatter(tagname="b")
    scorer = scorer or BasicFragmentScorer()
    order = order or FIRST
    frags = fragmenter.fragment_tokens(text, toks)
    return formatter(text, top_fragments(frags, top, scorer, order,
                                         minscore))


# -- scoring + ordering (highlight.py:605-642) --------------------------------


class BasicFragmentScorer:
    def __call__(self, f: Fragment) -> float:
        score = sum(t.boost for t in f.matches)
        return score * ((len(f.matched_terms) * 100) or 1)


def SCORE(f: Fragment):
    return 1


def FIRST(f: Fragment):
    return f.startchar


def LONGER(f: Fragment):
    return -len(f)


def SHORTER(f: Fragment):
    return len(f)


def top_fragments(fragments, count: int, scorer, order,
                  minscore: float = 1):
    best = nlargest(count, ((scorer(f), f) for f in fragments))
    keep = [f for s, f in best if s >= minscore]
    keep.sort(key=order)
    return keep


# -- formatters (highlight.py:648-860) ----------------------------------------


class Formatter:
    between = "..."

    def _text(self, text: str) -> str:
        return text

    def format_token(self, text: str, token: Tok) -> str:
        raise NotImplementedError

    def format_fragment(self, fragment: Fragment) -> str:
        out = []
        text = fragment.text
        cursor = fragment.startchar
        # position-sorted, longest-first on ties, so overlapping tokens
        # pick the longest (the reference's CJK-overlap rule)
        for t in sorted(
            fragment.matches,
            key=lambda t: (t.startchar, -(t.endchar - t.startchar)),
        ):
            if t.startchar < cursor:
                continue
            if t.startchar > cursor:
                out.append(self._text(text[cursor:t.startchar]))
            out.append(self.format_token(text, t))
            cursor = t.endchar
        out.append(self._text(text[cursor:fragment.endchar]))
        return "".join(out)

    def format(self, fragments) -> str:
        return self.between.join(
            self.format_fragment(f) for f in fragments
        )

    def __call__(self, text, fragments):
        return self.format(fragments)


class NullFormatter(Formatter):
    def format_token(self, text: str, token: Tok) -> str:
        return text[token.startchar:token.endchar]


class UppercaseFormatter(Formatter):
    def __init__(self, between: str = "..."):
        self.between = between

    def format_token(self, text: str, token: Tok) -> str:
        return text[token.startchar:token.endchar].upper()


class HtmlFormatter(Formatter):
    """``<strong class="match termN">word</strong>`` markup; N cycles
    through `maxclasses` per unique matched text (highlight.py:770-860)."""

    def __init__(self, tagname: str = "strong", between: str = "...",
                 classname: str = "match", termclass: str = "term",
                 maxclasses: int = 5, attrquote: str = '"'):
        self.tagname = tagname
        self.between = between
        self.classname = classname
        self.termclass = termclass
        self.maxclasses = maxclasses
        self.attrquote = attrquote
        self.seen: dict = {}

    def _text(self, text: str) -> str:
        return _htmlescape(text, quote=False)

    def format_token(self, text: str, token: Tok) -> str:
        ttext = self._text(text[token.startchar:token.endchar])
        num = self.seen.get(ttext)
        if num is None:
            num = len(self.seen) % self.maxclasses
            self.seen[ttext] = num
        q = self.attrquote
        return (
            f"<{self.tagname} class={q}{self.classname} "
            f"{self.termclass}{num}{q}>{ttext}</{self.tagname}>"
        )

    def clean(self):
        self.seen = {}


# event-stream formatter (Genshi equivalent) ----------------------------------

# event kind markers, standing in for genshi.core START/END/TEXT
STREAM_START = "START"
STREAM_END = "END"
STREAM_TEXT = "TEXT"
_NOPOS = (None, -1, -1)


class GenshiEventFormatter(Formatter):
    """The reference's GenshiFormatter (highlight.py:850-914) without the
    Genshi dependency: emits the same ``(kind, data, pos)`` event-tuple
    stream its Genshi ``Stream`` would carry — ``(START, (qname, attrs),
    pos)`` / ``(TEXT, text, pos)`` / ``(END, qname, pos)`` with the
    reference's ``(None, -1, -1)`` placeholder pos — as a plain list.
    Adjacent TEXT events merge exactly like the reference's ``_add_text``
    (highlight.py:874-878).

    Documented deviation: the reference's ``format_fragment`` appends the
    raw ``(text, token, replace)`` TUPLE to the stream (highlight.py:900)
    instead of the token's START/TEXT/END events, producing a malformed
    stream that Genshi cannot serialize; we emit the events its own
    ``format_token`` builds (highlight.py:881-891), which is the
    documented intent ("HTML formatting around the matched terms").
    Second deviation: the reference's tail slice is ``text[index:]`` — the
    remainder of the ENTIRE document, not the fragment window
    (highlight.py:902-903) — which would dump everything after the last
    match of a Context/Sentence fragment into its stream; we honor
    ``fragment.endchar`` like every string formatter in the module."""

    def __init__(self, qname: str = "strong", between: str = "..."):
        self.qname = qname
        self.between = between

    def _add_text(self, text: str, output: list) -> None:
        if output and output[-1][0] == STREAM_TEXT:
            output[-1] = (STREAM_TEXT, output[-1][1] + text, _NOPOS)
        else:
            output.append((STREAM_TEXT, text, _NOPOS))

    def format_token(self, text: str, token: Tok) -> list:
        txt = text[token.startchar:token.endchar]
        return [
            (STREAM_START, (self.qname, ()), _NOPOS),
            (STREAM_TEXT, txt, _NOPOS),
            (STREAM_END, self.qname, _NOPOS),
        ]

    def format_fragment(self, fragment: Fragment) -> list:
        output: list = []
        index = fragment.startchar
        text = fragment.text
        for t in fragment.matches:
            if t.startchar > index:
                self._add_text(text[index:t.startchar], output)
            output.extend(self.format_token(text, t))
            index = t.endchar
        if index < fragment.endchar:
            self._add_text(text[index:fragment.endchar], output)
        return output

    def format(self, fragments) -> list:
        output: list = []
        first = True
        for fragment in fragments:
            if not first:
                self._add_text(self.between, output)
            # extend + re-merge: a fragment-leading TEXT event merges into
            # the trailing `between` text, like Stream concatenation after
            # the reference's _add_text
            for ev in self.format_fragment(fragment):
                if ev[0] == STREAM_TEXT:
                    self._add_text(ev[1], output)
                else:
                    output.append(ev)
            first = False
        return output

    def __call__(self, text, fragments):
        return self.format(fragments)


def render_event_stream(stream) -> str:
    """Serialize a :class:`GenshiEventFormatter` stream to HTML markup —
    what ``genshi.core.Stream.render('html')`` would produce for these
    events (convenience; not part of the reference surface)."""
    out = []
    for kind, data, _ in stream:
        if kind == STREAM_START:
            qn, attrs = data
            a = "".join(f' {k}="{_htmlescape(v)}"' for k, v in attrs)
            out.append(f"<{qn}{a}>")
        elif kind == STREAM_END:
            out.append(f"</{data}>")
        else:
            out.append(_htmlescape(data, quote=False))
    return "".join(out)


# -- entry points --------------------------------------------------------------


def highlight(text: str, terms: Iterable[str], analyzer=None,
              fragmenter=None, formatter=None, top: int = 3,
              scorer=None, minscore: float = 1, order=FIRST) -> str:
    """Reference highlight() (highlight.py:928-959): returns the top
    fragments of `text` with `terms` marked up."""
    fragmenter = fragmenter or ContextFragmenter()
    formatter = formatter or HtmlFormatter(tagname="b")
    scorer = scorer or BasicFragmentScorer()
    order = order or FIRST
    if isinstance(fragmenter, type):
        fragmenter = fragmenter()
    if isinstance(formatter, type):
        formatter = formatter()
    if isinstance(scorer, type):
        scorer = scorer()
    termset = frozenset(t.lower() for t in terms)
    tokens = tokenize_highlight(text, analyzer)
    for t in tokens:
        t.matched = t.text in termset
    fragments = fragmenter.fragment_tokens(text, tokens)
    return formatter(text, top_fragments(fragments, top, scorer, order,
                                         minscore))


def snippet(
    text: str,
    terms: Iterable[str],
    before: int = 40,
    after: int = 40,
    max_fragments: int = 3,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
    ellipsis: str = "...",
) -> str:
    """Lightweight window API: up to `max_fragments` context fragments
    with terms marked (kept for callers that don't need the
    fragmenter/formatter pipeline)."""
    terms = {t.lower() for t in terms}
    spans: List[Tuple[int, int, str]] = []
    for m in re.finditer(DEFAULT_PATTERN, text):
        t = m.group(0).lower()
        if t in terms:
            spans.append((m.start(), m.end(), t))
    if not spans:
        return ""
    clusters: List[List[Tuple[int, int, str]]] = []
    for s in spans:
        if clusters and s[0] - clusters[-1][-1][1] <= before + after:
            clusters[-1].append(s)
        else:
            clusters.append([s])
    scored = sorted(
        clusters,
        key=lambda c: (-len({t for _, _, t in c}), -len(c), c[0][0]),
    )[:max_fragments]
    scored.sort(key=lambda c: c[0][0])
    frags = []
    for c in scored:
        lo = max(0, c[0][0] - before)
        hi = min(len(text), c[-1][1] + after)
        piece = []
        cur = lo
        for s, e, _ in c:
            piece.append(text[cur:s])
            piece.append(pre_tag + text[s:e] + post_tag)
            cur = e
        piece.append(text[cur:hi])
        frag = "".join(piece)
        if lo > 0:
            frag = ellipsis + frag
        if hi < len(text):
            frag = frag + ellipsis
        frags.append(frag)
    return ellipsis.join(frags) if len(frags) > 1 else frags[0]


def highlight_hits(
    rows, texts_by_uid: dict, terms: Iterable[str], **kw
) -> List[Tuple[str, str]]:
    """Convenience: [(uid, snippet)] for collected search rows."""
    out = []
    for r in rows:
        uid = r["uid"]
        out.append((uid, snippet(texts_by_uid.get(uid, ""), terms, **kw)))
    return out
