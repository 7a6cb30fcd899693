"""Highlighting — fragment + format matched terms in stored text.

The reference's highlight pipeline (highlight.py:313-920) is fragmenters x
scorers x formatters over analyzed token streams with char offsets.  It runs
over the TOP-K stored texts only (tiny data), so this is driver-side Python
by design — same as the reference, which highlights per displayed Hit.

Implements the ContextFragmenter/HtmlFormatter defaults: find matched-term
char spans with the analyzer's regex, grow a context window around hit
clusters, score fragments by distinct matched terms then hit count, return
the top fragments with terms wrapped in markup.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Tuple

from whoosh_reloaded_spark.analysis import DEFAULT_PATTERN, STOP_WORDS


def _term_spans(text: str, terms: set) -> List[Tuple[int, int, str]]:
    out = []
    for m in re.finditer(DEFAULT_PATTERN, text):
        t = m.group(0).lower()
        if t in terms:
            out.append((m.start(), m.end(), t))
    return out


def highlight(
    text: str,
    terms: Iterable[str],
    before: int = 40,
    after: int = 40,
    max_fragments: int = 3,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
    ellipsis: str = "...",
) -> str:
    """Return up to `max_fragments` context fragments with terms marked."""
    terms = {t.lower() for t in terms}
    spans = _term_spans(text, terms)
    if not spans:
        return ""
    # cluster hits whose windows overlap
    clusters: List[List[Tuple[int, int, str]]] = []
    for s in spans:
        if clusters and s[0] - clusters[-1][-1][1] <= before + after:
            clusters[-1].append(s)
        else:
            clusters.append([s])
    # score: distinct terms desc, then hit count desc, then position asc
    scored = sorted(
        clusters,
        key=lambda c: (-len({t for _, _, t in c}), -len(c), c[0][0]),
    )[:max_fragments]
    scored.sort(key=lambda c: c[0][0])  # display in document order

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
        out.append((uid, highlight(texts_by_uid.get(uid, ""), terms, **kw)))
    return out
