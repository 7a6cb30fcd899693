"""Spelling suggestions ("did you mean") — reference spelling.py semantics.

ReaderCorrector ranking (spelling.py:94-115): candidates are lexicon terms
within Damerau-Levenshtein `maxdist` sharing a `prefix`; each scores
``-(maxdist + 0.5/frequency)`` (NOTE: the reference uses the *parameter*
maxdist, not the term's actual distance — ranking is therefore frequency
descending, then alphabetical; we replicate that exactly) and the top
`limit` are returned sorted by (score desc, term asc).

The lexicon slice is a pushed-down prefix + length-window scan of
term_stats; the DP distance runs on the (small) collected candidate set,
like reading.py:516-544.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import functions as F

from whoosh_reloaded_spark.query.planner import (
    FUZZY_DRIVER_LIMIT,
    Searcher,
    _make_osa_match_udf,
    osa_distance,
)


def suggest(searcher: Searcher, text: str, limit: int = 5, maxdist: int = 2,
            prefix: int = 0) -> List[str]:
    ts = searcher.ix.term_stats
    c = ts
    if prefix:
        c = c.where(F.col("term").startswith(text[:prefix]))
    # length pushdown: |len(term) - len(text)| <= maxdist
    c = c.where(
        (F.length("term") >= len(text) - maxdist)
        & (F.length("term") <= len(text) + maxdist)
    )
    # bounded probe (same pattern as fuzzy expansion, planner.py): a small
    # windowed slice runs the DP driver-side with no extra Python-worker
    # job; a head-size slice (prefix=0 over a huge lexicon) runs the OSA DP
    # DISTRIBUTED in an Arrow-batched pandas UDF and collects only the
    # matches — no path collects an unbounded lexicon slice.
    probe = c.select("term", "total_weight").limit(
        FUZZY_DRIVER_LIMIT + 1
    ).collect()
    if len(probe) > FUZZY_DRIVER_LIMIT:
        within = _make_osa_match_udf(text, maxdist)
        probe = (
            c.where(within(F.col("term")))
            .select("term", "total_weight")
            .collect()
        )
        pairs = [(r["term"], float(r["total_weight"])) for r in probe]
    else:
        pairs = [
            (r["term"], float(r["total_weight"]))
            for r in probe
            if osa_distance(text, r["term"], maxdist) <= maxdist
        ]
    scored = []
    for t, f in pairs:
        if t == text:
            continue  # the word itself is never suggested (spelling.py:52)
        score = 0.0 - (maxdist + (1.0 / (f or 1.0) * 0.5))
        scored.append((score, t))
    scored.sort(key=lambda x: (0 - x[0], x[1]))
    return [t for _, t in scored[:limit]]
