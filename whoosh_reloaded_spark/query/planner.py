"""Physical planning: Query AST -> DataFrame plan -> top-k results.

The reference executes queries with a single-threaded pull-based Matcher tree
(src/whoosh/matching/*.py); here each AST node evaluates to a docid-unique
DataFrame of ``(docid, score)`` and the combinators become relational ops:

    And       -> union + groupBy(docid) having count == n, score = sum
                 (IntersectionMatcher sums scores, matching/binary.py:95-96)
    Or        -> union + groupBy(docid).sum  (UnionMatcher, binary.py:252-268)
    DisMax    -> groupBy(docid): max + tiebreak*(sum-max) (binary.py:298-404)
    AndNot    -> left-anti join          (binary.py:559-676)
    Require   -> left-semi join          (wrappers.py:431-494)
    AndMaybe  -> left-outer join         (binary.py:677-793)
    Not       -> anti join vs docmeta    (matching/wrappers.py:335-430)
    Phrase    -> join position arrays on docid + higher-order-function
                 adjacency intersection  (spans.py:653-699 semantics)
    top-k     -> orderBy(desc(score), asc(docid)).limit(k)
                 == TakeOrderedAndProject, ties broken by LOWER docid first
                 exactly like the reference heap (collectors.py:466-483)

idf values for the query's terms are looked up once per search and embedded
as literals (the reference caches idf per searcher, searching.py:334-351) —
no join against term_stats on the hot path.  Every score expression runs in
whole-stage codegen; Python appears only in driver-side planning.
"""

from __future__ import annotations

import re
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whoosh_reloaded_spark.index.build import InvertedIndex
from whoosh_reloaded_spark.query import ast as Q
from whoosh_reloaded_spark.scoring import (
    BM25F,
    ScoreContext,
    WeightingModel,
    idf_value,
)

TOO_MANY_CLAUSES = 1024  # compound.py:282 heuristic bound for expansions
FUZZY_DRIVER_LIMIT = 20_000  # fuzzy slices below this run the DP driver-side
PHRASE_BROADCAST_DF = 2_000_000  # rare-word docid frames below this df are
# broadcast for the phrase pre-prune semi-join (~16 MB of longs)


def levenshtein_distance(a: str, b: str, limit: Optional[int] = None) -> int:
    """Plain Levenshtein (insert/delete/substitute — NO transposition): the
    metric the reference actually applies to fuzzy expansion and spelling.
    Its levenshtein_automaton (automata/lev.py:4-27) builds only
    deletion/insertion/substitution edges, so ``terms_within`` — the engine
    behind FuzzyTerm._btexts (query/terms.py:511-513) and ReaderCorrector
    (spelling.py:110) — never matches transposition-only neighbors, despite
    docstrings that say "Damerau-Levenshtein" (the shipped
    support/levenshtein.damerau_levenshtein has no runtime callers).
    Verified live: FuzzyTerm("abdc", maxdist=1) does NOT match "abcd".
    Banded DP with early exit at `limit`."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if limit is not None and abs(la - lb) > limit:
        return limit + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if limit is not None and min(cur) > limit:
            return limit + 1
        prev = cur
    return prev[lb]


def osa_distance(a: str, b: str, limit: Optional[int] = None) -> int:
    """Restricted Damerau-Levenshtein (optimal string alignment) distance —
    the classic public DP algorithm, equivalent to the reference's shipped
    support/levenshtein.damerau_levenshtein.  NOT used on the fuzzy/spelling
    paths (see :func:`levenshtein_distance` for why); kept for users who
    want the transposition-aware metric explicitly."""
    la, lb = len(a), len(b)
    if limit is not None and abs(la - lb) > limit:
        return limit + 1
    prev2: Optional[List[int]] = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
                and a[i - 1] != b[j - 1]
            ):
                v = min(v, prev2[j - 2] + 1)
            cur[j] = v
        prev2, prev = prev, cur
        if limit is not None and min(prev) > limit:
            return limit + 1
    return prev[lb]


def _make_lev_match_udf(qtext: str, maxdist: int):
    """Arrow-batched predicate: levenshtein_distance(qtext, term) <= maxdist.
    Runs the DP on executors so fuzzy expansion never collects the
    un-filtered lexicon slice to the driver."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def within(terms):
        return terms.map(
            lambda t: levenshtein_distance(qtext, t, maxdist) <= maxdist
        )

    return within


# backwards-compat alias for external callers of the pre-round-4 name
_make_osa_match_udf = _make_lev_match_udf


def range_condition(q) -> "F.Column":
    """Native column predicate for a NumericRange/DateRange node — Catalyst
    pushes it into the scan (the reference needs tiered terms for this,
    fields.py:563; a columnar engine gets it for free).  Usable against any
    DataFrame carrying the field, not just docmeta."""
    c = F.col(q.fieldname)
    cond = F.lit(True)
    if q.start is not None:
        cond = cond & (c > q.start if q.startexcl else c >= q.start)
    if q.end is not None:
        cond = cond & (c < q.end if q.endexcl else c <= q.end)
    return cond


def _sql_str(s: str) -> str:
    """A SQL single-quoted string literal with standard escaping."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def glob_to_java_regex(pat: str) -> str:
    """Translate a * / ? glob into an anchored Java regex for rlike()."""
    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def glob_literal_prefix(pat: str) -> str:
    """Leading literal run of a glob — pushed down as startswith
    (the reference slices the term dict the same way, terms.py:282-307)."""
    for i, ch in enumerate(pat):
        if ch in "*?[":
            return pat[:i]
    return pat


class Searcher:
    """Plans and executes queries against an :class:`InvertedIndex`."""

    def __init__(self, ix: InvertedIndex, weighting: Optional[WeightingModel] = None):
        self.ix = ix
        self.weighting = weighting or BM25F()
        stats = ix.ensure_stats()
        self.N = int(stats["doc_count"])
        self.avgfl = float(stats["avg_field_length"]) or 1.0
        self.field_length = int(stats["field_length"])
        self._idf_cache: Dict[str, float] = {}
        self._df_cache: Dict[str, int] = {}
        self._cf_cache: Dict[str, float] = {}
        # multiterm expansion memo, keyed by the node's repr: the index is
        # an immutable snapshot (like the stats caches above), so the same
        # Prefix/Wildcard/Fuzzy/Range node always expands identically —
        # re-searching must not re-pay the lexicon collect round-trips
        # (round 6: 3 of the 5 per-repetition Spark jobs of every
        # multiterm bench query were repeated expansion lookups)
        self._expand_cache: Dict[str, Optional[List[str]]] = {}

    # -- statistics ----------------------------------------------------------

    def _lookup_stats(self, terms: Sequence[str]) -> None:
        missing = [t for t in set(terms) if t not in self._df_cache]
        if not missing:
            return
        rows = (
            self.ix.term_stats.where(F.col("term").isin(missing))
            .select("term", "df", "total_weight")
            .collect()
        )
        found = {r["term"]: (int(r["df"]), float(r["total_weight"])) for r in rows}
        for t in missing:
            df, cf = found.get(t, (0, 0.0))
            self._df_cache[t] = df
            self._cf_cache[t] = cf
            self._idf_cache[t] = idf_value(self.N, df)

    def score_context(
        self, terms: Sequence[str],
        weight=None, len_byte=None, length=None, positions=None,
    ) -> ScoreContext:
        """Build a ScoreContext for `terms` with idf/cf literal maps.
        Single-term contexts embed plain literals (no per-row map lookup);
        distinct-valued stats collapse the same way."""
        self._lookup_stats(terms)
        uniq = list(dict.fromkeys(terms))

        def _stat_col(cache: Dict[str, float]) -> "F.Column":
            vals = {cache[t] for t in uniq}
            if len(vals) == 1:
                return F.lit(next(iter(vals)))
            pairs = []
            for t in uniq:
                pairs += [F.lit(t), F.lit(cache[t])]
            return F.element_at(F.create_map(*pairs), F.col("term"))

        return ScoreContext(
            weight=weight if weight is not None else F.col("weight"),
            len_byte=len_byte if len_byte is not None else F.col("len_byte"),
            length=length if length is not None else F.col("length"),
            idf=_stat_col(self._idf_cache),
            cf=_stat_col(self._cf_cache),
            N=self.N,
            avgfl=self.avgfl,
            field_length=self.field_length,
            fieldname=self.ix.fieldname,
            positions=positions,
        )

    def payloads(self, term: str) -> DataFrame:
        """Per-doc posting payloads for `term`: docid/tf/weight plus
        whichever payload arrays the index's posting format stored
        (positions; pos_boosts for PositionBoosts; startchars/endchars
        for Characters/CharacterBoosts) — the reference's
        ``Matcher.value_as("positions"/"characters"/...)`` surface
        (mcore.py:240-280) as a pushed-down, column-pruned frame."""
        p = self.ix.postings
        cols = [
            c
            for c in ("positions", "pos_boosts", "startchars", "endchars")
            if c in p.columns
        ]
        return p.where(F.col("term") == term).select(
            "docid", "tf", "weight", *cols
        )

    # -- leaf evaluation -----------------------------------------------------

    def _scored_postings(
        self, terms: Sequence[str], boosts: Optional[Dict[str, float]] = None,
        with_positions: bool = False, raw_weight: bool = False,
    ) -> DataFrame:
        """Postings restricted to `terms` with a vectorized score column.

        `term IN (...)` reaches the parquet scan as a pushed filter over the
        term-sorted files (data skipping ≙ the reference's term dictionary
        lookup).  idf constants are embedded as a literal map.
        """
        terms = [t for t in dict.fromkeys(terms)]
        p = self.ix.postings.where(F.col("term").isin(list(terms)))
        if raw_weight:
            # constant-score context (weighting=None -> WeightScorer,
            # scoring.py:134-158): score = stored weight
            score = F.col("weight")
        else:
            # idf/cf via a tiny driver lookup cached per searcher (the
            # reference caches idf the same way, searching.py:334-351).
            # A broadcast-join alternative was measured SLOWER per query
            # (broadcast materialization is its own job + join overhead).
            pos_col = (
                F.col("positions")
                if getattr(self.weighting, "needs_positions", False)
                else None
            )
            score = self.weighting.score_col(
                self.score_context(terms, positions=pos_col)
            )
        if boosts and any(float(b) != 1.0 for b in boosts.values()):
            # all-1.0 boosts (the common unboosted query) skip both the
            # map construction and the per-row lookup entirely
            bpairs = []
            for t in terms:
                bpairs += [F.lit(t), F.lit(float(boosts.get(t, 1.0)))]
            score = score * F.element_at(F.create_map(*bpairs), F.col("term"))
        cols = ["term", "docid", score.alias("score")]
        if with_positions:
            if "positions" not in p.columns:
                raise ValueError(
                    "this index was built without positions "
                    "(format='frequency'/'existence'); positional queries "
                    "(Phrase/Ordered/Span) need format='positions'"
                )
            cols.append("positions")
        return p.select(*cols)

    def _all_docs(self, score: float = 1.0) -> DataFrame:
        return self.ix.docmeta.select(
            "docid", F.lit(float(score)).alias("score")
        )

    @staticmethod
    def _boosted_frame(df: DataFrame, boost: float) -> DataFrame:
        """score *= boost as a plain projection; identity when boost is 1
        so the common case adds nothing to the plan."""
        if boost == 1.0:
            return df
        return df.select(
            "docid", (F.col("score") * F.lit(boost)).alias("score")
        )

    # -- lexicon expansion for multi-term queries ----------------------------

    def _pattern_predicate(self, q: Q.Query):
        """Pushdown predicate builder for a multiterm query: a function
        mapping a term Column to a boolean Column.  EXACT for Prefix/
        Wildcard/Regex/TermRange/Variations; a SUPERSET (prefix slice +
        length window) for FuzzyTerm, whose exact filter is the OSA DP.
        Applicable to term_stats AND postings — both carry `term`, so the
        same predicate reaches both parquet scans as a pushed filter."""
        if isinstance(q, Q.Prefix):
            return lambda c: c.startswith(q.text)
        if isinstance(q, Q.Wildcard):
            pre = glob_literal_prefix(q.text)
            rx = glob_to_java_regex(q.text)
            if pre:
                return lambda c: c.startswith(pre) & c.rlike(rx)
            return lambda c: c.rlike(rx)
        if isinstance(q, Q.Regex):
            return lambda c: c.rlike(q.text)
        if isinstance(q, Q.TermRange):
            def _range(c):
                cond = F.lit(True)
                if q.start is not None:
                    cond = cond & (
                        (c > q.start) if q.startexcl else (c >= q.start)
                    )
                if q.end is not None:
                    cond = cond & ((c < q.end) if q.endexcl else (c <= q.end))
                return cond

            return _range
        if isinstance(q, Q.Variations):
            from whoosh_reloaded_spark.variations import variations

            cand = sorted(set(variations(q.text)))
            return lambda c: c.isin(cand)
        if isinstance(q, Q.FuzzyTerm):
            pre = q.text[: q.prefixlength]
            n = len(q.text)

            def _window(c):
                cond = F.abs(F.length(c) - F.lit(n)) <= q.maxdist
                if pre:
                    cond = c.startswith(pre) & cond
                return cond

            return _window
        raise TypeError(f"not a multiterm query: {q!r}")

    def _multiterm_frame(self, q: Q.Query) -> DataFrame:
        """EXACT matching lexicon slice as a DataFrame (term, df,
        total_weight) — the relational counterpart of the reference's full
        expansion (terms.py:293-307), with no driver round-trip.  Fuzzy
        adds the distributed Levenshtein Arrow-UDF filter on top of the
        pushed superset window."""
        pred = self._pattern_predicate(q)
        c = self.ix.term_stats.where(pred(F.col("term")))
        if isinstance(q, Q.FuzzyTerm):
            within = _make_lev_match_udf(q.text, q.maxdist)
            c = c.where(within(F.col("term")))
        return c.select("term", "df", "total_weight")

    def expand_terms(self, q: Q.Query) -> Optional[List[str]]:
        """Driver-side expansion when it is SMALL: the matching terms
        (<= TOO_MANY_CLAUSES of them) as a sorted list, for the pushed
        `term IN (...)` scan plan.  Returns **None** when the expansion
        overflows TOO_MANY_CLAUSES — callers then switch to the relational
        postings<->lexicon-frame join plan (`_scored_postings_rel`), which
        expands FULLY with zero driver round-trip.  The reference expands
        fully too (terms.py:293-307); its TOO_MANY_CLAUSES is an Or
        *strategy* threshold (compound.py:282), not a result cap — so no
        path here truncates results."""
        key = repr(q)
        if key in self._expand_cache:
            return self._expand_cache[key]
        out = self._expand_terms_uncached(q)
        self._expand_cache[key] = out
        return out

    def _expand_terms_uncached(self, q: Q.Query) -> Optional[List[str]]:
        if isinstance(q, Q.Variations):
            # driver-side candidate generation (a few dozen), then one
            # pushed IN-filter scan keeps lexicon members (terms.py:551-561)
            from whoosh_reloaded_spark.variations import variations

            cand = sorted(set(variations(q.text)))
            rows = (
                self.ix.term_stats.where(F.col("term").isin(cand))
                .select("term")
                .collect()
            )
            return sorted(r["term"] for r in rows)
        pred = self._pattern_predicate(q)
        c = self.ix.term_stats.where(pred(F.col("term")))
        if isinstance(q, Q.FuzzyTerm):
            # bounded probe: collect at most LIMIT+1 windowed terms; a small
            # slice (the common case — prefix + length window prune hard)
            # runs the DP on the driver with no extra Python-worker job.  A
            # head-term slice falls back to the distributed Arrow UDF with
            # the TOO_MANY_CLAUSES cap applied BEFORE collect, so no path
            # ever collects an unbounded term list (round-2 ADVICE fix).
            cand = [
                r["term"]
                for r in c.select("term").limit(FUZZY_DRIVER_LIMIT + 1).collect()
            ]
            if len(cand) <= FUZZY_DRIVER_LIMIT:
                out = sorted(
                    t
                    for t in cand
                    if levenshtein_distance(q.text, t, q.maxdist)
                    <= q.maxdist
                )
                return out if len(out) <= TOO_MANY_CLAUSES else None
            within = _make_lev_match_udf(q.text, q.maxdist)
            matches = (
                c.select("term")
                .where(within(F.col("term")))
                .limit(TOO_MANY_CLAUSES + 1)
                .collect()
            )
            if len(matches) > TOO_MANY_CLAUSES:
                return None
            return sorted(r["term"] for r in matches)
        rows = c.select("term").limit(TOO_MANY_CLAUSES + 1).collect()
        if len(rows) > TOO_MANY_CLAUSES:
            return None
        return sorted(r["term"] for r in rows)

    def _scored_postings_rel(
        self, q: Q.Query, with_positions: bool = False
    ) -> DataFrame:
        """Relational scoring plan for an OVERFLOWING multiterm expansion:
        postings (pattern predicate pushed to the scan) joined with the
        exact lexicon frame on `term`, per-term idf/cf computed as column
        expressions from the joined df/total_weight — no IN-list, no
        driver round-trip, expansion is FULL.  AQE sizes the join (the
        lexicon side is usually broadcast-able even when > 1024 terms)."""
        pred = self._pattern_predicate(q)
        p = self.ix.postings.where(pred(F.col("term")))
        mf = self._multiterm_frame(q)
        joined = p.join(mf, "term")
        idf = F.log(F.lit(float(self.N)) / (F.col("df") + F.lit(1.0))) + F.lit(
            1.0
        )
        pos_col = (
            F.col("positions")
            if getattr(self.weighting, "needs_positions", False)
            and "positions" in p.columns
            else None
        )
        ctx = ScoreContext(
            weight=F.col("weight"),
            len_byte=F.col("len_byte"),
            length=F.col("length"),
            idf=idf,
            cf=F.col("total_weight").cast("double"),
            N=self.N,
            avgfl=self.avgfl,
            field_length=self.field_length,
            fieldname=self.ix.fieldname,
            positions=pos_col,
        )
        score = self.weighting.score_col(ctx)
        cols = ["term", "docid", score.alias("score")]
        if with_positions:
            cols.append("positions")
        return joined.select(*cols)

    # -- coordination (SQR) helpers -------------------------------------------

    def _eval_with_tm(self, c: Q.Query) -> DataFrame:
        """Child frame (docid, score, _tm) for the SQR matching count.
        `_tm` is the number of the child's live term matchers AT the doc
        (Matcher.matching_terms, mcore.py:112-124): constant for
        Term/Phrase/And (a match implies every leaf active), but PER-DOC
        for multiterm expansions and nested unscaled Ors, where only the
        terms the doc contains are active — the round-5 or-mode fuzz
        caught the constant upper bound overcounting
        ('alfa OR [alfa TO]').  Binary/Not children keep the documented
        constant approximation (the reference's own count there depends
        on cursor positions of non-matching branches)."""
        tmf = self._tm_frame(c)
        if tmf is not None:
            return self._eval(c).join(tmf, "docid", "left").select(
                "docid", "score",
                F.coalesce(F.col("_tm"), F.lit(0)).alias("_tm"),
            )
        return self._eval(c).withColumn(
            "_tm", F.lit(self._matching_term_count(c))
        )

    def _tm_frame(self, q: Q.Query) -> Optional[DataFrame]:
        """(docid, _tm) — per-doc count of q's term matchers active at the
        doc, for the term/phrase/multiterm/And/Or algebra; None when q
        needs the constant fallback.  Intersection children count their
        terms only on docs they match (inner join), matching the
        reference's skip_to-driven cursor placement."""
        if isinstance(q, Q.Term):
            self._lookup_stats([q.text])
            if self._df_cache[q.text] == 0:
                return None  # dead term: constant 0 fallback is exact
            return self.ix.postings.where(
                F.col("term") == q.text
            ).select("docid", F.lit(1).alias("_tm"))
        if isinstance(q, (Q.Phrase, Q.Ordered)):
            n = self._n_term_matchers(q)
            if n == 0:
                return None
            return self._eval(q).select("docid", F.lit(n).alias("_tm"))
        if isinstance(q, Q._MultiTerm):
            texts = self.expand_terms(q)
            if texts is None:
                return None
            return (
                self.ix.postings.where(F.col("term").isin(list(texts)))
                .groupBy("docid")
                .agg(F.count(F.lit(1)).alias("_tm"))
            )
        if isinstance(q, Q.Or):
            # scale is irrelevant here: the CoordMatcher wrapper is
            # transparent to term_matchers, so a nested scaled Or counts
            # like a plain union
            frames = [self._tm_frame(cc) for cc in q.children]
            if any(f is None for f in frames):
                return None
            u = frames[0]
            for f2 in frames[1:]:
                u = u.unionByName(f2)
            return u.groupBy("docid").agg(F.sum("_tm").alias("_tm"))
        if isinstance(q, Q.And):
            out = None
            for cc in q.children:
                f = self._tm_frame(cc)
                if f is None:
                    return None
                f = f.withColumnRenamed("_tm", "_tm_c")
                if out is None:
                    out = f.withColumnRenamed("_tm_c", "_tm")
                else:
                    out = out.join(f, "docid").select(
                        "docid",
                        (F.col("_tm") + F.col("_tm_c")).alias("_tm"),
                    )
            return out
        if isinstance(q, Q.AndNot):
            # at an AndNot-matched doc the excluded side's cursor is by
            # construction NOT at the doc (it would have excluded it), so
            # only the a side counts; _eval_with_tm's left join restricts
            # to matched docs (verified live: 'alfa ANDNOT bravo NOT
            # alfa' scores with m=1 at alfa docs, tc=3)
            return self._tm_frame(q.a)
        if isinstance(q, Q.Require):
            # both sides present at every matched doc
            fa, fb = self._tm_frame(q.a), self._tm_frame(q.b)
            if fa is None or fb is None:
                return None
            fb = fb.withColumnRenamed("_tm", "_tm_b")
            return fa.join(fb, "docid").select(
                "docid", (F.col("_tm") + F.col("_tm_b")).alias("_tm")
            )
        if isinstance(q, Q.AndMaybe):
            # a side always at matched docs; b side only where it matches
            fa, fb = self._tm_frame(q.a), self._tm_frame(q.b)
            if fa is None or fb is None:
                return None
            fb = fb.withColumnRenamed("_tm", "_tm_b")
            return fa.join(fb, "docid", "left").select(
                "docid",
                (
                    F.col("_tm") + F.coalesce(F.col("_tm_b"), F.lit(0))
                ).alias("_tm"),
            )
        if isinstance(q, Q.Not):
            # the inverse matcher's inner cursor parks on EXCLUDED docs,
            # never on the docs the Not (or its union siblings) matches —
            # 0 at-doc matchers even though its terms count toward tc
            return self.ix.docmeta.select(
                "docid", F.lit(0).alias("_tm")
            )
        if isinstance(
            q,
            (Q.Every, Q.NullQuery, Q.NumericRange, Q.DateRange, Q.ColumnQuery),
        ):
            # term-less leaves: their matchers carry no term, so they
            # contribute 0 active term matchers at any doc (round-6
            # or-mode fuzz find, "* ANDNOT 'alfa alfa'^2": the AndNot's
            # Every side must count 0, not fall back to the constant
            # that includes the prohibited side's terms)
            return self.ix.docmeta.select("docid", F.lit(0).alias("_tm"))
        return None

    def _n_term_matchers(self, q: Q.Query) -> int:
        """Number of LIVE leaf term matchers the reference builds for q
        (Matcher.term_matchers, mcore.py:103-110) — CoordMatcher's termcount
        (wrappers.py:542).  Live means present in the lexicon: a Term
        with no postings becomes a NullMatcher that make_binary_tree
        drops, so an OOV word contributes 0 — which is why the scaled
        Or of 'alfa zebra' (zebra unindexed) has termcount 1 and SQR
        factor (1-1)/1 = 0, scoring every doc 0.0 (round-5 or-mode fuzz
        find, verified live vs reference).  A phrase with any missing
        word is a NullMatcher wholesale."""
        if isinstance(q, Q.Term):
            # a df=0 term builds a LEAF NullMatcher, which never enters
            # the tree — 'alfa OR zebra' (zebra unindexed) has
            # construction-time termcount 1, so its SQR factor (1-1)/1
            # zeroes every score (round-5 or-mode fuzz, verified live).
            # Dead COMPOUND subtrees are different: an empty
            # intersection/AndNot keeps its live leaf matchers at
            # construction ('alfa AND bravo' that co-occur nowhere still
            # contributes 2) — only mid-iteration matcher REPLACEMENT
            # would prune them, and that path is the reference's
            # exhaustion artifact (test_reference_coord_exhaustion_
            # artifact), not semantics we mirror.
            self._lookup_stats([q.text])
            return 1 if self._df_cache[q.text] > 0 else 0
        if isinstance(q, (Q.Phrase, Q.Ordered)):
            # Phrase.matcher returns NullMatcher wholesale when ANY word
            # is missing from the field (positional.py is_leaf check), so
            # a phrase contributes len(words) live matchers or none
            self._lookup_stats(list(q.words))
            if all(self._df_cache[w] > 0 for w in q.words):
                return len(q.words)
            return 0
        if isinstance(q, Q._MultiTerm):
            small = self.expand_terms(q)
            if small is not None:
                return len(small)
            # overflowing expansion: exact count via a distributed count
            # aggregate over the lexicon frame (no term list on the driver)
            return int(self._multiterm_frame(q).count())
        if isinstance(
            q,
            (Q.Every, Q.NullQuery, Q.NumericRange, Q.DateRange, Q.ColumnQuery),
        ):
            return 0
        if isinstance(q, Q._Compound):
            return sum(self._n_term_matchers(c) for c in q.children)
        n = 0
        # `a`/`b`/`child` cover the binary/Not nodes; `q`/`qs`/`subqs`
        # cover the span wrappers (SpanFirst.q, SpanNear2.qs, SpanOr.subqs)
        # so span children of a scaled Or contribute their leaf term
        # matchers like the reference's Matcher.term_matchers traversal
        for attr in ("a", "b", "child", "q"):
            c = getattr(q, attr, None)
            if isinstance(c, Q.Query):
                n += self._n_term_matchers(c)
        for attr in ("qs", "subqs"):
            cs = getattr(q, attr, None)
            if cs:
                n += sum(
                    self._n_term_matchers(c)
                    for c in cs
                    if isinstance(c, Q.Query)
                )
        return n

    def _matching_term_count(self, q: Q.Query) -> int:
        """How many term matchers are active at a doc WHEN the child matches.
        Exact for Term/Phrase/Ordered/And (match implies every leaf active)
        and Not (complement docs activate none of the inner terms); for
        variable-contribution children (AndMaybe, nested Or survivors of
        normalize) this is the upper bound — documented approximation."""
        if isinstance(q, Q.Not):
            return 0
        if isinstance(q, Q.AndNot):
            # at an AndNot-matched doc the prohibited side's cursor is by
            # construction elsewhere: only the a side's matchers are
            # active (mirrors the _tm_frame AndNot branch)
            return self._matching_term_count(q.a)
        return self._n_term_matchers(q)

    # -- node evaluation -----------------------------------------------------

    def _eval(self, q: Q.Query) -> DataFrame:
        """Evaluate to a docid-unique (docid, score) frame."""
        from whoosh_reloaded_spark.query.spans import SpanEvaluator, SpanQuery

        spark = self.ix.postings.sparkSession
        if isinstance(q, SpanQuery):
            # a doc matches iff its span list is nonempty (already filtered
            # inside SpanEvaluator); score follows the wrapped matcher tree
            return SpanEvaluator(self).frame(q).select("docid", "score")
        if isinstance(q, Q.NullQuery):
            return spark.createDataFrame([], "docid long, score double")
        if isinstance(q, Q.Every):
            return self._all_docs(q.boost)
        if isinstance(q, Q.Term):
            df = self._scored_postings([q.text])
            return df.select("docid", (F.col("score") * F.lit(q.boost)).alias("score"))
        if isinstance(q, Q.Or) and all(
            isinstance(c, Q.Term) and c.fieldname == self.ix.fieldname
            for c in q.children
        ):
            # fused fast path: one scan, no per-child union.  Duplicate
            # term children SUM their boosts (round-5 fuzz fix: the
            # reference's Or sums each duplicate matcher's score, and
            # BM25 is linear in boost — a dict keyed by term was silently
            # keeping only the last boost)
            boosts: Dict[str, float] = {}
            for c in q.children:
                boosts[c.text] = boosts.get(c.text, 0.0) + c.boost
            df = self._scored_postings(list(boosts), boosts=boosts)
            tc = 0
            if q.scale:
                # coordination bonus: the SQR function (CoordMatcher,
                # matching/wrappers.py — from the published V-Twin paper):
                # (score + (matching-1)/(termcount-scale)^2)*((tc-1)/tc)
                # termcount counts LIVE matchers only: OOV terms become
                # NullMatchers the reference's tree drops (see
                # _n_term_matchers); with ZERO live term matchers the
                # reference skips CoordMatcher entirely (compound.py:377
                # `if self.scale and any(m.term_matchers())`) and the Or
                # scores plainly
                # termcount counts matcher INSTANCES: Or([alfa, alfa^2])
                # builds TWO term matchers for the same text (normalize
                # keeps both — different boosts), so a duplicated child
                # contributes its multiplicity to tc AND to the per-doc
                # matching count (round-5 or-mode fuzz, "'alfa alfa'^2")
                from collections import Counter

                self._lookup_stats(list(boosts))
                counts = Counter(
                    c.text for c in q.children
                    if self._df_cache[c.text] > 0
                )
                tc = sum(counts.values())
            if q.scale and tc:
                if tc == q.scale:
                    # degenerate SQR denominator: the reference's
                    # CoordMatcher still YIELDS the matching docs (score
                    # contribution 0) — union of children at score 0.0
                    return df.select("docid").distinct().select(
                        "docid", F.lit(0.0).alias("score")
                    )
                # postings are unique per (term, docid), so a plain row
                # count equals the distinct-term count; a duplicated
                # child weights its term by its multiplicity
                if all(v == 1 for v in counts.values()):
                    m_col = F.count(F.lit(1))
                else:
                    mult_map = F.create_map(
                        *[
                            F.lit(x)
                            for t, n_ in counts.items()
                            for x in (t, float(n_))
                        ]
                    )
                    m_col = F.sum(
                        F.coalesce(
                            F.element_at(mult_map, F.col("term")),
                            F.lit(1.0),
                        )
                    )
                agg = df.groupBy("docid").agg(
                    F.sum("score").alias("_s"),
                    m_col.alias("_m"),
                )
                # the Or's boost applies INSIDE the SQR: the reference
                # wraps WrappingMatcher(m, boost) first and CoordMatcher
                # outside it (compound.py _tree_matcher then
                # DefaultOr._matcher), so the bonus term is NOT scaled by
                # the node boost (round-6 fuzz fix, "('alfa alfa'^2)^2")
                sqr = (
                    F.col("_s") * F.lit(q.boost)
                    + (F.col("_m") - 1) / F.lit(float((tc - q.scale) ** 2))
                ) * F.lit((tc - 1) / tc)
                return agg.select("docid", sqr.alias("score"))
            out = df.groupBy("docid").agg(F.sum("score").alias("score"))
            return out.select(
                "docid", (F.col("score") * F.lit(q.boost)).alias("score")
            )
        if isinstance(q, Q.And) and all(
            isinstance(c, Q.Term) and c.fieldname == self.ix.fieldname
            for c in q.children
        ):
            # fused: one scan + single aggregation with match-count filter.
            # Duplicate term children sum their boosts (see the Or path)
            boosts = {}
            for c in q.children:
                boosts[c.text] = boosts.get(c.text, 0.0) + c.boost
            n = len(boosts)
            df = self._scored_postings(list(boosts), boosts=boosts)
            # postings are unique per (term, docid): row count == distinct
            # terms matched, so the coverage check needs no count_distinct
            # (which would plan an extra (docid, term) exchange — measured
            # ~20% of and2 latency at 1M docs)
            out = (
                df.groupBy("docid")
                .agg(
                    F.sum("score").alias("score"),
                    F.count(F.lit(1)).alias("_n"),
                )
                .where(F.col("_n") == n)
                .drop("_n")
            )
            return out.select(
                "docid", (F.col("score") * F.lit(q.boost)).alias("score")
            )
        if isinstance(q, Q.Or):
            # Not children evaluate to their complement frame (score = boost,
            # like the reference's InverseMatcher, matching/wrappers.py:424-428)
            if q.scale:
                # SQR coordination bonus (CoordMatcher, wrappers.py:532-583).
                # The reference's termcount is the number of LEAF TERM
                # MATCHERS in the whole tree (mcore.py:103-110) — a phrase
                # child contributes one per word — and `matching` counts the
                # term matchers active at the doc.  Each child frame carries
                # its term-matcher count; when a child matches, all of its
                # term matchers are active (exact for Term/Phrase/Ordered/
                # And; Not contributes 0).  Pre-warm the df cache in ONE
                # lexicon lookup so the per-child live-matcher counts
                # don't each pay a driver round-trip.
                texts: List[str] = []
                for c in q.children:
                    for leaf in c.leaves():
                        if isinstance(leaf, Q.Term):
                            texts.append(leaf.text)
                        elif isinstance(leaf, (Q.Phrase, Q.Ordered)):
                            texts.extend(leaf.words)
                self._lookup_stats(texts)
                tc = sum(self._n_term_matchers(c) for c in q.children)
            else:
                tc = 0
            if q.scale and tc:
                if tc == q.scale:
                    # degenerate SQR denominator — still yield matching docs
                    # at score 0 like CoordMatcher._sqr (wrappers.py:560+)
                    u0 = self._eval(q.children[0]).select("docid")
                    for c in q.children[1:]:
                        u0 = u0.unionByName(self._eval(c).select("docid"))
                    return u0.distinct().select(
                        "docid", F.lit(0.0).alias("score")
                    )
                frames = [self._eval_with_tm(c) for c in q.children]
                u = frames[0]
                for f2 in frames[1:]:
                    u = u.unionByName(f2)
                agg = u.groupBy("docid").agg(
                    F.sum("score").alias("_s"),
                    F.sum("_tm").alias("_m"),
                )
                # node boost inside the SQR, like the fused path above
                sqr = (
                    F.col("_s") * F.lit(q.boost)
                    + (F.col("_m") - 1) / F.lit(float((tc - q.scale) ** 2))
                ) * F.lit((tc - 1) / tc)
                return agg.select("docid", sqr.alias("score"))
            frames = [self._eval(c) for c in q.children]
            u = frames[0]
            for f2 in frames[1:]:
                u = u.unionByName(f2)
            out = u.groupBy("docid").agg(F.sum("score").alias("score"))
            if q.boost != 1.0:
                out = out.select(
                    "docid", (F.col("score") * F.lit(q.boost)).alias("score")
                )
            return out
        if isinstance(q, Q.And):
            fused = self._try_fused_and(q)
            if fused is not None:
                return fused
            pos = [c for c in q.children if not isinstance(c, Q.Not)]
            neg = [c for c in q.children if isinstance(c, Q.Not)]
            n = len(pos)
            if not pos:
                # And of only Nots (e.g. "NOT foo NOT bar"): start from the
                # full doc set at score 0 — each Not's boost is added below,
                # matching the bare-Not complement semantics
                out = self._all_docs(0.0)
            else:
                frames = [
                    self._eval(c).withColumn("_cid", F.lit(i))
                    for i, c in enumerate(pos)
                ]
                u = frames[0]
                for f2 in frames[1:]:
                    u = u.unionByName(f2)
                # every _eval child frame is docid-unique (see _eval
                # docstring), so each child contributes at most one row
                # per docid and the row count equals the distinct-child
                # count — count_distinct would plan an extra exchange
                out = (
                    u.groupBy("docid")
                    .agg(
                        F.sum("score").alias("score"),
                        F.count(F.lit(1)).alias("_n"),
                    )
                    .where(F.col("_n") == n)
                    .drop("_n")
                )
            # anti-join each negated child; the InverseMatcher still SCORES
            # for surviving docs — but always its default weight 1.0:
            # Not.matcher never forwards Not.boost into InverseMatcher
            # (wrappers.py:138-144; score() at matching/wrappers.py:424-428
            # returns the 1.0 default), verified live round 5
            neg_bonus = 0.0
            for nq in neg:
                out = out.join(self._eval(nq.child), "docid", "left_anti")
                neg_bonus += 1.0
            if neg_bonus:
                out = out.select(
                    "docid", (F.col("score") + F.lit(neg_bonus)).alias("score")
                )
            if q.boost != 1.0:
                out = out.select(
                    "docid", (F.col("score") * F.lit(q.boost)).alias("score")
                )
            return out
        if isinstance(q, Q.DisjunctionMax):
            # NOTE: the reference's DisjunctionMaxMatcher.score() is a pure
            # max — its `tiebreak` argument is stored but never used in
            # scoring (matching/binary.py:367-374).  We mirror that exactly.
            sets = self._term_sets(q.children, single_terms_only=True)
            if sets is not None:
                # fused: one scan; children are single terms so the max over
                # term scores IS the max over child scores
                boosts = {t: b for ct in sets for t, b in ct}
                df = self._scored_postings(
                    [t for ct in sets for t, _ in ct], boosts=boosts
                )
                agg = df.groupBy("docid").agg(F.max("score").alias("_mx"))
                return agg.select(
                    "docid", (F.col("_mx") * F.lit(q.boost)).alias("score")
                )
            frames = [self._eval(c) for c in q.children]
            u = frames[0]
            for f2 in frames[1:]:
                u = u.unionByName(f2)
            agg = u.groupBy("docid").agg(F.max("score").alias("_mx"))
            return agg.select(
                "docid", (F.col("_mx") * F.lit(q.boost)).alias("score")
            )
        if isinstance(q, (Q.AndNot, Q.Require, Q.AndMaybe)):
            fused = self._try_fused_binary(q)
            if fused is not None:
                return fused
        if isinstance(q, Q.AndNot):
            return self._boosted_frame(
                self._eval(q.a).join(self._eval(q.b), "docid", "left_anti"),
                q.boost,
            )
        if isinstance(q, Q.Require):
            return self._boosted_frame(
                self._eval(q.a).join(self._eval(q.b), "docid", "left_semi"),
                q.boost,
            )
        if isinstance(q, Q.AndMaybe):
            a = self._eval(q.a)
            b = self._eval(q.b).withColumnRenamed("score", "_bscore")
            s = F.col("score") + F.coalesce(F.col("_bscore"), F.lit(0.0))
            if q.boost != 1.0:
                s = s * F.lit(q.boost)
            return a.join(b, "docid", "left").select(
                "docid", s.alias("score")
            )
        if isinstance(q, Q.Not):
            # complement scored at the InverseMatcher's default weight:
            # Not.matcher never forwards its boost (wrappers.py:138-144
            # constructs InverseMatcher without weight=, whose score() is
            # the fixed 1.0 default, matching/wrappers.py:340,424-428) —
            # so surviving docs score 1.0 regardless of Not.boost
            return self._all_docs(1.0).join(
                self._eval(q.child), "docid", "left_anti"
            )
        if isinstance(q, Q.ConstantScoreQuery):
            # ListMatcher(all_ids, all_weights=score) (wrappers.py:170-181):
            # the child contributes only its doc set; replacing its score
            # column with a literal lets Catalyst prune the idf/length
            # scoring expressions out of the child's plan entirely
            return self._eval(q.child).select(
                "docid", F.lit(float(q.score)).alias("score")
            )
        if isinstance(q, Q.WeightingQuery):
            # re-plan the subtree under the wrapped model
            # (wrappers.py:193-199: context.set(weighting=...)); the
            # sub-searcher shares ix (stats already cached) so this adds
            # no extra Spark jobs
            if q.weighting is None or q.weighting is self.weighting:
                return self._eval(q.child)
            return Searcher(self.ix, q.weighting)._eval(q.child)
        if isinstance(q, Q.Otherwise):
            a = self._eval(q.a)
            return self._boosted_frame(
                a if a.limit(1).count() > 0 else self._eval(q.b), q.boost
            )
        if isinstance(q, Q.Phrase):
            return self._eval_phrase(q)
        if isinstance(q, Q.Ordered):
            return self._eval_ordered(q)
        if isinstance(q, (Q.NumericRange, Q.DateRange)):
            df = self.ix.docmeta.where(range_condition(q))
            return df.select("docid", F.lit(float(q.boost)).alias("score"))
        if isinstance(q, Q.ColumnQuery):
            return self.ix.docmeta.where(F.expr(q.expr)).select(
                "docid", F.lit(float(q.boost)).alias("score")
            )
        if isinstance(q, Q.NestedParent):
            from whoosh_reloaded_spark.nested import nested_parent

            return nested_parent(self, q.parents, q.q, score_fn=q.score_fn)
        if isinstance(q, Q.NestedChildren):
            from whoosh_reloaded_spark.nested import nested_children

            # the sub-query runs WITHIN the parent universe without the
            # universe filter contributing score (reference intersects
            # q's matcher with the parent bitset, nested.py:209+)
            pq = Q.Require(q.q, q.parents)
            return self._boosted_frame(nested_children(self, pq), q.boost)
        if isinstance(q, Q._MultiTerm):
            terms = self.expand_terms(q)
            if terms is None:
                # expansion > TOO_MANY_CLAUSES: relational full-expansion
                # plan — postings join lexicon frame, no truncation
                df = self._scored_postings_rel(q)
            elif not terms:
                return spark.createDataFrame([], "docid long, score double")
            else:
                # NOTE: the reference's MultiTerm.matcher sets weighting=None
                # for constantscore fuzzy queries, but its Or-matcher falls
                # back to the searcher's weighting anyway — observed behavior
                # is plain BM25-scored Or over the expanded terms, mirrored.
                df = self._scored_postings(terms)
            out = df.groupBy("docid").agg(F.sum("score").alias("score"))
            # Reference quirk (round-5 parser fuzz, "(alfa~)^2"): a
            # single-term expansion returns the bare Term matcher —
            # MultiTerm.matcher builds boost-LESS Terms and uses qs[0]
            # directly (terms.py:221,227-228) — so the MultiTerm's own
            # boost is silently dropped; only multi-term expansions go
            # through Or(qs, boost), whose _tree_matcher applies it
            # (compound.py:232-233).  Mirrored, pinned by
            # test_multiterm_singleton_boost_drop_golden.
            boost = q.boost if terms is None or len(terms) > 1 else 1.0
            return out.select(
                "docid", (F.col("score") * F.lit(boost)).alias("score")
            )
        raise TypeError(f"unsupported query node: {q!r}")

    def _term_sets(
        self, children, single_terms_only: bool = True
    ) -> Optional[List[List[Tuple[str, float]]]]:
        """Per-child (term, effective boost) lists when every child is a
        plain Term (or, with single_terms_only=False, an unscaled Or of
        plain Terms) on this index's field and no term repeats across
        children; None otherwise."""
        out: List[List[Tuple[str, float]]] = []
        for c in children:
            if isinstance(c, Q.Term) and c.fieldname == self.ix.fieldname:
                out.append([(c.text, c.boost)])
            elif (
                not single_terms_only
                and isinstance(c, Q.Or)
                and not c.scale
                and c.children
                and all(
                    isinstance(g, Q.Term) and g.fieldname == self.ix.fieldname
                    for g in c.children
                )
            ):
                out.append([(g.text, g.boost * c.boost) for g in c.children])
            else:
                return None
        all_terms = [t for ct in out for t, _ in ct]
        if len(set(all_terms)) != len(all_terms):
            return None
        return out

    def _try_fused_binary(self, q) -> Optional[DataFrame]:
        """Single-scan plans for AndNot / Require / AndMaybe whose sides are
        each a Term or an unscaled Or of Terms: one pushed term-IN scan +
        one aggregation with side-membership flags, replacing two scans and
        a join.  Side-a score = sum of a-side matched terms (the reference
        scores these ops by `a` only — AndMaybe additionally adds b)."""
        sets = self._term_sets([q.a, q.b], single_terms_only=False)
        if sets is None:
            return None
        (a_set, b_set) = sets
        a_terms = [t for t, _ in a_set]
        b_terms = [t for t, _ in b_set]
        boosts = {t: b for ct in sets for t, b in ct}
        df = self._scored_postings(a_terms + b_terms, boosts=boosts)
        in_a = F.col("term").isin(a_terms)
        in_b = F.col("term").isin(b_terms)
        agg = df.groupBy("docid").agg(
            F.coalesce(F.sum(F.when(in_a, F.col("score"))), F.lit(0.0)).alias("_sa"),
            F.coalesce(F.sum(F.when(in_b, F.col("score"))), F.lit(0.0)).alias("_sb"),
            F.max(F.when(in_a, 1).otherwise(0)).alias("_ma"),
            F.max(F.when(in_b, 1).otherwise(0)).alias("_mb"),
        )
        if isinstance(q, Q.AndNot):
            out = agg.where((F.col("_ma") == 1) & (F.col("_mb") == 0))
            score = F.col("_sa")
        elif isinstance(q, Q.Require):
            out = agg.where((F.col("_ma") == 1) & (F.col("_mb") == 1))
            score = F.col("_sa")
        else:  # AndMaybe
            out = agg.where(F.col("_ma") == 1)
            score = F.col("_sa") + F.col("_sb")
        if q.boost != 1.0:
            # with_boost pushes into the scored side(s)
            # (compound.py:527-528,555-556,610-611) == scaling the result
            score = score * F.lit(q.boost)
        return out.select("docid", score.alias("score"))

    def _try_fused_and(self, q: Q.And) -> Optional[DataFrame]:
        """Single-scan plan for And whose children are each a plain Term or
        an unscaled Or of plain Terms (the 'nested boolean' hot shape,
        e.g. And([Or([a, b]), c])): ONE pushed `term IN (...)` scan + ONE
        aggregation computing a matched flag per child — replaces one scan
        per child plus an N-way join.  Bails (returns None) when children
        overlap on a term (boost attribution would be ambiguous) or any
        child needs its own machinery (scale, boosts on the Or node with
        nested structure are folded; Not/Phrase/ranges fall through)."""
        child_terms = self._term_sets(q.children, single_terms_only=False)
        if child_terms is None or len(child_terms) < 2:
            return None
        all_terms = [t for ct in child_terms for t, _ in ct]
        boosts = {t: b for ct in child_terms for t, b in ct}
        df = self._scored_postings(all_terms, boosts=boosts)
        aggs = [F.sum("score").alias("score")]
        for i, ct in enumerate(child_terms):
            terms_i = [t for t, _ in ct]
            aggs.append(
                F.max(
                    F.when(F.col("term").isin(terms_i), 1).otherwise(0)
                ).alias(f"_m{i}")
            )
        out = df.groupBy("docid").agg(*aggs)
        for i in range(len(child_terms)):
            out = out.where(F.col(f"_m{i}") == 1)
        out = out.drop(*[f"_m{i}" for i in range(len(child_terms))])
        if q.boost != 1.0:
            out = out.select(
                "docid", (F.col("score") * F.lit(q.boost)).alias("score")
            )
        return out

    def _eval_phrase(self, q: Q.Phrase) -> DataFrame:
        """Positional adjacency via higher-order functions (JVM-side).

        Matched-position chain: m_1 = pos(w1); m_i = {p in pos(wi) | ∃ x in
        m_{i-1}: 0 < p - x <= slop}; doc matches iff m_k nonempty.  Equivalent
        to the reference's sorted-span intersection (spans.py:653-699) for
        ordered adjacency.  Score = sum of the words' BM25 scores, like the
        span matcher scoring through IntersectionMatcher (binary.py:95-96).
        """
        words = list(q.words)
        slop = int(q.slop)
        j = self._word_maps(words)

        # the matched-position chain as ONE parsed SQL expression: each
        # Python-lambda HOF costs a ~10-25 ms py4j conversion round-trip
        # at plan-build time (round-6 measurement) vs ~1 ms to parse the
        # identical SQL text JVM-side
        m = f"element_at(_pm, {_sql_str(words[0])})"
        for w in words[1:]:
            m = (
                f"filter(element_at(_pm, {_sql_str(w)}), "
                f"p -> exists({m}, x -> p - x > 0 AND p - x <= {slop}))"
            )
        score = sum(
            [F.element_at(F.col("_sm"), w) for w in words], F.lit(0.0)
        )
        return (
            j.where(F.expr(f"size({m}) > 0"))
            .select("docid", (score * F.lit(q.boost)).alias("score"))
        )

    def _word_maps(self, words: List[str]) -> DataFrame:
        """ONE pushed scan + ONE aggregation for positional word queries:
        per-doc maps term -> positions / term -> score, restricted to docs
        containing every distinct word.  Replaces the per-word scan +
        N-way docid join plan (N scans, N-1 joins -> 1 scan, 0 joins).

        Candidate pre-prune (the relational leapfrog): only docs containing
        the RAREST word can match, so when the df spread is meaningful the
        other words' postings are semi-joined against the rare word's docids
        BEFORE the map-building aggregation — the head word's full posting
        list never flows through collect_list.  df comes from the per-search
        stats lookup already cached for scoring (zero extra jobs); the
        candidate frame is broadcast when the rare df is driver-known small."""
        df = self._scored_postings(words, with_positions=True)
        n = len(set(words))
        if n > 1:
            self._lookup_stats(words)
            dfs = {w: self._df_cache[w] for w in set(words)}
            rare = min(dfs, key=lambda w: (dfs[w], w))
            # prune only when it pays: the aggregation input shrinks by the
            # non-rare words' extra postings, which costs one more (pushed,
            # single-term) scan + a semi-join
            if 0 < dfs[rare] * 4 <= max(dfs.values()):
                cand = (
                    self.ix.postings.where(F.col("term") == rare)
                    .select("docid")
                )
                if dfs[rare] <= PHRASE_BROADCAST_DF:
                    cand = F.broadcast(cand)
                df = df.join(cand, "docid", "left_semi")
        # conditional-first aggregation, NOT map_from_entries(collect_list):
        # per-word columns aggregate >2x faster at 1M docs (measured p50
        # 1.75s -> 0.79s for a 2-word head phrase) because no per-row struct
        # materialization or list buffering; the _pm/_sm maps are assembled
        # AFTER the having-all-words filter, over result docs only
        uniq = sorted(set(words))
        aggs = []
        for i, w in enumerate(uniq):
            # parsed SQL (not F.first(F.when(...))): ~10 ms of py4j per
            # aggregate column at plan-build time, identical expression
            wl = _sql_str(w)
            aggs.append(
                F.expr(
                    f"first(CASE WHEN term = {wl} THEN positions END, true)"
                ).alias(f"_p{i}")
            )
            aggs.append(
                F.expr(
                    f"first(CASE WHEN term = {wl} THEN score END, true)"
                ).alias(f"_s{i}")
            )
        g = df.groupBy("docid").agg(*aggs)
        for i in range(n):
            g = g.where(F.col(f"_p{i}").isNotNull())
        keys = F.array(*[F.lit(w) for w in uniq])
        return g.select(
            "docid",
            F.map_from_arrays(
                keys, F.array(*[F.col(f"_p{i}") for i in range(n)])
            ).alias("_pm"),
            F.map_from_arrays(
                keys, F.array(*[F.col(f"_s{i}") for i in range(n)])
            ).alias("_sm"),
        )

    def _eval_ordered(self, q: Q.Ordered) -> DataFrame:
        """Terms in increasing position order, any gap: m_i = positions of
        word i having SOME earlier match before them; doc matches iff the
        last word has a qualifying position.  Score = sum of term scores."""
        words = list(q.words)
        j = self._word_maps(words)

        # single parsed SQL chain, like _eval_phrase (py4j lambda cost)
        m = f"element_at(_pm, {_sql_str(words[0])})"
        for w in words[1:]:
            m = (
                f"filter(element_at(_pm, {_sql_str(w)}), "
                f"p -> exists({m}, x -> x < p))"
            )
        score = sum(
            [F.element_at(F.col("_sm"), w) for w in words], F.lit(0.0)
        )
        return j.where(F.expr(f"size({m}) > 0")).select(
            "docid", (score * F.lit(q.boost)).alias("score")
        )

    def matched_terms(self, q: Q.Query) -> DataFrame:
        """TermsCollector analogue (collectors.py:1113+): which query terms
        matched each hit — (docid, terms array<string>) for term-based
        queries."""
        terms = sorted(self._collect_terms(q.normalize()))
        hits = self._eval(q.normalize()).select("docid")
        per_term = self.ix.postings.where(F.col("term").isin(terms)).select(
            "docid", "term"
        )
        return (
            hits.join(per_term, "docid")
            .groupBy("docid")
            .agg(F.sort_array(F.collect_set("term")).alias("terms"))
        )

    def _collect_terms(self, q: Q.Query) -> set:
        out = set()
        if isinstance(q, Q.Term):
            out.add(q.text)
        elif isinstance(q, (Q.Phrase, Q.Ordered)):
            out.update(q.words)
        elif isinstance(q, Q._MultiTerm):
            # expanded terms participate in matched-term recording like
            # the reference's leaf matchers; overflow expansions
            # (> TOO_MANY_CLAUSES -> None) are skipped — the driver-side
            # term set would defeat the relational plan's purpose
            small = self.expand_terms(q)
            if small:
                out.update(small)
        elif isinstance(q, Q._Compound):
            for c in q.children:
                out |= self._collect_terms(c)
        else:
            # a/b/child cover binary/Not nodes; q/qs/subqs cover the span
            # wrappers (SpanFirst.q, SpanNear2.qs, SpanOr.subqs)
            for attr in ("a", "b", "child", "q"):
                c = getattr(q, attr, None)
                if isinstance(c, Q.Query):
                    out |= self._collect_terms(c)
            for attr in ("qs", "subqs"):
                cs = getattr(q, attr, None)
                if cs:
                    for c in cs:
                        if isinstance(c, Q.Query):
                            out |= self._collect_terms(c)
        return out

    def search_page(self, q: Q.Query, pagenum: int, pagelen: int = 10) -> DataFrame:
        """ResultsPage semantics (searching.py:617-669): compute the top
        pagenum*pagelen then slice the requested page."""
        top = self.search(q, limit=pagenum * pagelen)
        w = Window.orderBy(F.col("score").desc(), F.col("docid").asc())
        return (
            top.withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") > (pagenum - 1) * pagelen)
            .drop("_rank")
        )

    # -- public API ----------------------------------------------------------

    def search(
        self, q: Q.Query, limit: Optional[int] = 10, with_uid: bool = True,
        filter=None, mask=None,
    ) -> DataFrame:
        """Top-k results: (docid[, uid], score), score desc / docid asc.

        Tie-break matches the reference heap's ``(score, 0 - docnum)`` order
        (collectors.py:466-483): equal scores -> LOWER docid first.

        `filter` / `mask` restrict / exclude docs BEFORE the top-k cut
        (search(filter=..., mask=...), searching.py:799-802 +
        FilterCollector, collectors.py:622-692): each may be a Query, a
        Results, or a set of docnums.  Query forms become semi/anti joins
        on the hit frame; docnum sets become pushed IN filters.
        """
        q = q.normalize()
        hits = self._eval(q)
        hits = self._apply_docset(hits, filter, keep=True)
        hits = self._apply_docset(hits, mask, keep=False)
        if getattr(self.weighting, "use_final", False):
            # doc-level final() hook applied to the COMBINED score, where
            # the reference's collector calls weighting.final()
            # (collectors.py _score path; scoring.py:66-82)
            hits = hits.select(
                "docid", self.weighting.final_col(F.col("score")).alias("score")
            )
        # top-k FIRST (TakeOrderedAndProject over the hit frame), THEN join
        # the tiny result against docmeta for display fields — at scale the
        # uid join must touch k rows, not every hit
        out = hits.orderBy(F.col("score").desc(), F.col("docid").asc())
        if limit is not None:
            out = out.limit(limit)
        if with_uid:
            out = (
                out.join(self.ix.docmeta.select("docid", "uid"), "docid")
                .orderBy(F.col("score").desc(), F.col("docid").asc())
                .select("docid", "uid", "score")
            )
        return out

    def _apply_docset(self, hits: DataFrame, obj, keep: bool) -> DataFrame:
        """Restrict (keep=True) or exclude (keep=False) `hits` by a Query /
        Results / iterable-of-docnums allowlist (FilterCollector's
        allow/restrict sets, collectors.py:622-692)."""
        if obj is None:
            return hits
        if isinstance(obj, Q.Query):
            other = self._eval(obj.normalize()).select("docid")
            return hits.join(
                other, "docid", "left_semi" if keep else "left_anti"
            )
        if isinstance(obj, Results):
            docnums = obj.docs()
        else:
            docnums = set(obj)
        cond = F.col("docid").isin([int(d) for d in docnums])
        return hits.where(cond if keep else ~cond)

    def search_list(self, q: Q.Query, limit: Optional[int] = 10) -> List[Tuple]:
        rows = self.search(q, limit).collect()
        return [(r["docid"], r["uid"], r["score"]) for r in rows]

    # -- reader-style conveniences (reading.py IndexReader surface) ----------

    def lexicon(self, prefix: Optional[str] = None) -> DataFrame:
        """Sorted term dictionary frame (IndexReader.lexicon,
        reading.py:256-280); optional prefix pushed to the scan."""
        ts = self.ix.term_stats.select("term")
        if prefix:
            ts = ts.where(F.col("term").startswith(prefix))
        return ts.orderBy("term")

    def doc_frequency(self, term: str) -> int:
        """df of a term, 0 when absent (IndexReader.doc_frequency)."""
        self._lookup_stats([term])
        return self._df_cache[term]

    def vector(self, docnum: int) -> Dict[str, float]:
        """Forward-index term vector {term: weight} for one doc
        (IndexReader.vector_as("weight"), reading.py:610-660); needs
        build_index(store_vector=True)."""
        if "vector" not in self.ix.docmeta.columns:
            raise ValueError(
                "index has no term vectors; build with store_vector=True"
            )
        rows = (
            self.ix.docmeta.where(F.col("docid") == docnum)
            .select("vector")
            .collect()
        )
        return dict(rows[0]["vector"]) if rows and rows[0]["vector"] else {}

    def most_frequent_terms(self, number: int = 5,
                            prefix: str = "") -> DataFrame:
        """Top `number` terms by total collection weight as (frequency,
        term) — IndexReader.most_frequent_terms (reading.py:545-554).
        nlargest over (weight, text) tuples ties on text DESC; the sort
        runs on unrounded weights, distributed top-k (no lexicon
        collect)."""
        ts = self.ix.term_stats
        if prefix:
            ts = ts.where(F.col("term").startswith(prefix))
        return (
            ts.orderBy(F.desc("total_weight"), F.desc("term"))
            .limit(number)
            .select(F.round("total_weight", 6).alias("frequency"), "term")
        )

    def most_distinctive_terms(self, number: int = 5,
                               prefix: str = "") -> DataFrame:
        """Top `number` terms by tf*idf = weight * ln(N/df) as (score,
        term) — IndexReader.most_distinctive_terms (reading.py:556-566)."""
        ts = self.ix.term_stats
        if prefix:
            ts = ts.where(F.col("term").startswith(prefix))
        score = F.col("total_weight") * F.log(
            F.lit(float(self.N)) / F.col("df")
        )
        return (
            ts.withColumn("_s", score)
            .orderBy(F.desc("_s"), F.desc("term"))
            .limit(number)
            .select(F.round("_s", 6).alias("score"), "term")
        )

    def frequency(self, term: str) -> float:
        """Total collection weight of a term (IndexReader.frequency)."""
        self._lookup_stats([term])
        return self._cf_cache[term]

    def doc_count(self) -> int:
        return self.N

    def doc_count_all(self) -> int:
        """All documents (Searcher.doc_count_all, searching.py).  The
        reference's reader keeps deleted docs in its doc table; here
        tombstones are applied when the index is LOADED, so the live
        count is the total for this snapshot."""
        return self.N

    def avg_field_length(self, fieldname: Optional[str] = None,
                         default=None):
        """Average field length (Searcher.avg_field_length)."""
        return self.avgfl

    def field_length_total(self, fieldname: Optional[str] = None) -> int:
        """Total length of the indexed field (Searcher.field_length)."""
        return self.field_length

    def max_field_length(self, fieldname: Optional[str] = None) -> int:
        """Largest per-document field length (Searcher.max_field_length);
        one small aggregate over docmeta, cached."""
        if not hasattr(self, "_max_fl"):
            row = self.ix.docmeta.agg(F.max("length").alias("m")).collect()[0]
            self._max_fl = int(row["m"] or 0)
        return self._max_fl

    def idf(self, fieldname: Optional[str], text: str) -> float:
        """Cached IDF of a term (Searcher.idf, searching.py) — accepts
        (fieldname, text) like the reference; the single indexed field
        makes fieldname advisory."""
        self._lookup_stats([text])
        return self._idf_cache[text]

    def reader(self) -> "InvertedIndex":
        """The reference returns its IndexReader; the analogous handle
        here is the InvertedIndex table bundle."""
        return self.ix

    def refresh(self) -> "Searcher":
        """Parquet index frames are an immutable snapshot — this searcher
        is always current for them (Searcher.refresh contract)."""
        return self

    def up_to_date(self) -> bool:
        return True  # immutable snapshot, see refresh()

    def close(self) -> None:
        """Reference parity (Searcher.close): marks the searcher closed.
        DataFrames hold no exclusive resources, so this only sets the
        flag the reference sets."""
        self.is_closed = True

    def is_atomic(self) -> bool:
        """True — load_multi presents merged segments as one logical
        index, the analogue of an atomic reader."""
        return True

    def leaf_searchers(self):
        return [(self, 0)]  # searching.py leaf_searchers, atomic case

    def has_parent(self) -> bool:
        return False

    def get_parent(self) -> "Searcher":
        return self

    def docs_for_query(self, q) -> Iterator[int]:
        """Iterator of docnums matching q (Searcher.docs_for_query) —
        driver-side display surface; the distributed form is
        `searcher._eval(q)` itself."""
        for r in self._eval(q.normalize()).select("docid").collect():
            yield int(r["docid"])

    def document_numbers(self, **kw) -> Iterator[int]:
        """Generator of docnums whose stored fields equal the keyword
        filters; no filters yields every docnum
        (Searcher.document_numbers)."""
        for r in self.documents(**kw).select("docid").collect():
            yield int(r["docid"])

    def document_number(self, **kw) -> Optional[int]:
        """First matching docnum or None (Searcher.document_number)."""
        rows = self.documents(**kw).select("docid").limit(1).collect()
        return int(rows[0]["docid"]) if rows else None

    def find(self, defaultfield: str, querystring: str, **kwargs):
        """Parse querystring with the default QueryParser and search
        (Searcher.find, searching.py)."""
        from whoosh_reloaded_spark.query.parser import QueryParser

        q = QueryParser(defaultfield).parse(querystring)
        return self.search_results(q, **kwargs)

    def postings(self, fieldname: Optional[str], text: str) -> DataFrame:
        """Scored postings frame for one term (Searcher.postings returns
        a scored Matcher; the DataFrame of (term, docid, score) rows is
        the relational equivalent, scoring functions already applied
        from this searcher's weighting)."""
        return self._scored_postings([text])

    def collector(self, **kwargs) -> "_Collector":
        """A collector capturing search arguments for
        search_with_collector (Searcher.collector /
        Searcher.search_with_collector, searching.py).  Wrap with
        collectors.search_with_time_limit for the TimeLimitCollector
        pattern."""
        return _Collector(kwargs)

    def search_with_collector(self, q, collector: "_Collector") -> None:
        """Run q with the given collector; results land on
        collector.results (reference contract)."""
        collector.results = self.search_results(q, **collector.kwargs)

    def suggest(self, text: str, limit: int = 5, maxdist: int = 2):
        """Spelling corrections for `text` (Searcher.suggest,
        searching.py / spelling.py)."""
        from whoosh_reloaded_spark.spelling import suggest as _suggest

        return _suggest(self, text, limit=limit, maxdist=maxdist)

    def corrector(self, fieldname: Optional[str] = None):
        """A composable spelling :class:`~whoosh_reloaded_spark.spelling.
        ReaderCorrector` over this index's lexicon (Searcher.corrector,
        reference searching.py:485-492) — combine with ListCorrector /
        MultiCorrector from the spelling module."""
        from whoosh_reloaded_spark.spelling import ReaderCorrector

        return ReaderCorrector(self, fieldname)

    def correct_query(self, q, qstring, correctors=None, terms=None,
                      maxdist: int = 2, prefix: int = 0, aliases=None):
        """Corrected version of `q`/`qstring` — words absent from the
        index replaced by their top suggestion (Searcher.correct_query,
        searching.py:863-977).  `correctors` maps field names to custom
        spelling.Corrector objects; `aliases` maps query fields to the
        field used as the suggestion source.  Returns a
        spelling.Correction."""
        from whoosh_reloaded_spark.spelling import correct_query as _cq

        return _cq(self, q, qstring, terms=terms, maxdist=maxdist,
                   prefix=prefix, correctors=correctors, aliases=aliases)

    def key_terms(self, docids, numterms: int = 5, model=None):
        from whoosh_reloaded_spark.classify import Bo1Model, key_terms as _kt

        return _kt(self, list(docids), numterms=numterms,
                   model=model or Bo1Model)

    def key_terms_from_text(self, text: str, numterms: int = 5,
                            model=None, normalize: bool = True):
        from whoosh_reloaded_spark.classify import (
            Bo1Model,
            key_terms_from_text as _ktt,
        )

        return _ktt(self, text, numterms=numterms,
                    model=model or Bo1Model, normalize=normalize)

    def more_like(self, docid: int, numterms: int = 5, model=None,
                  limit: int = 10) -> DataFrame:
        from whoosh_reloaded_spark.classify import Bo1Model, more_like as _ml

        return _ml(self, docid, numterms=numterms, model=model or Bo1Model,
                   limit=limit)

    def documents(self, **kw) -> DataFrame:
        """Stored-field lookup frame (searching.py Searcher.documents):
        equality filters over docmeta columns — pushed to the scan."""
        df = self.ix.docmeta
        for k, v in kw.items():
            df = df.where(F.col(k) == v)
        return df

    def document(self, **kw) -> Optional[dict]:
        """First matching stored-field dict or None (Searcher.document)."""
        rows = self.documents(**kw).limit(1).collect()
        return rows[0].asDict() if rows else None


class _Collector:
    """Captured search arguments + result slot for
    Searcher.collector()/search_with_collector() (reference
    collectors.py Collector protocol, results-retrieval subset)."""

    def __init__(self, kwargs):
        self.kwargs = kwargs
        self.results = None

    def computes_count(self) -> bool:
        # our search always knows the exact collected length
        return True


class Hit:
    """One search hit (searching.py Hit): stored fields by key, plus rank /
    score / docnum attributes and the highlights() display hook."""

    __slots__ = ("rank", "docnum", "score", "_fields", "_results")

    def __init__(self, rank, docnum, score, fields, results=None):
        self.rank = rank
        self.docnum = docnum
        self.score = score
        self._fields = fields
        self._results = results

    def fields(self):
        return dict(self._fields)

    def highlights(self, field: str, text: Optional[str] = None,
                   top: int = 3, minscore: float = 1) -> str:
        """Highlighted fragments of this hit's stored `field` text using
        the parent Results' fragmenter/formatter/scorer (Hit.highlights,
        searching.py:1480-1530)."""
        from whoosh_reloaded_spark.highlight import highlight as _hl

        r = self._results
        src = text if text is not None else self._fields.get(field, "")
        return _hl(
            src or "", r.terms if r else (), None,
            r.fragmenter if r else None, r.formatter if r else None,
            top=top, scorer=r.scorer if r else None, minscore=minscore,
            order=r.order if r else None,
        )

    def matched_terms(self) -> set:
        """Query terms that matched THIS hit (Hit.matched_terms,
        searching.py:1562-1582); needs search_results(terms=True)."""
        r = self._results
        if r is None or r._matched is None:
            raise ValueError("search was not run with terms=True")
        return set(r._matched.get(self.docnum, ()))

    def more_like_this(self, top: int = 10, numterms: int = 5,
                       model=None) -> DataFrame:
        """Documents similar to this hit (Hit.more_like_this,
        searching.py:1531-1560)."""
        if self._results is None or self._results.searcher is None:
            raise ValueError("hit is not attached to a searcher")
        return self._results.searcher.more_like(
            self.docnum, numterms=numterms, model=model, limit=top
        )

    # -- dict-like stored-field access (searching.py Hit keys/values/
    # items + the iter* aliases)

    def keys(self):
        return iter(self._fields.keys())

    def values(self):
        return iter(self._fields.values())

    def items(self):
        return iter(self._fields.items())

    iterkeys = keys
    itervalues = values
    iteritems = items

    def __iter__(self):
        return iter(self._fields.keys())

    def __len__(self):
        return len(self._fields)

    def get(self, key, default=None):
        return self._fields.get(key, default)

    def __getitem__(self, key):
        return self._fields[key]

    def __contains__(self, key):
        return key in self._fields

    def __repr__(self):
        return f"<Hit {self.docnum} {self.score:.4f} {self._fields!r}>"


class Results:
    """Materialized top-k results (searching.py Results): iterable of Hit
    with the reference's access surface — len(), results[n], score(n),
    docnum(n), fields(n), items(), docs(), is_empty(), scored_length(),
    set-combinators extend/filter/upgrade/upgrade_and_extend, and the
    pluggable highlight pipeline (fragmenter/formatter/scorer/order
    attributes consumed by Hit.highlights)."""

    def __init__(self, hits, terms=(), searcher=None):
        from whoosh_reloaded_spark.highlight import (
            FIRST,
            BasicFragmentScorer,
            ContextFragmenter,
            HtmlFormatter,
        )

        self._hits = hits
        for h in self._hits:
            h._results = self
        self.terms = frozenset(terms)
        self.searcher = searcher
        self._matched: Optional[Dict[int, List[str]]] = None
        self._groups: Optional[Dict[str, dict]] = None
        self._q = None
        self._total: Optional[int] = None
        self.fragmenter = ContextFragmenter()
        self.formatter = HtmlFormatter(tagname="b")
        self.scorer = BasicFragmentScorer()
        self.order = FIRST

    def __len__(self):
        return len(self._hits)

    def __iter__(self):
        return iter(self._hits)

    def __getitem__(self, n):
        return self._hits[n]

    def score(self, n):
        return self._hits[n].score

    def docnum(self, n):
        return self._hits[n].docnum

    def fields(self, n):
        return self._hits[n].fields()

    def docs(self):
        """Set of docnums (Results.docs returns the docset)."""
        return {h.docnum for h in self._hits}

    def items(self):
        return ((h.docnum, h.score) for h in self._hits)

    def is_empty(self):
        return len(self._hits) == 0

    def scored_length(self):
        return len(self._hits)

    def estimated_min_length(self) -> int:
        """Minimum number of matching documents (Results.
        estimated_min_length) — exact here, see estimated_length."""
        return self.estimated_length()

    def has_exact_length(self) -> bool:
        """True when the match count is already known without another
        job (Results.has_exact_length)."""
        return getattr(self, "_total", None) is not None

    def query_terms(self, expand: bool = False, fieldname=None):
        """Terms from this results' query that EXIST in the index
        (Results.query_terms -> Query.existing_terms); with expand=True
        multiterm leaves contribute their lexicon expansions."""
        if self._q is None or self.searcher is None:
            return set()
        s = self.searcher
        out, texts = set(), set()
        for fn, text in self._q.iter_all_terms():
            if fieldname is None or fn == fieldname:
                texts.add((fn, text))
        if texts:
            present = {
                r["term"]
                for r in s.ix.term_stats.where(
                    F.col("term").isin([t for _, t in texts])
                ).select("term").collect()
            }
            out |= {(fn, t) for fn, t in texts if t in present}
        if expand:
            for leaf in self._q.leaves():
                if isinstance(leaf, Q._MultiTerm):
                    small = s.expand_terms(leaf)
                    for t in small or ():
                        out.add((leaf.fieldname, t))
        return out

    def estimated_length(self) -> int:
        """Total number of matching documents (Results.estimated_length,
        searching.py:1157-1165 — exact here).  NOTE: unlike the
        reference, ``len(results)`` is the SCORED length (the collected
        top-k), because counting every match is a separate distributed
        job at scale; this method runs that job lazily and caches it."""
        if getattr(self, "_total", None) is None:
            if self.searcher is None or self._q is None:
                self._total = len(self._hits)
            else:
                self._total = self.searcher._eval(
                    self._q.normalize()
                ).count()
        return self._total

    def _renumber(self):
        for i, h in enumerate(self._hits):
            h.rank = i

    @staticmethod
    def _adopt(h: "Hit") -> "Hit":
        # copy donor hits rather than rebinding them in place — the
        # reference stores (score, docnum) tuples so extend() never
        # mutates the donor Results; sharing Hit objects would clobber
        # the donor's rank/_results
        return Hit(h.rank, h.docnum, h.score, dict(h._fields))

    def copy(self) -> "Results":
        """Independent copy with cloned Hit objects (Results.copy,
        searching.py:1203-1211); shares the searcher and highlight
        pipeline settings."""
        r = Results(
            [self._adopt(h) for h in self._hits],
            terms=self.terms, searcher=self.searcher,
        )
        r.fragmenter, r.formatter = self.fragmenter, self.formatter
        r.scorer, r.order = self.scorer, self.order
        r._q, r._total = self._q, self._total
        r._matched = (
            {k: list(v) for k, v in self._matched.items()}
            if self._matched is not None
            else None
        )
        r._groups = (
            {
                n: {
                    k: (list(v) if isinstance(v, list) else v)
                    for k, v in g.items()
                }
                for n, g in self._groups.items()
            }
            if self._groups is not None
            else None
        )
        return r

    def extend(self, results: "Results") -> None:
        """Append the other results' hits not already present
        (Results.extend, searching.py:1326-1338)."""
        docs = self.docs()
        adopted = [
            self._adopt(h) for h in results if h.docnum not in docs
        ]
        for h in adopted:
            h._results = self
        self._hits.extend(adopted)
        self._renumber()

    def filter(self, results: "Results") -> None:
        """Keep only hits also present in the other results
        (Results.filter, searching.py:1340-1349)."""
        if not len(results):
            return
        other = results.docs()
        self._hits = [h for h in self._hits if h.docnum in other]
        self._renumber()

    def upgrade(self, results: "Results", reverse: bool = False) -> None:
        """Move hits shared with the other results to the front (or back
        with reverse=True), keeping relative order (Results.upgrade,
        searching.py:1351-1374)."""
        if not len(results):
            return
        other = results.docs()
        arein = [h for h in self._hits if h.docnum in other]
        notin = [h for h in self._hits if h.docnum not in other]
        self._hits = notin + arein if reverse else arein + notin
        self._renumber()

    def facet_names(self):
        """Available facet names (Results.facet_names,
        searching.py:1091-1096)."""
        return list((self._groups or {}).keys())

    def groups(self, name: Optional[str] = None):
        """Facet groups from search_results(groupedby=...): dict mapping
        category value -> docnums in result order (Results.groups,
        searching.py:1098-1155).  This materializes every matching docnum
        driver-side exactly like the reference; for web-scale result sets
        use facets.group_counts / grouped_docs, which stay DataFrames."""
        if not self._groups:
            raise ValueError("search was not run with groupedby=...")
        if name is None:
            if len(self._groups) != 1:
                raise ValueError(
                    f"specify one of facets {sorted(self._groups)}"
                )
            name = next(iter(self._groups))
        return self._groups[name]

    def has_matched_terms(self) -> bool:
        """True when the search recorded matched terms
        (Results.has_matched_terms, searching.py:1231-1241)."""
        return self._matched is not None

    def matched_terms(self) -> set:
        """Set of query terms that matched at least one top-N hit
        (Results.matched_terms, searching.py:1243-1265); needs
        search_results(terms=True)."""
        if self._matched is None:
            raise ValueError("search was not run with terms=True")
        return {t for ts in self._matched.values() for t in ts}

    def key_terms(self, docs: int = 10, numterms: int = 5,
                  model=None) -> List[Tuple[str, float]]:
        """Most important terms of the top `docs` hits (Results.key_terms,
        searching.py:1297-1324)."""
        if not self._hits or self.searcher is None:
            return []
        docnums = [h.docnum for h in self._hits[:docs]]
        return self.searcher.key_terms(docnums, numterms=numterms,
                                       model=model)

    def upgrade_and_extend(self, results: "Results") -> None:
        """upgrade() then extend() in one pass (searching.py:1376-1395)."""
        if not len(results):
            return
        docs = self.docs()
        other = results.docs()
        arein = [h for h in self._hits if h.docnum in other]
        notin = [h for h in self._hits if h.docnum not in other]
        new = [self._adopt(h) for h in results if h.docnum not in docs]
        for h in new:
            h._results = self
        self._hits = arein + notin + new
        self._renumber()


class ResultsPage:
    """One page of a longer result list (searching.py:1612-1700): same
    clamping semantics — a pagenum past the end returns the LAST page,
    and ``pagelen`` is the count actually on this page."""

    def __init__(self, results: "Results", pagenum: int, pagelen: int = 10,
                 total: Optional[int] = None):
        import math

        if pagenum < 1:
            raise ValueError("pagenum must be >= 1")
        self.results = results
        # reference total = ALL matches, not just the collected window
        self.total = total if total is not None else len(results)
        self.pagecount = int(math.ceil(self.total / pagelen))
        self.pagenum = min(self.pagecount, pagenum)
        offset = (self.pagenum - 1) * pagelen
        if offset + pagelen > self.total:
            pagelen = self.total - offset
        self.offset = offset
        self.pagelen = pagelen

    def __getitem__(self, n):
        if isinstance(n, slice):
            start, stop, step = n.indices(self.pagelen)
            return self.results[
                slice(start + self.offset, stop + self.offset, step)
            ]
        return self.results[n + self.offset]

    def __iter__(self):
        return iter(
            self.results[self.offset:self.offset + self.pagelen]
        )

    def __len__(self):
        return self.total

    def is_last_page(self) -> bool:
        return self.pagecount == 0 or self.pagenum == self.pagecount

    def scored_length(self) -> int:
        """Scored docs available in the underlying Results
        (ResultsPage.scored_length, searching.py)."""
        return self.results.scored_length()

    def score(self, n):
        return self.results.score(n + self.offset)

    def docnum(self, n):
        return self.results.docnum(n + self.offset)


def _search_page_results(self, q, pagenum: int, pagelen: int = 10,
                         **kw) -> ResultsPage:
    """ResultsPage search (Searcher.search_page, searching.py:617-669):
    collects the top pagenum*pagelen hits once and slices the page."""
    if pagenum < 1:
        raise ValueError("pagenum must be >= 1")
    r = self.search_results(q, limit=pagenum * pagelen, **kw)
    # the reference's ResultsPage.total is the FULL match count; run the
    # lazy count only when the collected window filled up (otherwise the
    # window already saw every match)
    total = (
        r.estimated_length()
        if len(r) == pagenum * pagelen
        else len(r)
    )
    return ResultsPage(r, pagenum, pagelen, total=total)


def _search_results(self, q, limit=10, stored_cols=None, terms=False,
                    groupedby=None, filter=None, mask=None,
                    sortedby=None, reverse=False, collapse=None,
                    collapse_limit=1, maptype="list"):
    """Results-object search: top-k joined with docmeta stored columns,
    materialized as Hit objects (k rows only — display-side).  With
    terms=True the per-hit matched terms are recorded (search(terms=True),
    searching.py:789-800) and exposed via Results.matched_terms(); with
    groupedby=<docmeta column(s)> facet groups are computed over ALL
    matching docs and exposed via Results.groups(); sortedby=<docmeta
    column(s)> orders by facet key instead of score (SortingCollector via
    facets.sort_by), reverse flipping the direction; collapse=<docmeta
    column> keeps at most collapse_limit docs per key BEFORE the top-k
    cut (CollapseCollector, search(collapse=...)); maptype picks the
    groups() value shape like the reference FacetMaps — "list" (ordered
    docnums, UnorderedList default), "count" (doc count per key), or
    "best" (single best docnum per key)."""
    from whoosh_reloaded_spark.spelling import _leaf_terms

    base = None
    if collapse is not None:
        from whoosh_reloaded_spark.facets import collapse as _collapse

        allhits = self.search(q, limit=None, with_uid=False,
                              filter=filter, mask=mask)
        base = _collapse(
            allhits, self.ix.docmeta, collapse, collapse_limit
        ).select("docid", "score")
    if sortedby is not None:
        from whoosh_reloaded_spark.facets import sort_by

        keys = [sortedby] if isinstance(sortedby, str) else list(sortedby)
        src = base if base is not None else self.search(
            q, limit=None, with_uid=False, filter=filter, mask=mask
        )
        hits = sort_by(src, self.ix.docmeta, keys, reverse=reverse,
                       limit=limit).select("docid", "score")
    elif base is not None:
        hits = base.orderBy(
            F.col("score").desc(), F.col("docid").asc()
        )
        if limit is not None:
            hits = hits.limit(limit)
    else:
        hits = self.search(q, limit=limit, with_uid=False, filter=filter,
                           mask=mask)
    meta_cols = ["uid"] + [c for c in (stored_cols or [])
                           if c in self.ix.docmeta.columns]
    joined = hits.join(
        self.ix.docmeta.select("docid", *meta_cols), "docid"
    )
    if sortedby is not None:
        # keep the facet-key ordering through the display join
        extra = [k for k in keys if k not in meta_cols]
        ordered = joined.join(
            self.ix.docmeta.select("docid", *extra), "docid"
        ) if extra else joined
        ordered = ordered.orderBy(
            *[F.col(k).desc() if reverse else F.col(k).asc()
              for k in keys],
            F.col("docid").asc(),
        ).drop(*extra)
    else:
        ordered = joined.orderBy(
            F.col("score").desc(), F.col("docid").asc()
        )
    out = ordered.collect()
    r = Results(
        [
            Hit(i, r["docid"], r["score"], {c: r[c] for c in meta_cols})
            for i, r in enumerate(out)
        ],
        terms={t for _, t in _leaf_terms(q)},
        searcher=self,
    )
    r._q = q
    if terms:
        if len(r):
            docnums = list(r.docs())
            tm = (
                self.matched_terms(q)
                .where(F.col("docid").isin(docnums))
                .collect()
            )
            r._matched = {row["docid"]: list(row["terms"]) for row in tm}
        else:
            # terms WERE recorded; there just were no hits — the
            # reference returns an empty matched set, not an error
            r._matched = {}
    if groupedby:
        names = (
            [groupedby] if isinstance(groupedby, str) else list(groupedby)
        )
        bad = [n for n in names if n not in self.ix.docmeta.columns]
        if bad:
            raise ValueError(f"groupedby columns not in docmeta: {bad}")
        if maptype not in ("list", "count", "best"):
            raise ValueError(f"unknown maptype: {maptype!r}")
        # groups run over ALL matching docs (the reference collector sees
        # every match, searching.py:1098-1155), sorted per group by
        # (score desc, docid asc) — one distributed agg per facet; the
        # Count/Best FacetMaps (sorting.py:1020-1079) aggregate to a
        # count / argmax instead of materializing the docnum lists.
        # filter/mask/collapse apply to the facet source too, like the
        # reference's FilterCollector feeding the facet collector
        allhits = base if base is not None else self.search(
            q, limit=None, with_uid=False, filter=filter, mask=mask
        )
        joined = allhits.join(
            self.ix.docmeta.select("docid", *names), "docid"
        )
        if maptype == "count":
            agg = F.count(F.lit(1)).alias("_v")
        elif maptype == "best":
            agg = F.min(
                F.struct((-F.col("score")).alias("ns"), F.col("docid"))
            )["docid"].alias("_v")
        else:
            agg = F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col("score")).alias("ns"),
                            F.col("docid"),
                        )
                    )
                ),
                lambda x: x["docid"],
            ).alias("_v")
        r._groups = {}
        for n in names:
            rows = joined.groupBy(n).agg(agg).collect()
            r._groups[n] = {
                row[n]: (
                    list(row["_v"]) if maptype == "list" else row["_v"]
                )
                for row in rows
            }
    return r


Searcher.search_results = _search_results
Searcher.search_page_results = _search_page_results
