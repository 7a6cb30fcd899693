"""Block-max WAND: two-phase top-k that skips low-quality posting blocks.

The reference's WAND loop (collectors.py:376-420) keeps the heap's minimum
score and calls matcher.skip_to_quality(minscore), which jumps whole
<=128-posting blocks whose quality bound — score(block max_weight, block
min_length), scoring.py:203-213 — cannot beat it.  Catalyst has no such
rule, so we express the same pruning as a relational two-phase plan:

  phase 0 (tiny): per-(term, block) upper bound UB = score(max_weight,
     min_len_byte) * idf; collect per-term max bounds (|Q| floats).
  phase 1 (seed): exactly score ONLY the best block per term -> partial
     scores per doc -> the k-th best partial score is a valid lower bound
     THETA of the true k-th best score (partial <= exact).
  phase 2 (prune + rescore): a doc can only beat THETA if at least one of
     its blocks satisfies UB(t, b) + sum(max UB of other terms) > THETA.
     Scan only surviving blocks -> candidate docids -> rescore those docs
     EXACTLY over all query terms -> top-k.

Correctness: any doc all of whose blocks are pruned has exact score
<= max_b [UB(t_b) + sum_{t'!=t_b} maxUB(t')] <= THETA, so it cannot displace
the seed top-k; candidates are rescored exactly, so returned scores are
identical to the exhaustive plan (FIXTURES.md §5 'WAND on/off parity').

MEASURED VERDICT (round 2, wand_bench_10m.json): at 10M docs / head-term
df=3.7M on local[32], WAND never beats the exhaustive fused-Or plan —
speedup 0.27x (mid terms) to 0.92x (two head terms).  The three sequential
jobs (block bounds -> seed theta -> prune+rescore) cost more than the I/O
they save; the exhaustive plan's pushed `term IN` scan over term-sorted
parquet + TakeOrderedAndProject is already near-optimal at these scales.
The speedup RISES with df (0.27 -> 0.45 -> 0.49 -> 0.92), so a crossover
beyond ~10^8-docs head terms is plausible but UNPROVEN here.  Status:
correctness-proven alternative plan (exact parity incl. boosts and ties),
NOT the default — Searcher uses the exhaustive plan; call wand_topk
explicitly for posting lists large enough that scan I/O dominates.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoosh_reloaded_spark.lengths import byte_to_length_expr


def wand_topk(searcher, terms: List[str], k: int = 10,
              boosts: Optional[dict] = None) -> DataFrame:
    """Top-k for an Or-of-terms query with block-max pruning.

    Returns (docid, score) identical to the exhaustive Or plan.
    """
    ix = searcher.ix
    if ix.blocks is None:
        # no block stats — fall back to exhaustive
        from whoosh_reloaded_spark.query import ast as Q

        return searcher._eval(
            Q.Or(tuple(Q.Term(t, boost=(boosts or {}).get(t, 1.0)) for t in terms))
        )

    terms = list(dict.fromkeys(terms))
    searcher._lookup_stats(terms)
    weighting = searcher.weighting

    def bound_col():
        # quality bound: score at (max_weight, min_len_byte) — the most
        # favorable posting a block could contain (scoring.py:203-213).
        # In exact-length mode the safe optimistic length is the previous
        # byte's decoded value + 1 (a true lower bound of any length that
        # quantizes to min_len_byte).
        ctx = searcher.score_context(
            terms,
            weight=F.col("max_weight"),
            len_byte=F.col("min_len_byte"),
            length=byte_to_length_expr(
                F.greatest(F.col("min_len_byte") - 1, F.lit(0))
            )
            + 1.0,
        )
        return weighting.score_col(ctx)

    # block upper bounds must include per-term boosts, or UB < exact score
    # for boosted terms breaks the pruning invariant (empty results).
    if boosts:
        _bpairs = []
        for t in terms:
            _bpairs += [F.lit(t), F.lit(float(boosts.get(t, 1.0)))]
        _ub = bound_col() * F.element_at(F.create_map(*_bpairs), F.col("term"))
    else:
        _ub = bound_col()
    blocks = ix.blocks.where(F.col("term").isin(terms)).select(
        "term", "block_no", "min_docid", "max_docid", _ub.alias("ub")
    )
    # per-term max bound + best block (tiny collect, |Q| rows)
    per_term = (
        blocks.groupBy("term")
        .agg(
            F.max("ub").alias("max_ub"),
            F.max_by("block_no", "ub").alias("best_block"),
        )
        .collect()
    )
    if not per_term:
        spark = ix.postings.sparkSession
        return spark.createDataFrame([], "docid long, score double")
    max_ub = {r["term"]: float(r["max_ub"]) for r in per_term}
    best_block = {r["term"]: int(r["best_block"]) for r in per_term}
    # terms absent from the lexicon contribute nothing (NullMatcher short-
    # circuit, terms.py:121-146)
    terms = [t for t in terms if t in max_ub]
    total_ub = sum(max_ub.values())

    def scored(p):
        score = weighting.score_col(searcher.score_context(terms))
        if boosts:
            bpairs = []
            for t in terms:
                bpairs += [F.lit(t), F.lit(float(boosts.get(t, 1.0)))]
            score = score * F.element_at(F.create_map(*bpairs), F.col("term"))
        return p.select("term", "docid", score.alias("score"))

    # phase 1: seed THETA from the single best block of each term.  When the
    # index was saved by save_index, posting rows carry their block_no, so
    # block membership is a plain (term, block_no) EQUI-join — AQE sizes it
    # (broadcast when small, shuffle when a head term survives wide), no
    # forced broadcast of an O(df/128) range list.  In-memory indexes
    # (unsaved) fall back to range-containment against the block stats.
    post = ix.postings.where(F.col("term").isin(terms))
    has_block_no = "block_no" in post.columns
    if not has_block_no:
        # unsaved in-memory index: derive block_no on the fly — the salted
        # two-phase ranking is deterministic per (term, docid), and all
        # rows of the query's terms are present, so the numbering matches
        # ix.blocks exactly.  Keeps the equi-join path; no broadcast of
        # O(df/128) range lists.
        from whoosh_reloaded_spark.index.build import with_block_no

        post = with_block_no(post)

    def _in_blocks(p, blist):
        return p.join(
            blist.select(
                F.col("b_term").alias("term"),
                F.col("b_no").alias("block_no"),
            ),
            ["term", "block_no"],
            "left_semi",
        )

    def _bsel(bdf):
        return bdf.select(
            F.col("term").alias("b_term"), F.col("block_no").alias("b_no")
        )

    best = _bsel(
        blocks.where(
            F.concat_ws("#", F.col("term"), F.col("block_no")).isin(
                [f"{t}#{best_block[t]}" for t in terms]
            )
        )
    )

    seed = (
        scored(_in_blocks(post, best))
        .groupBy("docid")
        .agg(F.sum("score").alias("score"))
        .orderBy(F.col("score").desc())
        .limit(k)
        .collect()
    )
    theta = float(seed[-1]["score"]) if len(seed) >= k else 0.0

    # phase 2: blocks that could still contribute a top-k doc
    surviving = _bsel(
        blocks.where(
            F.col("ub") + F.lit(total_ub) - F.element_at(
                F.create_map(
                    *[x for t in terms for x in (F.lit(t), F.lit(max_ub[t]))]
                ),
                F.col("term"),
            )
            >= F.lit(theta)  # >= so equal-score (tie-broken) docs survive
        )
    )

    cand = _in_blocks(post, surviving).select("docid").distinct()
    out = (
        scored(post.join(cand, "docid", "left_semi"))
        .groupBy("docid")
        .agg(F.sum("score").alias("score"))
    )
    return out
