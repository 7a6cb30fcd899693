"""Nested document (block-join) queries — NestedParent / NestedChildren.

The reference implements parent/child joins positionally: children are the
docs between one parent and the next, tracked with a parent bitset over doc
numbers (query/nested.py:33-208).  Doc-number adjacency is an artifact of
its single-writer ingestion; in a distributed build we materialize the
relationship explicitly instead: docmeta carries a `parent_uid` column
(set at ingestion), and the block-join becomes an equi-join — the idiomatic
Spark form, correct under any partitioning.

- nested_parent: docs matching `parent_filter` whose CHILDREN match
  `child_query`; score = best child score (the reference's default
  ``best`` ScoreFn; ``sum``/``mean``/``count`` also supported,
  nested.py:66-76).
- nested_children: children of parents matching `parent_query`, keeping the
  child rows (scored by the parent's score, like NestedChildren returning
  children with the parent's matcher driving).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCORE_FNS = {
    "best": F.max,
    "sum": F.sum,
    "mean": F.mean,
    "count": lambda c: F.count(F.lit(1)).cast("double"),
}


def nested_parent(searcher, parent_filter, child_query,
                  parent_uid_col: str = "parent_uid",
                  score_fn: str = "best") -> DataFrame:
    """(docid, score) of PARENT docs whose children match child_query.

    `parent_filter` is a Query selecting the parent set (the reference's
    `parents` argument); `child_query` matches child docs; children link to
    parents via docmeta[parent_uid_col] == parent docmeta.uid.
    """
    agg = _SCORE_FNS[score_fn]
    meta = searcher.ix.docmeta
    parents = searcher._eval(parent_filter.normalize()).join(
        meta.select("docid", "uid"), "docid"
    ).select(F.col("docid").alias("p_docid"), F.col("uid").alias("p_uid"))
    child_hits = searcher._eval(child_query.normalize()).join(
        meta.select("docid", parent_uid_col), "docid"
    )
    joined = child_hits.join(
        parents, child_hits[parent_uid_col] == parents["p_uid"]
    )
    return (
        joined.groupBy("p_docid")
        .agg(agg(F.col("score")).alias("score"))
        .select(F.col("p_docid").alias("docid"), "score")
    )


def nested_children(searcher, parent_query,
                    parent_uid_col: str = "parent_uid") -> DataFrame:
    """(docid, score) of CHILD docs whose parent matches parent_query;
    each child carries its parent's score (nested.py:209+)."""
    meta = searcher.ix.docmeta
    parents = searcher._eval(parent_query.normalize()).join(
        meta.select("docid", "uid"), "docid"
    ).select(F.col("uid").alias("p_uid"), F.col("score").alias("p_score"))
    children = meta.where(F.col(parent_uid_col).isNotNull()).select(
        "docid", parent_uid_col
    )
    return children.join(
        parents, children[parent_uid_col] == parents["p_uid"]
    ).select("docid", F.col("p_score").alias("score"))
