"""Faceting / grouping / collapse — the reference's sorting.py + collectors
as DataFrame aggregations over the hits frame.

A "hits" frame is any (docid, score) DataFrame (Searcher._eval output or
search() before limiting).  Facet keys come from docmeta columns (the
reference's column/stored-field categorizers, sorting.py:211-400) — posting-
derived keys fall out of the same joins.

| reference                                  | here                          |
| FieldFacet (sorting.py:158-208)            | group_counts / grouped_docs   |
| RangeFacet (sorting.py:451-559)            | range_facet                   |
| QueryFacet (sorting.py:402-449)            | query_facet                   |
| MultiFacet (sorting.py:748-855)            | pass several key columns      |
| FacetMap Count/OrderedList (sorting.py:950+)| group_counts / grouped_docs  |
| CollapseCollector (collectors.py:854-1011) | collapse                      |
| SortingCollector (collectors.py:536-583)   | sort_by                       |
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColLike = Union[str, Column]


def _with_meta(hits: DataFrame, docmeta: DataFrame, cols: Sequence[str]) -> DataFrame:
    need = [c for c in cols if c not in hits.columns]
    if not need:
        return hits
    return hits.join(docmeta.select("docid", *need), "docid")


def group_counts(hits: DataFrame, docmeta: DataFrame,
                 keys: Sequence[str]) -> DataFrame:
    """FacetMap Count: (key..., n_docs)."""
    df = _with_meta(hits, docmeta, keys)
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_docs"))


def grouped_docs(hits: DataFrame, docmeta: DataFrame, keys: Sequence[str],
                 ordered: bool = True) -> DataFrame:
    """FacetMap OrderedList: (key..., docids array) — docs ordered by
    (score desc, docid asc) inside each group like the reference results."""
    df = _with_meta(hits, docmeta, keys)
    if ordered:
        pair = F.struct((-F.col("score")).alias("s"), F.col("docid").alias("d"))
        agg = F.transform(
            F.array_sort(F.collect_list(pair)), lambda x: x["d"]
        ).alias("docids")
    else:
        agg = F.sort_array(F.collect_list("docid")).alias("docids")
    return df.groupBy(*keys).agg(agg)


def best_per_group(hits: DataFrame, docmeta: DataFrame,
                   keys: Sequence[str]) -> DataFrame:
    """FacetMap Best (sorting.py:1053-1079): argmax doc per group."""
    df = _with_meta(hits, docmeta, keys)
    w = Window.partitionBy(*keys).orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def range_facet(hits: DataFrame, docmeta: DataFrame, numeric_col: str,
                start, end, gap) -> DataFrame:
    """RangeFacet: bucket a numeric docmeta column into [start+i*gap) bins:
    (bucket_lo, bucket_hi, n_docs)."""
    df = _with_meta(hits, docmeta, [numeric_col])
    df = df.where(
        (F.col(numeric_col) >= start) & (F.col(numeric_col) < end)
    )
    b = F.floor((F.col(numeric_col) - F.lit(start)) / F.lit(gap)).cast("long")
    return (
        df.withColumn("_b", b)
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            (F.lit(start) + F.col("_b") * F.lit(gap)).alias("bucket_lo"),
            (F.lit(start) + (F.col("_b") + 1) * F.lit(gap)).alias("bucket_hi"),
            "n_docs",
        )
    )


def query_facet(hits_by_name: dict) -> DataFrame:
    """QueryFacet: named buckets from separate hit frames:
    (facet, n_docs)."""
    out = None
    for name, hits in hits_by_name.items():
        df = hits.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("facet"), "n_docs"
        )
        out = df if out is None else out.unionByName(df)
    return out


def collapse(hits: DataFrame, docmeta: DataFrame, key: str,
             limit_per_key: int = 1,
             order_by_score: bool = True) -> DataFrame:
    """CollapseCollector: keep <= N docs per collapse key, order-aware."""
    df = _with_meta(hits, docmeta, [key])
    order = (
        [F.col("score").desc(), F.col("docid").asc()]
        if order_by_score
        else [F.col("docid").asc()]
    )
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= limit_per_key)
        .drop("_rn")
    )


def sort_by(hits: DataFrame, docmeta: DataFrame, keys: Sequence[str],
            reverse: bool = False, limit: Optional[int] = None) -> DataFrame:
    """SortingCollector: order hits by facet key(s) instead of score."""
    df = _with_meta(hits, docmeta, keys)
    order = [F.col(k).desc() if reverse else F.col(k).asc() for k in keys]
    out = df.orderBy(*order, F.col("docid").asc())
    return out.limit(limit) if limit is not None else out


def function_facet(hits: DataFrame, docmeta: DataFrame,
                   key_expr: ColLike, needed_cols: Sequence[str],
                   alias: str = "key") -> DataFrame:
    """FunctionFacet (sorting.py:593-640): facet key computed by an
    arbitrary function of the document — here an arbitrary Column/SQL
    expression over docmeta columns (runs in codegen, not per-row Python):
    (key, n_docs)."""
    df = _with_meta(hits, docmeta, needed_cols)
    key = F.expr(key_expr) if isinstance(key_expr, str) else key_expr
    return (
        df.withColumn(alias, key)
        .groupBy(alias)
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def translate_facet(facet_df: DataFrame, key_expr: ColLike,
                    key_col: str = "key") -> DataFrame:
    """TranslateFacet (sorting.py:642-687): post-map another facet's keys
    through a function (expression over the key column), re-aggregating
    counts for keys that collapse together."""
    key = F.expr(key_expr) if isinstance(key_expr, str) else key_expr
    other = [c for c in facet_df.columns if c != key_col]
    return (
        facet_df.withColumn(key_col, key)
        .groupBy(key_col)
        .agg(*[F.sum(c).alias(c) for c in other])
    )


def stored_field_facet(hits: DataFrame, docmeta: DataFrame, col: str,
                       allow_overlap: bool = False,
                       split_pattern: str = r"\s+") -> DataFrame:
    """StoredFieldFacet (sorting.py:689-746): key from a stored column; with
    ``allow_overlap`` the value is split and the doc counts once per piece
    (the reference's UnorderedList overlap mode): (key, n_docs)."""
    df = _with_meta(hits, docmeta, [col])
    if allow_overlap:
        key = F.explode(F.split(F.col(col), split_pattern)).alias("key")
        return (
            df.select("docid", key)
            .where(F.col("key") != "")
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
    return df.groupBy(F.col(col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
