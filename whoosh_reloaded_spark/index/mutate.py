"""Deletions and updates — tombstones + unique-key update, reference style.

The reference marks deletions in per-segment bitsets consulted at match
time (writing.py:309-344, codec/whoosh3.py:402-411) and implements
update_document as delete-by-unique-field + re-add (writing.py:439-503).

Here deletions are a tombstone docid table stored next to the index
(`deleted/` parquet); Searcher anti-joins it at the end of every plan —
the DataFrame analogue of the deletion bitset.  Production note: on
Iceberg this is MERGE INTO / positional deletes; compaction (merge_segments
with the tombstones applied) physically drops the rows, like the
reference's segment-merge skipping deleted docs (writing.py:730-746).
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whoosh_reloaded_spark.index.build import InvertedIndex


def _deleted_path(path: str) -> str:
    return os.path.join(path, "deleted")


def load_deleted(spark: SparkSession, path: str) -> Optional[DataFrame]:
    p = _deleted_path(path)
    if os.path.isdir(p):
        return spark.read.parquet(p)
    return None


def delete_by_docids(spark: SparkSession, path: str, docids: List[int]) -> int:
    """Append docids to the tombstone table; returns total tombstones."""
    df = spark.createDataFrame([(int(d),) for d in docids], "docid long")
    existing = load_deleted(spark, path)
    if existing is not None:
        df = existing.unionByName(df).distinct()
    # write via temp dir then swap would be needed for concurrent readers;
    # single-writer semantics match the reference's writer lock
    df = df.distinct()
    tmp = _deleted_path(path) + "_tmp"
    df.write.mode("overwrite").parquet(tmp)
    final = _deleted_path(path)
    import shutil

    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return spark.read.parquet(final).count()


def delete_by_term(spark: SparkSession, path: str, ix: InvertedIndex,
                   term: str) -> int:
    """delete_by_term (writing.py:309-326): tombstone every doc containing
    the term."""
    ids = [
        r["docid"]
        for r in ix.postings.where(F.col("term") == term).select("docid").collect()
    ]
    if not ids:
        return 0
    delete_by_docids(spark, path, ids)
    return len(ids)


def delete_by_uid(spark: SparkSession, path: str, ix: InvertedIndex,
                  uids: List[str]) -> int:
    """Delete by unique key (the update_document precursor,
    writing.py:430-437)."""
    ids = [
        r["docid"]
        for r in ix.docmeta.where(F.col("uid").isin(uids)).select("docid").collect()
    ]
    if ids:
        delete_by_docids(spark, path, ids)
    return len(ids)


def with_deleted(ix: InvertedIndex, deleted: Optional[DataFrame]) -> InvertedIndex:
    """View of the index with tombstoned docs filtered out of every table.

    Global stats are recomputed over live docs (the reference keeps
    doc_count vs doc_count_all distinct; we expose the live view)."""
    if deleted is None:
        return ix
    d = deleted.select("docid")
    return InvertedIndex(
        docmeta=ix.docmeta.join(d, "docid", "left_anti"),
        postings=ix.postings.join(d, "docid", "left_anti"),
        term_stats=ix.postings.join(d, "docid", "left_anti")
        .groupBy("field", "term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("weight").alias("total_weight"),
            F.max("weight").alias("max_weight"),
            F.min("len_byte").alias("min_len_byte"),
        ),
        stats=None,  # recomputed lazily over live docs
        uid_col=ix.uid_col,
        fieldname=ix.fieldname,
        blocks=ix.blocks,  # bounds stay valid (a superset) for WAND
        docs_raw=ix.docs_raw,
    )


def update_documents(spark: SparkSession, root: str, ix: InvertedIndex,
                     new_docs: DataFrame, uid_col: str = "url",
                     text_col: str = "text") -> dict:
    """update_document (writing.py:439-503): delete-by-unique-key then
    append the replacement docs as a new segment (streaming append path)."""
    from whoosh_reloaded_spark.streaming.append import append_batch

    uids = [r[uid_col] for r in new_docs.select(uid_col).collect()]
    delete_by_uid(spark, root, ix, uids)
    return append_batch(new_docs, root, uid_col=uid_col, text_col=text_col)
