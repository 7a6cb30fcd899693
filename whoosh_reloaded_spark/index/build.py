"""Index build: corpus DataFrame -> posting/docmeta/term_stats tables.

The reference's build path (writer.add_document -> PostingPool external sort
-> W3FieldWriter posting blocks; src/whoosh/writing.py:748-822,
codec/whoosh3.py:301-373) is re-expressed as ONE declarative Spark pipeline:

    corpus --assign docids--> analyze+invert per doc (ONE pandas-UDF pass:
    tokenize, group, position-sort in Python — no engine-level groupBy
    shuffle) --explode--> posting rows --term-range shuffle--> written
    postings; docmeta / term_stats / blocks / global stats derive from the
    WRITTEN columnar postings (cheap re-reads).

The single term-range shuffle replaces the reference's PostingPool external
merge sort (externalsort.py:85-223); a Parquet/Iceberg snapshot commit
replaces the TOC generation file (index.py:576).  Segments are directories
of term-range sorted parquet; merging segments is a `unionByName` +
re-aggregation (see segments.py), mirroring writing.py:730-746 add_reader.

Scale notes (100 TB design):
- docid assignment is the only global ordering step; it is done with a
  range-partitioned two-phase rank (per-partition counts -> offsets), NOT a
  single-reducer Window.  See :func:`assign_docids`.
- postings are written repartitionByRange(term) + sortWithinPartitions(term,
  docid): parquet min/max page stats then give term-dictionary pruning for
  query-time `term IN (...)` filters (the reference's ordered term hash file,
  filedb/filetables.py:444-476, falls out of columnar storage).
- all aggregations are partial-aggregate friendly (sum/count/max) => map-side
  combine bounds shuffle volume by distinct keys, not input rows.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whoosh_reloaded_spark.analysis import StandardAnalyzer, make_tokenize_udf
from whoosh_reloaded_spark.lengths import length_to_byte_expr

DEFAULT_FIELD = "text"
BLOCK_SIZE = 128  # postings per block (ref: codec/whoosh3.py:85)


@dataclass
class InvertedIndex:
    """The four tables that make up an index (cf. the reference's segment
    files .trm/.pst/.col, docs/source/tech/filedb.rst:8-28)."""

    docmeta: DataFrame      # docid, uid, length, len_byte [, stored cols]
    postings: DataFrame     # field, term, docid, weight, tf, positions, len_byte
    term_stats: DataFrame   # field, term, df, total_weight, max_weight
    stats: Optional[Dict[str, float]]  # doc_count, field_length, avg_field_length
    uid_col: str = "url"
    fieldname: str = DEFAULT_FIELD
    blocks: Optional[DataFrame] = None  # field, term, block_no, stats (WAND)
    docs_raw: Optional[DataFrame] = None  # docid, uid [, stored] — no UDF lineage

    # -- Index-object convenience surface (reference index.py Index class)

    def searcher(self, weighting=None):
        """A Searcher over this index (Index.searcher)."""
        from whoosh_reloaded_spark.query.planner import Searcher

        return Searcher(self, weighting)

    def doc_count(self) -> int:
        return int(self.ensure_stats()["doc_count"])

    def doc_count_all(self) -> int:
        """Tombstones are applied at load, so live == all for this
        snapshot (see Searcher.doc_count_all)."""
        return self.doc_count()

    def is_empty(self) -> bool:
        return self.doc_count() == 0

    def field_length(self, fieldname: Optional[str] = None) -> int:
        return int(self.ensure_stats()["field_length"])

    def reader(self) -> "InvertedIndex":
        return self  # the table bundle IS the reader analogue

    def refresh(self) -> "InvertedIndex":
        return self  # immutable snapshot

    def up_to_date(self) -> bool:
        return True

    def close(self) -> None:
        self.is_closed = True

    def ensure_stats(self) -> Dict[str, float]:
        """Global aggregates, computed lazily so the build pipeline runs only
        once (searching.py:277-280 computes avgfl the same way: exact)."""
        if self.stats is None:
            g = self.docmeta.agg(
                F.count(F.lit(1)).alias("doc_count"),
                F.sum("length").alias("field_length"),
            ).collect()[0]
            doc_count = int(g["doc_count"])
            field_length = int(g["field_length"] or 0)
            self.stats = {
                "doc_count": doc_count,
                "field_length": field_length,
                "avg_field_length": (field_length / doc_count) if doc_count else 0.0,
            }
        return self.stats

    def persist(self) -> "InvertedIndex":
        self.docmeta.persist()
        self.postings.persist()
        self.term_stats.persist()
        return self

    def unpersist(self) -> "InvertedIndex":
        for df in (self.docmeta, self.postings, self.term_stats):
            df.unpersist()
        return self


def assign_docids(df: DataFrame, uid_col: str, num_partitions: int = 0) -> DataFrame:
    """Deterministic dense docid = global rank of `uid_col` (0-based).

    Docids define BM25 tie-break order and must match the reference's
    insertion-order docnums (documents added in uid order), so they must be
    stable across runs (FIXTURES.md §5 'build determinism').

    Distributed two-phase rank (no single-reducer global Window):
      1. range-partition by uid and sort within partitions,
      2. count rows per partition (small job) -> cumulative offsets,
      3. docid = offset[partition] + local row_number.

    The partitioned frame is persisted so both phases observe identical range
    boundaries (repartitionByRange samples its boundaries).  On a real
    cluster/Iceberg deployment the sort order would be a table property and
    boundaries computed once from a deterministic sample.
    """
    spark = df.sparkSession
    if num_partitions <= 0:
        # oversubscribe: range-boundary sampling is approximate, so ask for
        # several partitions per core — otherwise skewed boundaries leave
        # cores idle through the downstream analysis pass
        num_partitions = spark.sparkContext.defaultParallelism * 4
    part = (
        df.repartitionByRange(num_partitions, F.col(uid_col))
        .sortWithinPartitions(uid_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = part.groupBy("_pid").count().orderBy("_pid").collect()
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(uid_col)
    out = (
        part.join(offsets_df, "_pid")
        .withColumn("docid", F.row_number().over(w) - 1 + F.col("_offset"))
        .drop("_pid", "_offset")
    )
    return out


def build_index(
    corpus: DataFrame,
    uid_col: str = "url",
    text_col: str = "text",
    fieldname: str = DEFAULT_FIELD,
    analyzer: Optional[StandardAnalyzer] = None,
    stored_cols: Optional[List[str]] = None,
    field_boost: float = 1.0,
    num_partitions: int = 0,
    with_docids: bool = False,
    cache_intermediate: bool = True,
    format: str = "positions",
    store_vector: bool = False,
    boost_delim: Optional[str] = None,
) -> InvertedIndex:
    """Run the index-build job. Everything is lazy until persisted/written.

    Posting weight = sum(token boosts) * field_boost (the reference's
    Frequency/Positions formats sum per-token boosts, formats.py:190-236;
    boost-emitting analyzers like DelimitedBoostAnalyzer feed the sum).

    ``format`` mirrors the reference's posting formats (formats.py:109-330):
    - "positions" (default, TEXT fields): per-occurrence position arrays —
      required by Phrase/Ordered/Span queries;
    - "frequency" (KEYWORD-style): drops the position payload (the bulk of
      posting bytes at scale); BM25 scores are unchanged;
    - "existence" (ID-style): one constant-weight posting per (term, doc),
      tf forced to 1 — the docs-only membership format;
    - "position_boosts" (formats.py:345-408): adds a per-occurrence
      ``pos_boosts`` array parallel to ``positions`` (boosts from 3-tuple
      generic analyzers, ``boost_delim``, or 1.0);
    - "characters" (formats.py:273-330): adds ``startchars``/``endchars``
      arrays parallel to ``positions`` (StandardAnalyzer-family only);
    - "character_boosts" (formats.py:411-470): both of the above.

    ``boost_delim`` is the DelimitedAttributeFilter equivalent for the
    StandardAnalyzer fast path ('render^2' → boost 2.0, endchar trimmed);
    pair it with a pattern that keeps the delimiter in the token.
    """
    from whoosh_reloaded_spark.analysis import (
        INVERT_ROWS_SCHEMA,
        make_invert_rows,
        make_invert_rows_payload,
    )

    payload_flags = {
        "position_boosts": (False, True),
        "characters": (True, False),
        "character_boosts": (True, True),
    }.get(format)
    extra_cols: List[str] = []
    if payload_flags:
        with_chars, with_boosts = payload_flags
        run = make_invert_rows_payload(
            analyzer, with_chars=with_chars, with_boosts=with_boosts,
            boost_delim=boost_delim,
        )
        if with_boosts:
            extra_cols.append("pos_boosts")
        if with_chars:
            extra_cols.extend(["startchars", "endchars"])
        schema_str = INVERT_ROWS_SCHEMA + ", " + ", ".join(
            f"{c} array<double>" if c == "pos_boosts" else f"{c} array<int>"
            for c in extra_cols
        )
    else:
        run = make_invert_rows(analyzer)
        schema_str = INVERT_ROWS_SCHEMA
    # dedup so text_col may ALSO be a stored col (TEXT(stored=True) in the
    # reference, fields.py — lets Hit.highlights read the source text from
    # docmeta instead of requiring an explicit text argument)
    keep_cols = list(dict.fromkeys([uid_col, text_col] + list(stored_cols or [])))
    if with_docids:
        docs = corpus.select("docid", *keep_cols)
    else:
        docs = assign_docids(corpus.select(*keep_cols), uid_col, num_partitions)

    # analyze + invert per doc in ONE mapInArrow pass emitting FLAT posting
    # rows — no engine-level groupBy shuffle, no nested Arrow structs;
    # positions are grouped and ordered during analysis
    src = docs.select("docid", F.col(text_col).alias("text"))
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < parallelism:
        # AQE coalesces the docid-assignment shuffle to very few partitions
        # on small inputs, which would starve the (CPU-bound) analysis pass
        # of cores; respread first.  At scale the input already has >=
        # parallelism partitions, so this branch never fires there.
        src = src.repartition(parallelism)
    raw = src.mapInArrow(run, schema_str)
    postings = raw.select(
        F.lit(fieldname).alias("field"),
        "term",
        "docid",
        # wsum = sum of per-token boosts (== tf for boost-less analyzers);
        # Format.word_values semantics, formats.py:190-236
        (F.col("wsum") * F.lit(field_boost)).cast("double").alias("weight"),
        "tf",
        "positions",
        "length",
        "len_byte",  # quantized in the UDF (bisect per doc, not per row)
        *extra_cols,
    )
    if format == "frequency":
        postings = postings.drop("positions")
    elif format == "existence":
        postings = postings.drop("positions").withColumn(
            "weight", F.lit(float(field_boost))
        ).withColumn("tf", F.lit(1))
    elif format != "positions" and not payload_flags:
        raise ValueError(f"unknown posting format: {format!r}")
    meta_cols = [
        c for c in keep_cols
        if c != uid_col and (c != text_col or c in (stored_cols or []))
    ]
    docs_raw_inner = docs.select(
        "docid", F.col(uid_col).alias("uid"), *meta_cols
    )
    doclen = postings.groupBy("docid").agg(
        F.max("length").alias("length"), F.max("len_byte").alias("len_byte")
    )
    docmeta = (
        docs_raw_inner.join(doclen, "docid", "left")
        .na.fill({"length": 0, "len_byte": 0})
    )
    if store_vector:
        # term vectors: the forward index doc -> {term: weight}
        # (FieldType.vector, fields.py:93-96; written whoosh3.py:245-267) —
        # a docmeta map column, derived from the same posting rows
        vec = postings.groupBy("docid").agg(
            F.map_from_arrays(
                F.collect_list("term"), F.collect_list("weight")
            ).alias("vector")
        )
        docmeta = docmeta.join(vec, "docid", "left")

    term_stats = postings.groupBy("field", "term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("weight").alias("total_weight"),
        F.max("weight").alias("max_weight"),
        F.min("len_byte").alias("min_len_byte"),
    )

    docs_raw = docs.select(
        "docid", F.col(uid_col).alias("uid"), *meta_cols
    )
    return InvertedIndex(
        docmeta=docmeta,
        postings=postings,
        term_stats=term_stats,
        stats=None,  # computed lazily (ensure_stats) — build stays one pass
        uid_col="uid",
        fieldname=fieldname,
        blocks=compute_blocks(postings),
        docs_raw=docs_raw,
    )


def with_block_no(postings: DataFrame, salt_buckets: int = 64,
                  max_docid: Optional[int] = None) -> DataFrame:
    """Posting rows + their <=128-posting `block_no` per term — the unit of
    block-max WAND skipping (ref: whoosh3.py:85 block size, :814-824 block
    stats).  save_index persists this column so WAND's block filters are
    plain (term, block_no) EQUI-joins (AQE-sized), never a broadcast of a
    surviving-block range list.

    SALTED per-term ranking: a naive Window.partitionBy(term) puts a Zipf
    head term's entire posting list in ONE task.  Instead the per-term rank
    is computed in two phases over (term, salt) where salt = a docid-range
    bucket:
      1. counts per (term, salt) -> per-term cumulative offsets (the tiny
         frame is windowed, never the postings),
      2. local rank within (term, salt) + broadcast offset = global rank.
    The skew-sensitive shuffle key becomes (term, salt); a head term spreads
    over `salt_buckets` tasks.  Docid order within a term is preserved
    because salts are docid ranges.
    """
    if max_docid is not None:
        # driver-known docid bound (save_index passes it from the cheap
        # docs frame): salt width is a plain literal
        width = max(1, (int(max_docid) + 1) // salt_buckets)
        p = postings.withColumn(
            "_salt", (F.col("docid") / F.lit(width)).cast("int")
        )
    else:
        # LAZY width: a broadcast 1-row subframe instead of an eager
        # collect.  The old `postings.agg(max(docid)).collect()` here made
        # every build_index() call materialize the whole analyze+invert
        # UDF pipeline once (mapInArrow is opaque to column pruning) just
        # to size the salt — a full duplicate tokenization pass, ~30% of
        # bench build time (round-6 measurement).
        width_frame = postings.agg(
            F.greatest(
                F.floor((F.max("docid") + 1) / F.lit(salt_buckets)),
                F.lit(1),
            )
            .cast("long")
            .alias("_salt_width")
        )
        p = postings.crossJoin(F.broadcast(width_frame)).withColumn(
            "_salt", (F.col("docid") / F.col("_salt_width")).cast("int")
        ).drop("_salt_width")
    counts = p.groupBy("term", "_salt").agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.partitionBy("term")
        .orderBy("_salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(w), F.lit(0))
    ).select("term", "_salt", "_off")

    w_local = Window.partitionBy("term", "_salt").orderBy("docid")
    return (
        # no broadcast hint: the offsets frame is one row per (term, salt)
        # pair — small for test vocabularies but O(|postings|/128) worst
        # case at web scale; AQE picks broadcast vs shuffle join by size
        p.join(offsets, ["term", "_salt"])
        .withColumn(
            "block_no",
            (
                (F.row_number().over(w_local) - 1 + F.col("_off")) / BLOCK_SIZE
            ).cast("int"),
        )
        .drop("_salt", "_off")
    )


def compute_blocks(postings: DataFrame, salt_buckets: int = 64,
                   max_docid: Optional[int] = None) -> DataFrame:
    """Per-(term, block) quality stats for WAND.  If the posting rows
    already carry `block_no` (written by save_index) this is one cheap
    map-side-combinable aggregation; otherwise the salted rank assigns
    block numbers first."""
    withno = (
        postings
        if "block_no" in postings.columns
        else with_block_no(postings, salt_buckets, max_docid=max_docid)
    )
    return withno.groupBy("field", "term", "block_no").agg(
        F.count(F.lit(1)).cast("int").alias("n_postings"),
        F.min("docid").alias("min_docid"),
        F.max("docid").alias("max_docid"),
        F.max("weight").alias("max_weight"),
        F.min("len_byte").alias("min_len_byte"),
    )


def save_index(ix: InvertedIndex, path: str, term_partitions: int = 0,
               compress_positions: bool = False,
               codec: str = None) -> None:
    """Write the index as term-sorted parquet (segment commit ≙ TOC write).

    ONE heavy pipeline: the analyze+invert UDF pass streams straight into the
    term-range-partitioned postings write (a single shuffle).  Every other
    table — docmeta, term_stats, blocks, global stats — derives from the
    WRITTEN columnar postings (cheap re-reads), so tokenization runs exactly
    once per save.  Postings sorted by (term, docid): parquet min/max stats
    give term-dictionary data skipping at query time.
    """
    import time as _time

    _timing = bool(os.environ.get("WRS_BUILD_TIMING"))
    _t0 = _time.perf_counter()

    def _mark(label: str) -> None:
        nonlocal _t0
        if _timing:
            now = _time.perf_counter()
            import sys as _sys

            print(f"[build-timing] {label}: {now - _t0:.3f}s", file=_sys.stderr)
            _t0 = now

    from pyspark import StorageLevel

    spark = ix.postings.sparkSession
    if term_partitions <= 0:
        term_partitions = spark.sparkContext.defaultParallelism
    # two-step write: (1) the analyze+invert UDF pass materializes ONCE into
    # a spill-safe cache — repartitionByRange would otherwise execute the
    # whole UDF pipeline TWICE (range-boundary sampling + the real pass).
    # Round 6 replaced the previous scratch-parquet round trip with
    # persist(MEMORY_AND_DISK): same single-tokenization guarantee, minus a
    # full parquet encode+commit+decode of the postings (guide §5 persist
    # vs recompute; at segment scale the cache spills to local disk, which
    # is what the scratch table was).  (2) the cheap cache re-read pays for
    # the sampling, the term-range shuffle and the (term, docid) sort.
    to_write = ix.postings
    # position codec selection (codecs.py): `codec` names a registered
    # codec; compress_positions=True is the back-compat alias for 'varint'
    # (the reference's delta+varint payload encoding, whoosh3.py:844-850 —
    # smallest at rest but its chained Python stage costs build throughput
    # at high core counts: 1M docs 14.4k -> 7.9k docs/s at 32 cores).
    # 'jvmdelta' delta-encodes JVM-side at ~no build cost.
    if codec is None:
        codec = "varint" if compress_positions else "raw"
    if codec != "raw" and "positions" in to_write.columns:
        from whoosh_reloaded_spark.index.codecs import get_codec

        encode, _ = get_codec(codec)
        to_write = to_write.withColumn(
            "positions", encode(F.col("positions"))
        )
    to_write = to_write.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if _timing:
            # timing-only split point: materialize the cache now so the
            # UDF pass and the shuffle/write show as separate phases
            to_write.count()
            _mark("UDF pass (cache materialization)")
        # assign block_no BEFORE the final write so the stored postings
        # carry their WAND block id — query-time block filters become
        # (term, block_no) equi-joins instead of broadcast range joins.
        #
        # Round 6: block_no is derived FROM the term-range sort the write
        # needs anyway, instead of a separate salted Window shuffle
        # (guide §2.4 — two operations keyed the same way share one
        # exchange).  After repartitionByRange(term, docid) +
        # sortWithinPartitions(term, docid), a term's postings are in
        # global docid order across ascending partition ids, so the
        # per-term rank is  (mid - first_mid_of(pid, term))  +  the count
        # of the term's rows in earlier partitions.  Both correction
        # terms come from ONE tiny per-(partition, term) aggregate
        # (~|vocab| + #partitions rows, because range partitioning keeps
        # a term's rows contiguous), which AQE broadcasts; the old plan
        # hash-shuffled and sorted the ENTIRE posting set a second time
        # for Window.partitionBy(term, salt).  Plan: 2 full shuffles -> 1.
        rp = (
            to_write.repartitionByRange(term_partitions, "term", "docid")
            .sortWithinPartitions("term", "docid")
            .withColumn("_pid", F.spark_partition_id())
            .withColumn("_mid", F.monotonically_increasing_id())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        g = rp.groupBy("_pid", "term").agg(
            F.min("_mid").alias("_m0"),
            F.count(F.lit(1)).alias("_c"),
        )
        w_off = (
            Window.partitionBy("term")
            .orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = g.withColumn(
            "_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0))
        ).select("_pid", "term", "_m0", "_off")
        # keep the historical written column order (term first, block_no
        # last) so saved-index layouts stay byte-compatible across rounds;
        # merged segments arrive WITH a block_no column (withColumn below
        # replaces it), so it must not be listed twice
        out_cols = ["term"] + [
            c
            for c in rp.columns
            if c not in ("term", "_pid", "_mid", "block_no")
        ] + ["block_no"]
        # explicit broadcast: plan-time estimates otherwise pick a
        # sort-merge join whose exchange re-shuffles rp and destroys the
        # (term, docid) file order (verified round 6).  offsets is
        # ~|vocabulary| + #partitions tiny rows (Heaps'-law bounded even
        # at web scale); an index whose vocab outgrows the 8 GB broadcast
        # cap should build per-segment via checkpoint.build_partitioned.
        (
            rp.join(F.broadcast(offsets), ["_pid", "term"])
            .withColumn(
                "block_no",
                (
                    (F.col("_mid") - F.col("_m0") + F.col("_off"))
                    / BLOCK_SIZE
                ).cast("int"),
            )
            .select(*out_cols)
            .write.mode("overwrite")
            .parquet(f"{path}/postings")
        )
        rp.unpersist()
        _mark("postings write (UDF pass + block_no + range sort)")
        wp = spark.read.parquet(f"{path}/postings")

        # ONE scan of the written postings feeds BOTH blocks and
        # term_stats: the per-(term, block) aggregation also carries the
        # per-block weight sum, and term_stats is its rollup (exact: df
        # and the weight sums are sums of disjoint block partials).
        blocks_full = wp.groupBy("field", "term", "block_no").agg(
            F.count(F.lit(1)).cast("int").alias("n_postings"),
            F.min("docid").alias("min_docid"),
            F.max("docid").alias("max_docid"),
            F.max("weight").alias("max_weight"),
            F.min("len_byte").alias("min_len_byte"),
            F.sum("weight").alias("_w_sum"),
        ).persist(StorageLevel.MEMORY_AND_DISK)

        def _write_blocks_then_term_stats():
            (
                blocks_full.drop("_w_sum")
                .repartitionByRange(max(1, term_partitions // 4), "term")
                .sortWithinPartitions("term", "block_no")
                .write.mode("overwrite")
                .parquet(f"{path}/blocks")
            )
            term_stats = blocks_full.groupBy("field", "term").agg(
                F.sum("n_postings").cast("long").alias("df"),
                F.sum("_w_sum").alias("total_weight"),
                F.max("max_weight").alias("max_weight"),
                F.min("min_len_byte").alias("min_len_byte"),
            )
            (
                term_stats.repartitionByRange(
                    max(1, term_partitions // 4), "term"
                )
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(f"{path}/term_stats")
            )
            blocks_full.unpersist()

        def _write_docmeta():
            from pyspark.sql import Observation

            if ix.docs_raw is not None:
                # docmeta without re-running the UDF: uid/stored from the
                # raw doc frame, lengths from the written postings (0 for
                # token-less docs)
                doclen = wp.groupBy("docid").agg(
                    F.max("length").alias("length"),
                    F.max("len_byte").alias("len_byte"),
                )
                docmeta = (
                    ix.docs_raw.join(doclen, "docid", "left")
                    .na.fill({"length": 0, "len_byte": 0})
                )
            else:
                docmeta = ix.docmeta
            # global stats ride along with the write as observed metrics —
            # no separate stats job afterwards.  The CollectMetrics node
            # sits ABOVE the range exchange, so the boundary-sampling
            # pass (which executes only the exchange's child) cannot
            # double-count the rows.
            obs = Observation("wrs_docmeta_stats")
            (
                docmeta.repartitionByRange(
                    max(1, term_partitions // 4), "docid"
                )
                .sortWithinPartitions("docid")
                .observe(
                    obs,
                    F.count(F.lit(1)).alias("doc_count"),
                    F.coalesce(F.sum("length"), F.lit(0)).alias(
                        "field_length"
                    ),
                )
                .write.mode("overwrite")
                .parquet(f"{path}/docmeta")
            )
            return obs.get

        # the derived tables are independent jobs over the written
        # postings — run them from a 2-thread pool so the second job's
        # tasks back-fill executors the first job's tail leaves idle
        # (guide §2.6 overlap-independent-jobs); job order inside each
        # thread keeps the blocks -> term_stats rollup dependency.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            fut_bt = pool.submit(_write_blocks_then_term_stats)
            fut_dm = pool.submit(_write_docmeta)
            fut_bt.result()
            obs_stats = fut_dm.result()
        _mark("derived writes (blocks + term_stats + docmeta, overlapped)")
    finally:
        to_write.unpersist()
    doc_count = int(obs_stats["doc_count"])
    field_length = int(obs_stats["field_length"])
    stats = {
        "doc_count": doc_count,
        "field_length": field_length,
        "avg_field_length": (field_length / doc_count) if doc_count else 0.0,
    }
    _mark("global stats")
    ix.stats = stats
    stats_path = os.path.join(path, "stats.json")
    os.makedirs(path, exist_ok=True)
    with open(stats_path, "w") as f:
        json.dump(
            {"stats": stats, "uid_col": ix.uid_col,
             "fieldname": ix.fieldname, "codec": codec,
             "format_version": FORMAT_VERSION}, f
        )


#: on-disk layout version recorded in stats.json (index.version_in
#: analogue; the reference tracks _CURRENT_TOC_VERSION in its TOC)
FORMAT_VERSION = 1


def exists_in(path: str) -> bool:
    """True when `path` holds a saved index (reference index.exists_in:
    checks for the TOC; here the stats.json + postings dir)."""
    return os.path.isfile(os.path.join(path, "stats.json")) and os.path.isdir(
        os.path.join(path, "postings")
    )


def version_in(path: str):
    """(library_name, format_version) of the saved index (reference
    index.version_in returns (release, format) from the TOC)."""
    with open(os.path.join(path, "stats.json")) as f:
        meta = json.load(f)
    return ("whoosh_reloaded_spark", int(meta.get("format_version", 0)))


def last_modified(path: str) -> float:
    """Commit time of the index snapshot (Index.last_modified): the
    stats.json mtime — it is written last in save_index, after every
    parquet table, so it timestamps the commit."""
    return os.path.getmtime(os.path.join(path, "stats.json"))


#: reader granularity: ~bytes of parquet per scan partition for SMALL
#: tables.  Spark's file-split planner targets `minPartitionNum` (=
#: default parallelism) partitions regardless of size, so a few-MB
#: segment scans as 32 near-empty partitions and every query stage pays
#: 32 tasks of scheduling for microseconds of work.  Coalescing the read
#: to ceil(bytes / this) partitions cut the aggregation-query latency
#: 30-40% at sf1.0 (round-6 measurement: q2_or3 0.38 -> 0.26 p50 at 8
#: partitions).  Size-driven, not core-count-driven: once a table
#: exceeds parallelism * this, coalesce(want >= natural) is a no-op and
#: the natural (maxPartitionBytes) splits rule — at cluster scale this
#: changes nothing.
READ_PARTITION_BYTES = 16 << 20


def _parquet_dir_bytes(path: str) -> int:
    total = 0
    try:
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, f))
    except OSError:
        return 0
    return total


def _sized_read(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table with size-appropriate scan granularity (see
    READ_PARTITION_BYTES).  coalesce() never increases the partition
    count, so large tables keep their natural splits."""
    df = spark.read.parquet(path)
    want = max(1, -(-_parquet_dir_bytes(path) // READ_PARTITION_BYTES))
    return df.coalesce(want)


def load_index(spark: SparkSession, path: str) -> InvertedIndex:
    with open(os.path.join(path, "stats.json")) as f:
        meta = json.load(f)
    blocks = None
    if os.path.isdir(os.path.join(path, "blocks")):
        blocks = _sized_read(spark, f"{path}/blocks")
    postings = _sized_read(spark, f"{path}/postings")
    # decode stored positions lazily via the recorded codec — column
    # pruning means non-positional queries never pay for this.  Pre-codec
    # indexes: infer 'varint' from a binary column, else 'raw'.
    codec = meta.get("codec")
    if codec is None:
        codec = (
            "varint"
            if dict(postings.dtypes).get("positions") == "binary"
            else "raw"
        )
    if codec != "raw" and "positions" in postings.columns:
        from whoosh_reloaded_spark.index.codecs import get_codec

        _, decode = get_codec(codec)
        postings = postings.withColumn(
            "positions", decode(F.col("positions"))
        )
    return InvertedIndex(
        docmeta=_sized_read(spark, f"{path}/docmeta"),
        postings=postings,
        term_stats=_sized_read(spark, f"{path}/term_stats"),
        stats=meta["stats"],
        uid_col=meta["uid_col"],
        fieldname=meta["fieldname"],
        blocks=blocks,
    )
