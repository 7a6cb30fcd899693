#!/usr/bin/env python
"""Streaming-append at-scale bench (round-5 VERDICT task 5; reference
BufferedWriter analogue, writing.py:1078+): N micro-batches of ~100k
docs appended as one segment each via streaming/append.py append_batch
(the exact foreachBatch body), measuring

  (a) append latency per micro-batch (docs/s of the NRT path),
  (b) query latency as a function of live segment count (the cost a
      refreshed Searcher pays before compaction),
  (c) MERGE_SMALL compaction wall + post-compaction query latency
      (the BufferedWriter-flush analogue cadence).

Prints one JSON line.  Usage: python scripts/bench_streaming_append.py
  env SPARK_GRAFT_CPUS    (default 24)
      WRS_1M_CORPUS       (default /tmp/wrs_scaling_corpus_1000000)
      WRS_STREAM_ROOT     (default /tmp/wrs_stream_bench)
      WRS_N_BATCHES       (default 10)
"""

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get("WRS_1M_CORPUS", "/tmp/wrs_scaling_corpus_1000000")
ROOT = os.environ.get("WRS_STREAM_ROOT", "/tmp/wrs_stream_bench")
NB = int(os.environ.get("WRS_N_BATCHES", "10"))
MEASURE_AT = {1, 2, 4, 8, NB}


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def p50_query(searcher, Term, And, Or, Phrase, reps=3):
    from whoosh_reloaded_spark.query import Prefix

    out = {}
    qs = {
        "term_render": Term("render"),
        "and2": And((Term("data"), Term("table"))),
        "or3": Or((Term("render"), Term("yellow"), Term("quick"))),
        "phrase2": Phrase(("render", "yellow")),
    }
    for name, q in qs.items():
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            searcher.search_list(q, 10)
            ts.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(ts), 3)
    return out


def main():
    from bench import make_spark

    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "24")))
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from whoosh_reloaded_spark.index.checkpoint import (
        open_partitioned,
        read_manifest,
    )
    from whoosh_reloaded_spark.index.segments import (
        MERGE_SMALL,
        merge_segments,
        pick_merge,
    )
    from whoosh_reloaded_spark.query import And, Or, Phrase, Searcher, Term
    from whoosh_reloaded_spark.streaming.append import append_batch

    seg_root = os.path.join(ROOT, "ix")
    resume = len(
        [
            r
            for r in read_manifest(seg_root).values()
            if r.get("status") == "complete"
        ]
    ) >= NB
    if not resume:
        shutil.rmtree(ROOT, ignore_errors=True)
        os.makedirs(ROOT, exist_ok=True)
        scratch = os.path.join(ROOT, "batches")

        # micro-batch arrival simulation: slice the 1M corpus into NB
        # ~equal batches by uid hash, materialized so each append reads
        # only its own input (like a real stream source)
        corpus = spark.read.parquet(CORPUS).select("url", "text")
        corpus.withColumn(
            "b", F.abs(F.crc32("url")) % NB
        ).write.partitionBy("b").mode("overwrite").parquet(scratch)
        os.makedirs(seg_root, exist_ok=True)

    appends = []
    latency_curve = {}
    for i in range(NB):
        if resume:
            row = read_manifest(seg_root)[i]
            wall = row["wall_sec"]
        else:
            bdf = spark.read.parquet(f"{ROOT}/batches/b={i}")
            t0 = time.perf_counter()
            row = append_batch(bdf, seg_root, batch_id=i)
            wall = time.perf_counter() - t0
        appends.append(
            {
                "batch": i,
                "n_docs": row["n_docs"],
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(row["n_docs"] / wall, 1),
                "loadavg": loadavg(),
            }
        )
        n_segs = i + 1
        if n_segs in MEASURE_AT:
            manifest = read_manifest(seg_root)
            paths = [
                manifest[j]["segment_path"] for j in range(n_segs)
            ]
            from whoosh_reloaded_spark.index.segments import load_multi

            s = Searcher(load_multi(spark, paths))
            latency_curve[str(n_segs)] = p50_query(
                s, Term, And, Or, Phrase
            )

    # compaction: MERGE_SMALL over the manifest segment sizes
    manifest = read_manifest(seg_root)
    sizes = {
        r["segment_path"]: r["n_docs"]
        for r in manifest.values()
        if r.get("status") == "complete"
    }
    to_merge = pick_merge(sizes, MERGE_SMALL)
    policy = MERGE_SMALL
    if not to_merge:
        # equal-sized micro-batch segments are never "small" relative to
        # each other — the compaction cadence for a steady stream is the
        # periodic full fold (OPTIMIZE), the BufferedWriter-commit
        # analogue
        from whoosh_reloaded_spark.index.segments import OPTIMIZE

        policy = OPTIMIZE
        to_merge = pick_merge(sizes, OPTIMIZE)
    merged_path = os.path.join(ROOT, "merged")
    shutil.rmtree(merged_path, ignore_errors=True)
    t0 = time.perf_counter()
    merge_segments(spark, to_merge, merged_path)
    merge_wall = time.perf_counter() - t0

    from whoosh_reloaded_spark.index import load_index

    s2 = Searcher(load_index(spark, merged_path))
    post = p50_query(s2, Term, And, Or, Phrase)

    total_docs = sum(a["n_docs"] for a in appends)
    total_wall = sum(a["wall_sec"] for a in appends)
    print(
        json.dumps(
            {
                "metric": "streaming_append_1m_10x100k",
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "24")),
                "n_batches": NB,
                "total_docs": total_docs,
                "append_total_sec": round(total_wall, 1),
                "append_docs_per_sec": round(total_docs / total_wall, 1),
                "appends": appends,
                "query_p50_by_segments": latency_curve,
                "compaction": {
                    "policy": policy,
                    "n_merged": len(to_merge),
                    "wall_sec": round(merge_wall, 1),
                    "post_merge_query_p50": post,
                },
                "resumed_appends": resume,
                "loadavg_end": loadavg(),
            }
        )
    )


if __name__ == "__main__":
    main()
