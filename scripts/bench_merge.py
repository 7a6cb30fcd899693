#!/usr/bin/env python
"""Segment-merge compaction at scale (round-4 VERDICT task 7): merge 8
pre-built 1M-doc segments into one 8M index and compare docs/s against
rebuilding the 8M corpus from raw text.

The merge is the term-partitioned shuffle re-write of the unioned postings
(index/segments.py:93 merge_segments) — the analyze/invert Python stage is
skipped entirely, so compaction should beat rebuild by roughly the analyze
share of the build.  Prints one JSON line.

Usage: python scripts/bench_merge.py
  env SPARK_GRAFT_CPUS (default 24)
      WRS_8M_CORPUS (default /tmp/wrs_scaling_corpus_8000000)
      WRS_SEG_ROOT  (default /tmp/wrs_seg8)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get("WRS_8M_CORPUS", "/tmp/wrs_scaling_corpus_8000000")
SEG_ROOT = os.environ.get("WRS_SEG_ROOT", "/tmp/wrs_seg8")
N_SEGS = 8


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main():
    from bench import make_spark

    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "24")))
    spark.sparkContext.setLogLevel("ERROR")

    from whoosh_reloaded_spark.index.checkpoint import build_partitioned
    from whoosh_reloaded_spark.index.segments import load_multi, merge_segments
    from whoosh_reloaded_spark.query import Or, Searcher, Term

    corpus = spark.read.parquet(CORPUS)

    # 8 disjoint 1M-doc slices through the real MpWriter-analogue API:
    # ONE global docid assignment, range-sliced — segments carry globally
    # unique docids (the load_multi precondition)
    t0 = time.perf_counter()
    seg_paths = build_partitioned(
        corpus, SEG_ROOT, n_slices=N_SEGS, uid_col="url", text_col="text"
    )
    seg_build_sec = round(time.perf_counter() - t0, 1)
    if seg_build_sec < 5:
        seg_build_sec = None  # resumed from manifest; not a build timing

    n_docs = 8_000_000
    load_before = loadavg()

    # compaction: 8 segments -> one optimized index (term-range shuffle)
    t0 = time.perf_counter()
    merged = merge_segments(spark, seg_paths, os.path.join(SEG_ROOT, "merged"))
    merge_sec = round(time.perf_counter() - t0, 1)

    # sanity: merged index answers queries identically to the multi view
    multi = load_multi(spark, seg_paths)
    q = Or([Term("render"), Term("yellow")])
    a = Searcher(merged).search(q, limit=10, with_uid=False).collect()
    b = Searcher(multi).search(q, limit=10, with_uid=False).collect()
    match = [(r["docid"], round(r["score"], 9)) for r in a] == [
        (r["docid"], round(r["score"], 9)) for r in b
    ]

    print(json.dumps({
        "metric": "segment_merge_8x1m",
        "n_docs": n_docs,
        "seg_build_sec": seg_build_sec,
        "merge_sec": merge_sec,
        "merge_docs_per_sec": round(n_docs / merge_sec, 1),
        "multi_vs_merged_top10_match": match,
        "loadavg_before": load_before,
        "loadavg_after": loadavg(),
    }))


if __name__ == "__main__":
    main()
