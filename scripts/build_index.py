#!/usr/bin/env python
"""spark-submit entry point: build an inverted index from a pages table.

The north rule's deployment shape: the engine runs via

    spark-submit --py-files wrs.zip scripts/build_index.py \\
        --input  s3://bucket/pages/           (parquet, url+text columns) \\
        --output s3://bucket/index/           \\
        --slices 64                           (resumable checkpoint slices)

On a multi-executor cluster the same code runs unchanged — partitioning,
shuffles and checkpointing are the engine's, not local-mode specifics.
Package the library with:  cd /root/repo && zip -r wrs.zip whoosh_reloaded_spark
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet path")
    ap.add_argument("--output", required=True, help="index output root")
    ap.add_argument("--uid-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--slices", type=int, default=0,
                    help=">0: resumable sliced build with manifest; 0: single job")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("wrs-build-index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    corpus = spark.read.parquet(args.input)
    t0 = time.perf_counter()
    if args.slices > 0:
        from whoosh_reloaded_spark.index.checkpoint import build_partitioned

        paths = build_partitioned(
            corpus, args.output, n_slices=args.slices,
            uid_col=args.uid_col, text_col=args.text_col,
            resume=not args.no_resume,
        )
        n_docs = None
    else:
        from whoosh_reloaded_spark.index import build_index, save_index

        ix = build_index(corpus, uid_col=args.uid_col, text_col=args.text_col)
        save_index(ix, args.output)
        n_docs = ix.stats["doc_count"]
        paths = [args.output]
    wall = time.perf_counter() - t0
    print(json.dumps({
        "output": args.output,
        "segments": len(paths),
        "docs": n_docs,
        "wall_sec": round(wall, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
