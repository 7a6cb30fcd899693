#!/usr/bin/env python
"""spark-submit entry point: query a saved index with a query string.

    spark-submit --py-files wrs.zip scripts/search.py \\
        --index s3://bucket/index/ --query "render AND yellow" --limit 10
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--multisegment", action="store_true",
                    help="index root holds a build_manifest (sliced build)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("wrs-search").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from whoosh_reloaded_spark.query import Searcher
    from whoosh_reloaded_spark.query.parser import QueryParser

    if args.multisegment:
        from whoosh_reloaded_spark.index.checkpoint import open_partitioned

        ix = open_partitioned(spark, args.index)
    else:
        from whoosh_reloaded_spark.index import load_index

        ix = load_index(spark, args.index)
    s = Searcher(ix)
    q = QueryParser(ix.fieldname).parse(args.query)
    for r in s.search(q, limit=args.limit).collect():
        print(json.dumps({"docid": r["docid"], "uid": r["uid"],
                          "score": round(r["score"], 6)}))


if __name__ == "__main__":
    sys.exit(main())
