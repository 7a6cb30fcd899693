#!/usr/bin/env python
"""Corpus-size ladder for the remaining measured-at-1M-only families
(round-4 VERDICT task 6): spans, groupedby facets, collapse — p50 of 5 at
1M and 8M docs, back-to-back in one session, no executor caching
(the realistic at-scale path: pushed filters over term-sorted parquet),
per-scale loadavg recorded.  Also multiterm (prefix/wildcard) so the
1M-vs-8M multiterm ratios land in the same measured session.

Prints one JSON line.  Usage: python scripts/bench_ladder_extras.py
  env SPARK_GRAFT_CPUS (default 32)
      WRS_1M_IX (default /tmp/wrs_1m_ix), WRS_8M_IX (/tmp/wrs_8m_ix)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main():
    from bench import make_spark

    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    from whoosh_reloaded_spark.facets import best_per_group, function_facet
    from whoosh_reloaded_spark.index import load_index
    from whoosh_reloaded_spark.query import (
        Or,
        Prefix,
        Searcher,
        SpanFirst,
        SpanNear,
        Term,
        Wildcard,
    )

    out = {}
    for scale, path in (
        ("1m", os.environ.get("WRS_1M_IX", "/tmp/wrs_1m_ix")),
        ("8m", os.environ.get("WRS_8M_IX", "/tmp/wrs_8m_ix")),
    ):
        ix = load_index(spark, path)
        ix.postings.count()  # warm page cache, no persist
        s = Searcher(ix)

        def span_near():
            return s.search(
                SpanNear(Term("render"), Term("yellow"), slop=2),
                limit=10, with_uid=False,
            )

        def span_first():
            return s.search(SpanFirst(Term("render"), limit=6),
                            limit=10, with_uid=False)

        def facet_counts():
            hits = s._eval(Or([Term("render"), Term("yellow")]))
            return function_facet(hits, ix.docmeta, "pmod(docid, 97)", [])

        def collapse_top1():
            hits = s._eval(Or([Term("render"), Term("yellow")]))
            meta = ix.docmeta.withColumn(
                "grp", (ix.docmeta.docid % 97)
            ).select("docid", "grp")
            return best_per_group(hits, meta, ["grp"]).select(
                "grp", "docid", "score"
            )

        def prefix_re():
            return s.search(Prefix("re"), limit=10, with_uid=False)

        def wildcard_mid():
            return s.search(Wildcard("re*er"), limit=10, with_uid=False)

        cell = {"loadavg": loadavg()}
        for name, fn in (
            ("span_near", span_near),
            ("span_first", span_first),
            ("facet_counts", facet_counts),
            ("collapse_top1", collapse_top1),
            ("prefix_re", prefix_re),
            ("wildcard_mid", wildcard_mid),
        ):
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                fn().collect()
                times.append(time.perf_counter() - t0)
            times.sort()
            cell[name] = round(times[2], 3)
        cell["loadavg_after"] = loadavg()
        out[scale] = cell

    ratios = {
        k: round(out["8m"][k] / out["1m"][k], 2)
        for k in out["1m"]
        if not k.startswith("loadavg")
    }
    print(json.dumps({
        "metric": "ladder_extras_1m_vs_8m",
        "cells": out,
        "ratio_8x_data": ratios,
    }))


if __name__ == "__main__":
    main()
