#!/usr/bin/env python
"""1M-doc query-latency refresh (p50 of 5, warm): the BASELINE §3.2
head-to-head query set over the standard 1M pages corpus.  Prints one
JSON line; run per-round to keep the 1M numbers attributable."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get(
    "SPARK_GRAFT_1M_CORPUS", "/tmp/wrs_scaling_corpus_1000000"
)
IX_DIR = os.environ.get("SPARK_GRAFT_1M_IX", "/tmp/wrs_1m_ix")


def main():
    from bench import make_spark

    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    from whoosh_reloaded_spark.index import build_index, load_index, save_index
    from whoosh_reloaded_spark.query import (
        And,
        AndNot,
        DisjunctionMax,
        Or,
        Phrase,
        Prefix,
        Searcher,
        Term,
        Wildcard,
    )

    build_sec = None
    if not os.path.exists(os.path.join(IX_DIR, "stats.json")):
        corpus = spark.read.parquet(CORPUS)
        t0 = time.perf_counter()
        ix = build_index(corpus, uid_col="url", text_col="text")
        save_index(ix, IX_DIR)
        build_sec = round(time.perf_counter() - t0, 2)

    ix = load_index(spark, IX_DIR)
    if os.environ.get("SPARK_GRAFT_NO_PERSIST"):
        # corpora too big to pin in executor memory: query the term-sorted
        # parquet directly (the realistic at-scale path — pushed term
        # filters + OS page cache); one count warms the page cache
        ix.postings.count()
    else:
        ix.persist()
        ix.postings.count()
        ix.docmeta.count()
    s = Searcher(ix)

    qs = {
        "term_render": Term("render"),
        "head_term_data": Term("data"),
        "or3": Or([Term("render"), Term("yellow"), Term("alpha")]),
        "and2": And([Term("render"), Term("town")]),
        "dismax": DisjunctionMax([Term("render"), Term("yellow")]),
        "andnot": AndNot(Term("render"), Term("yellow")),
        "nested": And([Or([Term("render"), Term("yellow")]), Term("data")]),
        "phrase_render_yellow": Phrase(["render", "yellow"]),
        "phrase_data_spark": Phrase(["data", "spark"]),
        "prefix_re": Prefix("re"),
        "wildcard_mid": Wildcard("re*er"),
    }
    out = {}
    for name, q in qs.items():
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            s.search(q, limit=10, with_uid=False).collect()
            times.append(time.perf_counter() - t0)
        times.sort()
        out[name] = round(times[2], 3)
    print(json.dumps({
        "metric": "bm25_1m_query_p50",
        "n_docs": 1_000_000,
        "build_sec": build_sec,
        "queries": out,
    }))


if __name__ == "__main__":
    main()
