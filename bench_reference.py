#!/usr/bin/env python
"""Single-node reference (Whoosh) baseline on the same corpus.

Measures the reference's own add_document/commit build throughput and
BM25 top-10 query latency over the identical pages corpus the Spark engine
benches on — the apples-to-apples floor the engine must beat
(BASELINE.md §3.1).  Pure single-process Python, like the reference's own
bench harness (src/whoosh/support/bench.py).

Usage: python bench_reference.py [n_docs]   (default 20000 — whoosh is slow)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import tempfile
import time
import types

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

shim = types.ModuleType("cached_property")
shim.cached_property = functools.cached_property
sys.modules.setdefault("cached_property", shim)
sys.path.insert(0, "/root/reference/src")


def main(n_docs: int = 20000):
    from whoosh import fields, index
    from whoosh.query import And, Or, Term

    from whoosh_reloaded_spark.corpus import generate_rows

    # WRS_REF_IX_DIR: persist/reuse the reference index across runs so the
    # (hours-long at 8M) build isn't repeated for query-latency refreshes
    ix_dir = os.environ.get("WRS_REF_IX_DIR")
    build_sec = None
    if ix_dir and os.path.exists(os.path.join(ix_dir, "_whoosh_done")):
        ix = index.open_dir(ix_dir)
    else:
        schema = fields.Schema(
            url=fields.ID(stored=True, unique=True), text=fields.TEXT
        )
        d = ix_dir or tempfile.mkdtemp(prefix="whoosh_baseline_")
        os.makedirs(d, exist_ok=True)
        ix = index.create_in(d, schema)
        t0 = time.perf_counter()
        w = ix.writer(limitmb=int(os.environ.get("WRS_REF_LIMITMB", "256")))
        for url, ts, html, text, lang in generate_rows(n_docs):
            w.add_document(url=url, text=text)
        w.commit()
        build_sec = time.perf_counter() - t0
        if ix_dir:
            with open(os.path.join(d, "_whoosh_done"), "w") as f:
                f.write(str(n_docs))

    from whoosh.query import Phrase, Prefix, Wildcard

    queries = {
        "q1_term": Term("text", "render"),
        "q2_or3": Or([Term("text", "render"), Term("text", "yellow"), Term("text", "alpha")]),
        "q3_and2": And([Term("text", "render"), Term("text", "town")]),
        "q4_phrase": Phrase("text", ["render", "yellow"]),
        "q8_head_term": Term("text", "data"),
        # multiterm expansion family (round-4 weak-item measurement):
        # same patterns as scripts/bench_1m_queries.py
        "q_prefix_re": Prefix("text", "re"),
        "q_wildcard_mid": Wildcard("text", "re*er"),
    }
    lat = {}
    with ix.searcher() as s:
        for name, q in queries.items():
            reps = []
            for _ in range(5):
                t1 = time.perf_counter()
                s.search(q, limit=10)
                reps.append(time.perf_counter() - t1)
            reps.sort()
            lat[name] = round(reps[len(reps) // 2], 5)  # p50 of 5

    print(json.dumps({
        "metric": "reference_whoosh_single_node",
        "docs": n_docs,
        "build_sec": round(build_sec, 3),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "query_p50_sec": lat,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20000)
