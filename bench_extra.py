#!/usr/bin/env python
"""Round-6 measurement harness (bench.py is FROZEN; extra benchmarks live
here per the optimization-round rules).

Does three things the headline bench cannot:
  * per-phase build timing (WRS_BUILD_TIMING marks inside save_index),
  * per-query p50 with the SAME methodology as bench.py (5 reps, median),
    plus a job-count per query from the status tracker,
  * `.explain("formatted")` capture for every bench query into
    plans/r06/<name>_<tag>.txt  (--plans <tag>).

Usage:
  python bench_extra.py                 # build timing + query p50s (JSON line)
  python bench_extra.py --plans before  # additionally write plan files
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("WRS_BUILD_TIMING", "1")

from bench import bench_queries, make_spark, run_build  # noqa: E402


def query_set():
    from whoosh_reloaded_spark.query import (
        And,
        AndNot,
        DisjunctionMax,
        FuzzyTerm,
        Or,
        Phrase,
        Prefix,
        Term,
        TermRange,
        Wildcard,
    )

    return {
        "q1_term": Term("spark"),
        "q2_or3": Or([Term("spark"), Term("join"), Term("merge")]),
        "q3_and2": And([Term("spark"), Term("vector")]),
        "q4_phrase": Phrase(["batch", "stream"]),
        "q5_prefix": Prefix("sc"),
        "q6_andnot": AndNot(Term("spark"), Term("join")),
        "q7_wildcard": Wildcard("s*am"),
        "q8_head_term": Term("data"),
        "q9_dismax": DisjunctionMax([Term("spark"), Term("join")]),
        "q10_fuzzy": FuzzyTerm("sparc"),
        "q11_termrange": TermRange("table", "valu"),
        "q12_nested": And([Or([Term("spark"), Term("join")]), Term("data")]),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    plans_tag = None
    if "--plans" in sys.argv:
        plans_tag = sys.argv[sys.argv.index("--plans") + 1]

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    out_dir = tempfile.mkdtemp(prefix="wrs_benchx_ix_")
    try:
        t0 = time.perf_counter()
        sc.setJobDescription("build+save index")
        n_docs, build_sec = run_build(spark, sf_dir, out_dir)
        sc.setJobDescription(None)
        print(f"[bench_extra] build: {build_sec:.3f}s ({n_docs} docs)",
              file=sys.stderr)

        from whoosh_reloaded_spark.index import load_index
        from whoosh_reloaded_spark.query import Searcher

        ix = load_index(spark, out_dir)
        ix.persist()
        ix.postings.count()
        ix.docmeta.count()
        s = Searcher(ix)

        qs = query_set()
        if plans_tag:
            pd = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "plans", "r06")
            os.makedirs(pd, exist_ok=True)
            for name, q in qs.items():
                df = s.search(q, limit=10, with_uid=False)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(pd, f"{name}_{plans_tag}.txt"), "w") as f:
                    f.write(plan)
            print(f"[bench_extra] plans written to plans/r06/*_{plans_tag}.txt",
                  file=sys.stderr)

        out = {}
        jobs = {}
        reps = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "5"))
        for name, q in qs.items():
            sc.setJobDescription(name)
            times = []
            for i in range(reps):
                jid0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
                t = time.perf_counter()
                s.search(q, limit=10, with_uid=False).collect()
                times.append(time.perf_counter() - t)
                if i == reps - 1:
                    jid1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
                    jobs[name] = jid1 - jid0
            sc.setJobDescription(None)
            times.sort()
            out[name] = round(times[len(times) // 2], 4)
            print(f"[bench_extra] {name}: p50={out[name]} "
                  f"min={times[0]:.4f} max={times[-1]:.4f} "
                  f"jobs_last_rep={jobs[name]}", file=sys.stderr)

        total = time.perf_counter() - t0
        print(json.dumps({
            "metric": "bench_extra",
            "build_sec": round(build_sec, 3),
            "query_p50_sum": round(sum(out.values()), 3),
            "queries": out,
            "jobs_last_rep": jobs,
            "total": round(total, 3),
            "sf_dir": sf_dir,
            "cpus": cpus,
        }))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
