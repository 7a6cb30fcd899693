"""Isolated-phase scaling runs for the N->4N efficiency criterion.

Phases measured separately (each invocation = one fresh JVM):
  prep     — generate the corpus parquet + the unsorted posting scratch
             (run once, any core count)
  analyze  — the mapInArrow tokenize+invert pass, scratch write
             (compute/memory-bandwidth bound)
  shuffle  — read columnar scratch -> repartitionByRange(term, docid) +
             sortWithinPartitions + parquet write (the term-range shuffle
             that replaces the reference's PostingPool external sort)

Host 1-minute loadavg is recorded before/after every rep so a noisy-host
sample is visible in the data instead of silently skewing the medians.

Usage: python scripts/bench_scaling.py <phase> <cores> [n_docs] [reps]
Emits one JSON line with per-rep seconds + loads.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

PHASE = sys.argv[1]
CORES = int(sys.argv[2])
N_DOCS = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3

BASE = f"/tmp/scalebench_{N_DOCS}"
DOCS = f"{BASE}/docs"
SCRATCH = f"{BASE}/scratch_postings"
OUT = f"{BASE}/out_{CORES}"


def session(cores):
    s = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(32, cores * 2)))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def main():
    from pyspark.sql import functions as F

    from whoosh_reloaded_spark.analysis import INVERT_ROWS_SCHEMA, make_invert_rows
    from whoosh_reloaded_spark.corpus import pages_df_dist
    from whoosh_reloaded_spark.index.build import assign_docids

    spark = session(CORES)
    times, loads = [], []

    if PHASE == "prep":
        pages = pages_df_dist(spark, N_DOCS, num_partitions=128).select(
            "url", "text"
        )
        docs = assign_docids(pages, "url")
        docs.write.mode("overwrite").parquet(DOCS)
        d = spark.read.parquet(DOCS)
        run = make_invert_rows(None)
        (
            d.select("docid", "text")
            .mapInArrow(run, INVERT_ROWS_SCHEMA)
            .write.mode("overwrite")
            .parquet(SCRATCH)
        )
        print(json.dumps({"phase": "prep", "docs": N_DOCS, "ok": True}))
        return

    for _ in range(REPS):
        l0 = os.getloadavg()[0]
        if PHASE == "analyze":
            d = spark.read.parquet(DOCS)
            run = make_invert_rows(None)
            t0 = time.perf_counter()
            (
                d.select("docid", "text")
                .mapInArrow(run, INVERT_ROWS_SCHEMA)
                .write.mode("overwrite")
                .parquet(OUT + "_an")
            )
            dt = time.perf_counter() - t0
            shutil.rmtree(OUT + "_an", ignore_errors=True)
        elif PHASE == "shuffle":
            sp = spark.read.parquet(SCRATCH)
            t0 = time.perf_counter()
            (
                sp.repartitionByRange(64, "term", "docid")
                .sortWithinPartitions("term", "docid")
                .write.mode("overwrite")
                .parquet(OUT + "_sh")
            )
            dt = time.perf_counter() - t0
            shutil.rmtree(OUT + "_sh", ignore_errors=True)
        else:
            raise SystemExit(f"unknown phase {PHASE}")
        times.append(round(dt, 2))
        loads.append((round(l0, 2), round(os.getloadavg()[0], 2)))

    med = sorted(times)[len(times) // 2]
    print(
        json.dumps(
            {
                "phase": PHASE,
                "cores": CORES,
                "n_docs": N_DOCS,
                "reps_sec": times,
                "p50_sec": med,
                "docs_per_sec": round(N_DOCS / med, 1),
                "loadavg_before_after": loads,
            }
        )
    )


if __name__ == "__main__":
    main()
