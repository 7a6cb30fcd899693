#!/usr/bin/env python
"""Bandwidth-ceiling direct evidence (round-5 VERDICT task 3).

The 8->32-core scaling cells have repeatedly shown ~0.5 efficiency,
attributed to a single-box memory-bandwidth ceiling rather than a serial
section in the job.  Direct test: run TWO independent 8-core builds
CONCURRENTLY (16 cores total) on disjoint halves of the 1M corpus, in
separate OS processes with separate Spark sessions.  If the aggregate
throughput of the concurrent pair ~= the sum of the solo runs, the
per-8-core-worker throughput transfers to independent executors — the
cluster-scaling story holds and the 8->32 falloff is in-process memory
bandwidth contention at higher thread counts.  A much lower aggregate
would instead indicate a shared bottleneck (page cache, disk, JVM).

Usage:
  python scripts/bench_dual8.py                 # orchestrates everything
  python scripts/bench_dual8.py --worker A      # internal: one 8-core build

env: WRS_1M_CORPUS (default /tmp/wrs_scaling_corpus_1000000)
     WRS_DUAL_ROOT (default /tmp/wrs_dual8)
Prints one JSON line (orchestrator mode).
"""

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get("WRS_1M_CORPUS", "/tmp/wrs_scaling_corpus_1000000")
ROOT = os.environ.get("WRS_DUAL_ROOT", "/tmp/wrs_dual8")
CORES = 8


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def worker(half: str) -> None:
    """One 8-core build over one hash-half of the corpus; writes a JSON
    result file.  Runs in its own process/Spark session."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CORES}]")
        .config("spark.sql.shuffle.partitions", str(CORES * 4))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName(f"dual8-{half}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from whoosh_reloaded_spark.index import build_index, save_index

    parity = 0 if half == "A" else 1
    docs = (
        spark.read.parquet(CORPUS)
        .select("url", "text")
        .where(F.abs(F.crc32("url")) % 2 == parity)
    )
    out = os.path.join(ROOT, f"ix_{half}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    ix = build_index(docs)
    save_index(ix, out)
    wall = time.perf_counter() - t0
    n = int(ix.stats["doc_count"])
    with open(os.path.join(ROOT, f"result_{half}.json"), "w") as f:
        json.dump(
            {
                "half": half,
                "n_docs": n,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n / wall, 1),
            },
            f,
        )


def run_worker(half: str) -> subprocess.Popen:
    env = dict(os.environ)
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", half],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def read_result(half: str) -> dict:
    with open(os.path.join(ROOT, f"result_{half}.json")) as f:
        return json.load(f)


def main():
    if "--worker" in sys.argv:
        worker(sys.argv[sys.argv.index("--worker") + 1])
        return

    os.makedirs(ROOT, exist_ok=True)
    results = {"loadavg_start": loadavg()}

    # solo baselines, sequential
    for half in ("A", "B"):
        p = run_worker(half)
        p.wait()
        assert p.returncode == 0, f"solo {half} failed"
        results[f"solo_{half}"] = read_result(half)

    # concurrent pair (16 cores total)
    results["loadavg_before_concurrent"] = loadavg()
    t0 = time.perf_counter()
    pa, pb = run_worker("A"), run_worker("B")
    pa.wait(), pb.wait()
    assert pa.returncode == 0 and pb.returncode == 0, "concurrent run failed"
    concurrent_wall = time.perf_counter() - t0
    ca, cb = read_result("A"), read_result("B")

    solo_sum = (
        results["solo_A"]["docs_per_sec"] + results["solo_B"]["docs_per_sec"]
    )
    agg = round(
        (ca["n_docs"] + cb["n_docs"]) / concurrent_wall, 1
    )
    results.update(
        {
            "concurrent_A": ca,
            "concurrent_B": cb,
            "concurrent_wall_sec": round(concurrent_wall, 2),
            "aggregate_docs_per_sec": agg,
            "solo_sum_docs_per_sec": round(solo_sum, 1),
            "parallel_efficiency": round(agg / solo_sum, 3),
            "loadavg_end": loadavg(),
        }
    )
    print(json.dumps({"metric": "dual_8core_concurrent_build", **results}))


if __name__ == "__main__":
    main()
