"""WAND payoff evidence: wand_topk vs the exhaustive Or plan at bench scale.

Builds (once) a 10M-doc synthetic index on disk, then times block-max WAND
against the exhaustive fused-Or plan for several term mixes.  Emits one
JSON line per configuration plus a summary file.

Usage: python scripts/bench_wand.py [n_docs] [out_json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/wand_bench_10m.json"
IX_DIR = f"/tmp/wand_ix_{N_DOCS}"
REPS = 3


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from whoosh_reloaded_spark.corpus import pages_df_dist
    from whoosh_reloaded_spark.index import build_index, load_index, save_index
    from whoosh_reloaded_spark.query import Or, Searcher, Term
    from whoosh_reloaded_spark.wand import wand_topk

    build_sec = None
    if not os.path.isdir(os.path.join(IX_DIR, "postings")):
        t0 = time.perf_counter()
        pages = pages_df_dist(spark, N_DOCS, num_partitions=128).select("url", "text")
        ix = build_index(pages)
        save_index(ix, IX_DIR, term_partitions=64)
        build_sec = time.perf_counter() - t0
        print(json.dumps({"built": N_DOCS, "build_sec": round(build_sec, 1)}),
              flush=True)

    ix = load_index(spark, IX_DIR)
    s = Searcher(ix)

    # term mixes: zipf-head terms (many blocks), mid, mixed
    stats = {
        r["term"]: int(r["df"])
        for r in ix.term_stats.orderBy("df", ascending=False)
        .limit(2000).select("term", "df").collect()
    }
    by_rank = sorted(stats, key=lambda t: -stats[t])
    mixes = {
        "head2": by_rank[:2],
        "head3": by_rank[:3],
        "head_mid": [by_rank[0], by_rank[800]],
        "mid3": [by_rank[500], by_rank[800], by_rank[1100]],
    }

    results = {"n_docs": N_DOCS, "build_sec": build_sec, "mixes": {}}
    for name, terms in mixes.items():
        dfs = [stats[t] for t in terms]
        ex_times, wd_times = [], []
        # warm both paths once (file-cache + stats lookup)
        s._lookup_stats(terms)
        for _ in range(REPS):
            t0 = time.perf_counter()
            ex = s._eval(Or(tuple(Term(t) for t in terms)))
            ex_rows = [
                (r["docid"], round(r["score"], 9))
                for r in ex.orderBy(ex["score"].desc(), "docid").limit(10).collect()
            ]
            ex_times.append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            wd = wand_topk(s, terms, k=10)
            wd_rows = [
                (r["docid"], round(r["score"], 9))
                for r in wd.orderBy(wd["score"].desc(), "docid").limit(10).collect()
            ]
            wd_times.append(time.perf_counter() - t0)
            assert wd_rows == ex_rows, (name, wd_rows[:3], ex_rows[:3])

        med = lambda xs: sorted(xs)[len(xs) // 2]
        row = {
            "terms": terms,
            "dfs": dfs,
            "exhaustive_sec": [round(x, 3) for x in ex_times],
            "wand_sec": [round(x, 3) for x in wd_times],
            "exhaustive_p50": round(med(ex_times), 3),
            "wand_p50": round(med(wd_times), 3),
            "speedup": round(med(ex_times) / med(wd_times), 3),
        }
        results["mixes"][name] = row
        print(json.dumps({name: row}), flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("WROTE", OUT, flush=True)


if __name__ == "__main__":
    main()
