#!/usr/bin/env python
"""Block-max WAND crossover probe at 10^8-posting terms (round-4 VERDICT
task 8): BASELINE §3.4 measured WAND 0.27-0.92x the exhaustive plan at
10M docs with speedup rising monotonically with df, hypothesizing a
crossover for posting lists in the 10^8 range.  This settles it with data.

A real text corpus with 10^8-df terms would need ~10^9 docs of analysis;
the probe instead SYNTHESIZES the posting tables directly (the physical
shape is what WAND sees — term, docid, weight, len_byte, block_no) and
runs the standard save_index pipeline so blocks/stats/layout are exactly
production: two hot terms with df = 1.0e8 over N = 1.5e8 docs plus a mid
term, deterministic hash-derived tf/lengths.  Also a stress test of the
salted two-phase block ranking (with_block_no) at 10^8-posting terms.

Prints one JSON line per mix; writes wand_bench_1e8.json.
Usage: python scripts/bench_wand_1e8.py  [env SPARK_GRAFT_CPUS]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 150_000_000
IX_DIR = "/tmp/wand_ix_synth_1e8"
OUT = "/root/repo/wand_bench_1e8.json"
REPS = 3


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from whoosh_reloaded_spark.index.build import InvertedIndex, load_index, save_index
    from whoosh_reloaded_spark.lengths import length_to_byte_expr
    from whoosh_reloaded_spark.query import Or, Searcher, Term
    from whoosh_reloaded_spark.wand import wand_topk

    build_sec = None
    if not os.path.exists(os.path.join(IX_DIR, "stats.json")):
        t0 = time.perf_counter()
        base = spark.range(0, N_DOCS, 1, 256).select(
            F.col("id").alias("docid")
        )
        length = (F.lit(60) + F.pmod(F.xxhash64("docid"), F.lit(120))).cast(
            "int"
        )
        docs = base.select(
            "docid",
            F.concat(F.lit("d"), F.col("docid")).alias("uid"),
            length.alias("length"),
            length_to_byte_expr(length).cast("int").alias("len_byte"),
        )

        def term_postings(term, keep_cond):
            tf = (
                F.lit(1) + F.pmod(F.xxhash64("docid", F.lit(term)), F.lit(7))
            ).cast("int")
            return docs.where(keep_cond).select(
                F.lit("text").alias("field"),
                F.lit(term).alias("term"),
                "docid",
                tf.cast("double").alias("weight"),
                tf.alias("tf"),
                "length",
                "len_byte",
            )

        postings = (
            # two 1.0e8-df hot terms (2/3 density over disjoint residues)
            term_postings("h0", F.pmod(F.col("docid"), F.lit(3)) != 0)
            .unionByName(
                term_postings("h1", F.pmod(F.col("docid"), F.lit(3)) != 1)
            )
            # a 150k-df mid term for the mixed case
            .unionByName(
                term_postings("m0", F.pmod(F.col("docid"), F.lit(1000)) == 0)
            )
        )
        ix = InvertedIndex(
            docmeta=docs.select("docid", "uid", "length", "len_byte"),
            postings=postings,
            term_stats=None,
            stats=None,
            uid_col="uid",
        )
        save_index(ix, IX_DIR, term_partitions=64)
        build_sec = round(time.perf_counter() - t0, 1)
        print(json.dumps({"built": N_DOCS, "build_sec": build_sec}),
              flush=True)

    ix = load_index(spark, IX_DIR)
    s = Searcher(ix)

    mixes = {"hot2_1e8": ["h0", "h1"], "hot_mid": ["h0", "m0"]}
    results = {
        "n_docs": N_DOCS, "build_sec": build_sec,
        "dfs": {
            r["term"]: int(r["df"])
            for r in ix.term_stats.select("term", "df").collect()
        },
        "loadavg": loadavg(),
        "mixes": {},
    }
    for name, terms in mixes.items():
        s._lookup_stats(terms)
        ex_times, wd_times = [], []
        for _ in range(REPS):
            t0 = time.perf_counter()
            ex = s._eval(Or(tuple(Term(t) for t in terms)))
            ex_rows = [
                (r["docid"], round(r["score"], 9))
                for r in ex.orderBy(ex["score"].desc(), "docid")
                .limit(10).collect()
            ]
            ex_times.append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            wd = wand_topk(s, terms, k=10)
            wd_rows = [
                (r["docid"], round(r["score"], 9))
                for r in wd.orderBy(wd["score"].desc(), "docid")
                .limit(10).collect()
            ]
            wd_times.append(time.perf_counter() - t0)
            assert wd_rows == ex_rows, (name, wd_rows[:3], ex_rows[:3])

        med = lambda xs: sorted(xs)[len(xs) // 2]
        row = {
            "terms": terms,
            "exhaustive_sec": [round(x, 3) for x in ex_times],
            "wand_sec": [round(x, 3) for x in wd_times],
            "exhaustive_p50": round(med(ex_times), 3),
            "wand_p50": round(med(wd_times), 3),
            "speedup": round(med(ex_times) / med(wd_times), 3),
        }
        results["mixes"][name] = row
        print(json.dumps({name: row}), flush=True)

    results["loadavg_after"] = loadavg()
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("WROTE", OUT, flush=True)


if __name__ == "__main__":
    main()
