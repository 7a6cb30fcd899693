"""Deterministic synthetic Common-Crawl-style corpus (the engine's input shape).

BASELINE.json input_hint: ``(url:string, warc_ts:timestamp, html:binary,
text:string, lang:string)``.  This module synthesizes that table
deterministically (seed=42, no external data) at any small scale for tests
and benchmarks, per FIXTURES.md:

- Zipf-distributed vocabulary (~2k words incl. the 33 reference stop words)
  so StopFilter and head-term skew/salting are exercised.
- Embedded reference-test fixture sentences (tests/test_searching.py:12-27,
  tests/test_results.py:17-24,60-66 of the reference) so golden queries have
  known result shapes.
- Tokens with digits, dots, underscores, ``*``, hyphens, mixed case and
  unicode to exercise the exact token pattern.
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Fixture docs from the reference's own test corpus shapes (text only — these
# are tiny public test strings, embedded so golden queries have known hits).
FIXTURE_DOCS: List[Tuple[str, str]] = [
    # test_searching.make_index (tests/test_searching.py:12-27): key -> name+value
    ("fixture/searching/A", "Yellow brown Blue red green render purple?"),
    ("fixture/searching/B", "Alpha beta Gamma delta epsilon omega."),
    ("fixture/searching/C", "One two Three rendered four five."),
    ("fixture/searching/D", "Quick went Every red town."),
    ("fixture/searching/E", "Yellow uptown Interest rendering outer photo!"),
    # test_results score-order pair (tests/test_results.py:17-24)
    ("fixture/results/little", "Mary had a little white lamb its fleece was white as snow"),
    ("fixture/results/snow", "Snow white lived in the forest with seven dwarfs"),
    # graded-tf set (tests/test_results.py:60-66)
    ("fixture/results/tf5", "alfa alfa alfa alfa alfa"),
    ("fixture/results/tf4", "alfa alfa alfa alfa"),
    ("fixture/results/tf3", "alfa alfa alfa"),
    ("fixture/results/tf2", "alfa alfa"),
    ("fixture/results/tf1", "alfa"),
    ("fixture/results/bravo", "bravo"),
    # unicode / pattern edge cases (exercise [\w\*]+(\.?[\w\*]+)* exactly)
    ("fixture/edge/unicode", "Straße café naïve CafÉ ÜBER über"),
    ("fixture/edge/pattern", "hi there 3.141 big-time under_score x*y a.b.c trailing."),
    ("fixture/edge/stops", "The a an and are as at be by can for from have if in is it"),
]

_BASE_WORDS = """
alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike
november oscar papa quebec romeo sierra tango uniform victor whiskey xray
yankee zulu render rendered rendering town uptown yellow brown blue red green
purple quick went every interest outer photo spark index query search engine
document term posting segment merge score weight field length block codec
reader writer storage schema analyzer token filter stop word corpus crawl web
page html text lang http https static archive record header body title link
image video data table row column key value hash sort shuffle partition join
""".split()

_STOPS = """a an and are as at be by can for from have if in is it may not of
on or tbd that the this to us we when will with yet you your""".split()


def _vocab(n_extra: int = 1600) -> List[str]:
    """Deterministic vocabulary: stops + base words + generated word forms."""
    vocab = list(_STOPS) + list(_BASE_WORDS)
    rng = random.Random(42)
    syll = ["ba", "co", "di", "fu", "ga", "he", "ji", "ko", "lu", "me", "no",
            "pi", "qua", "ru", "se", "ti", "vo", "wa", "xe", "zy"]
    for _ in range(n_extra):
        w = "".join(rng.choice(syll) for _ in range(rng.randint(2, 4)))
        vocab.append(w)
    # a few pattern-edge tokens in the tail
    vocab += ["3.141", "under_score", "x*y", "a.b.c", "v2.0", "café", "über"]
    return vocab


def generate_rows(n_docs: int, seed: int = 42) -> Iterator[tuple]:
    """Yield (url, warc_ts, html, text, lang) rows, deterministic in n/seed.

    Zipf-ish word draw: rank r chosen with p ∝ 1/(r+10) over the vocab, which
    gives a realistic head-heavy term distribution (stop words land in the
    head, exercising skew handling).
    """
    vocab = _vocab()
    nv = len(vocab)
    rng = random.Random(seed)
    base_ts = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
    # precompute cumulative Zipf weights once
    weights = [1.0 / (r + 10.0) for r in range(nv)]

    n_fixture = len(FIXTURE_DOCS)
    for i in range(n_docs):
        if i < n_fixture:
            path, text = FIXTURE_DOCS[i]
            url = f"https://example{i:06d}.test/{path}"
        else:
            url = f"https://example{i:06d}.test/page/{i % 97}"
            ln = rng.randint(8, 220)
            words = rng.choices(vocab, weights=weights, k=ln)
            text = " ".join(words)
        ts = base_ts + _dt.timedelta(seconds=17 * i)
        html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
        lang = "xx" if (i >= n_fixture and i % 53 == 0) else "en"
        yield (url, ts, html, text, lang)


PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def pages_df(spark: SparkSession, n_docs: int, seed: int = 42,
             num_partitions: int | None = None) -> DataFrame:
    """Materialize the synthetic pages table as a DataFrame.

    Rows are generated on the driver for small test scales; for bench scales
    the generator is distributed via a range RDD so generation itself scales.
    """
    if n_docs <= 20000:
        rows = list(generate_rows(n_docs, seed))
        df = spark.createDataFrame(rows, PAGES_SCHEMA)
    else:
        # distributed deterministic generation: each partition re-seeds from
        # (seed, partition) and generates its slice — no driver bottleneck.
        parts = num_partitions or max(8, n_docs // 20000)
        step = (n_docs + parts - 1) // parts

        def gen_slice(split):
            lo = split * step
            hi = min(n_docs, lo + step)
            if lo >= hi:
                return
            # re-run the deterministic stream only for our slice: cheap
            # because generate_rows is O(n) in words drawn; for real scale
            # a counter-based RNG (hash(seed, i)) would be used instead.
            for j, row in enumerate(generate_rows(hi, seed)):
                if j >= lo:
                    yield row

        rdd = spark.sparkContext.parallelize(range(parts), parts).flatMap(gen_slice)
        df = spark.createDataFrame(rdd, PAGES_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def pages_df_dist(spark: SparkSession, n_docs: int, num_partitions: int = 32,
                  seed: int = 42) -> DataFrame:
    """Distributed deterministic generation: partition p re-seeds
    Random((seed, p)) and generates its own slice — O(n/parts) per task, no
    cross-partition stream dependency.  Deterministic for a fixed
    (n_docs, num_partitions, seed); used for bench-scale corpora."""
    import datetime as dt
    import random as _random

    step = (n_docs + num_partitions - 1) // num_partitions
    vocab = _vocab()
    nv = len(vocab)
    weights = [1.0 / (r + 10.0) for r in range(nv)]

    def gen_part(p):
        lo, hi = p * step, min(n_docs, (p + 1) * step)
        rng = _random.Random(seed * 1_000_003 + p)
        base_ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
        for i in range(lo, hi):
            url = f"https://example{i:08d}.test/page/{i % 97}"
            ln = rng.randint(8, 220)
            text = " ".join(rng.choices(vocab, weights=weights, k=ln))
            yield (
                url,
                base_ts + dt.timedelta(seconds=17 * i),
                b"<html><body>" + text.encode() + b"</body></html>",
                text,
                "en",
            )

    rdd = spark.sparkContext.parallelize(range(num_partitions), num_partitions)
    return spark.createDataFrame(rdd.flatMap(gen_part), PAGES_SCHEMA)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents`` parquet to the pages input shape.

    Deterministic: url derives from doc_id; html wraps text; ts from doc_id.
    Used so correctness-gate queries run over driver-provided test data.
    """
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.format_string("https://docs.test/%08d", F.col("doc_id")).alias("url"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double") * 17)).alias("warc_ts"),
        F.concat(
            F.lit(b"<html><body>"),
            F.encode(F.col("text"), "utf-8"),
            F.lit(b"</body></html>"),
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )
