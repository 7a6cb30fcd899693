"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame transformations (JVM-side, no Python UDFs)
designed for 100-TB scale:

- exact dedup: hash-groupBy on md5(text) — one shuffle, partial-agg friendly
- MinHash + LSH: shingle -> md5-minhash signature -> band-bucket self-join.
  Hashing uses md5 (portable: identical in any engine) and min() over hex
  strings, so signatures are reproducible everywhere.  The candidate-pair
  join is on (band_id, band_hash) — docs only meet if a band collides, which
  is the standard sub-quadratic LSH path.
- SimHash: 32-bit signature from per-token md5 nibbles, fully relational
  (explode tokens x bit positions -> weighted sum -> sign), no UDF.
- n-gram Jaccard: character-trigram set similarity (one-vs-all form here;
  the all-pairs form goes through LSH candidates first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[a-z0-9_*]+(\\.?[a-z0-9_*]+)*"


def _tokens(text_col):
    """Raw lowercase tokens (no stop removal — dedup wants full text)."""
    return F.expr(
        f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    )


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     prefix: int = 0) -> DataFrame:
    """Groups of byte-identical texts: (dup_key, n_docs, keep_doc).

    ``prefix > 0`` hashes only the first `prefix` characters — the
    boilerplate-prefix exact-dedup variant web pipelines run alongside
    full-text dedup (shared headers/templates collide on the prefix
    while full hashes differ).  One hash + one groupBy either way: the
    map-side partial agg means the 100-TB scan ships only (hash,
    count, min) partials into the shuffle."""
    key = F.col(text_col) if prefix <= 0 else F.substring(text_col, 1, prefix)
    return (
        docs.select(F.md5(key).alias("dup_key"), F.col(id_col))
        .groupBy("dup_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_doc"),
        )
        .where(F.col("n_docs") > 1)
    )


def with_shingles(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, shingles array<string>) — word k-shingles joined by single space."""
    toks = _tokens(text_col)
    # floor the end at 1 (Spark sequence(1,0) would run DESCENDING) — docs
    # shorter than k words yield one short shingle, same as the SQL oracle's
    # list_slice behavior
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return docs.select(F.col(id_col), F.array_distinct(sh).alias("shingles"))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 8) -> DataFrame:
    """Benchmark decontamination (the published GPT-3/PaLM recipe: drop
    training docs sharing any word n-gram with an eval benchmark):
    returns (id, n_hits, contaminated) per TRAINING doc, where n_hits
    counts the distinct benchmark n-grams the doc contains.

    Plan shape: both sides shingle to distinct n-grams, the benchmark
    side deduplicates globally, and contamination is ONE equi-join on
    the shingle hash — benchmark sets are small (thousands of docs), so
    AQE broadcasts them and the 100-TB side streams map-only."""
    d = with_shingles(docs, id_col, text_col, k=n).select(
        F.col(id_col), F.explode("shingles").alias("sh")
    )
    b = (
        with_shingles(benchmark, id_col, text_col, k=n)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    hits = d.join(b, "sh").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 3,
                       n_hashes: int = 16) -> DataFrame:
    """(id, sig array<string>) — sig[s] = min over shingles of
    md5('<s>:' + shingle).  Hex-string min == numeric min of the 128-bit
    value, and is engine-portable."""
    sh = with_shingles(docs, id_col, text_col, k)

    # NB: single-parameter lambdas only — pyspark treats a second (default)
    # parameter as the array-index variable, silently changing semantics
    def _seeded_md5(seed: int):
        prefix = F.lit(f"{seed}:")

        def fn(x):
            return F.md5(F.concat(prefix, x))

        return fn

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), _seeded_md5(s)))
            for s in range(n_hashes)
        ]
    )
    return sh.select(F.col(id_col), sig.alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3, n_hashes: int = 16,
                      bands: int = 4, threshold: float = 0.5,
                      max_bucket: int = 0) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH, verified by exact
    shingle Jaccard: (doc_a, doc_b, jaccard).

    rows-per-band = n_hashes/bands; a pair collides if ANY band's hashes are
    all equal.  Verification joins shingle sets only for colliding pairs, so
    the quadratic blow-up is bounded by bucket sizes.

    ``max_bucket`` (0 = uncapped) drops band buckets with more members than
    the cap BEFORE the self-join — the web-scale guard against quadratic
    blow-up on boilerplate-heavy buckets (a 10^6-doc bucket alone is 10^12
    candidate pairs).  Documented recall trade: docs colliding ONLY inside
    a mega-bucket are missed; near-identical boilerplate families that
    large are better handled by exact_dup_groups first.  Empty-text docs
    are always dropped (their empty signature forms one giant bucket).
    """
    r = n_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, k, n_hashes)
    band_rows = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.array_join(F.slice(F.col("sig"), b * r + 1, r), "|")
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_hash")

    if max_bucket > 0:
        # one map-side-combinable count per bucket; oversized buckets are
        # dropped relationally (anti-join keeps the pipeline shuffle-only)
        big = (
            band_rows.groupBy("band_id", "band_hash")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket)
            .select("band_id", "band_hash")
        )
        band_rows = band_rows.join(big, ["band_id", "band_hash"], "left_anti")

    # self-join with explicitly renamed sides (alias-based resolution on a
    # shared-lineage frame silently mis-binds columns)
    a = band_rows.select(
        F.col(id_col).alias("doc_a"),
        F.col("band_id").alias("band_id_a"),
        F.col("band_hash").alias("band_hash_a"),
    )
    b = band_rows.select(
        F.col(id_col).alias("doc_b"),
        F.col("band_id").alias("band_id_b"),
        F.col("band_hash").alias("band_hash_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("band_id_a") == F.col("band_id_b"))
            & (F.col("band_hash_a") == F.col("band_hash_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )

    sh = with_shingles(docs, id_col, text_col, k)
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32) -> DataFrame:
    """(id, simhash bigint) — 32-bit SimHash, fully relational.

    Per distinct token t with frequency w: token hash = first 8 hex chars of
    md5(t) -> 32 bits (4 per hex nibble).  bit_b contributes +w if set else
    -w; final bit b of the signature is 1 iff the sum > 0.
    """
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    # nibble value of hex char c: digit -> ascii-48, a-f -> ascii-87
    tf = tf.withColumn("h8", F.substring(F.md5("token"), 1, 8))
    bit_ids = F.sequence(F.lit(0), F.lit(bits - 1))
    exploded = tf.select(
        id_col, "w", "h8", F.explode(bit_ids).alias("bit")
    )
    # shiftright/shiftleft need expr form — the pyspark wrappers only accept
    # literal shift amounts
    nib_val = F.expr(
        "CASE WHEN ascii(substring(h8, CAST(bit / 4 AS INT) + 1, 1)) >= 97 "
        "THEN ascii(substring(h8, CAST(bit / 4 AS INT) + 1, 1)) - 87 "
        "ELSE ascii(substring(h8, CAST(bit / 4 AS INT) + 1, 1)) - 48 END"
    )
    exploded = exploded.withColumn("nv", nib_val)
    bit_set = F.expr("(shiftright(nv, 3 - CAST(bit % 4 AS INT)) % 2)")
    contrib = F.when(bit_set == 1, F.col("w")).otherwise(-F.col("w"))
    sums = exploded.select(id_col, "bit", contrib.alias("c")).groupBy(
        id_col, "bit"
    ).agg(F.sum("c").alias("s"))
    sig = sums.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("s") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
    return sig


def ngram_jaccard_vs_doc(docs: DataFrame, query_doc: int,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 3, k: int = 10) -> DataFrame:
    """Character-n-gram Jaccard of every doc vs `query_doc`, top-k:
    (doc_id, jaccard).  One-vs-all baseline; the all-pairs form routes
    through minhash_lsh_pairs candidates."""
    # substring with dynamic start needs expr form (F.substring wants literals)
    grams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(length(lower({text_col})) - {n - 1}, 1)),"
        f" i -> substring(lower({text_col}), i, {n})))"
    )
    g = docs.select(F.col(id_col), grams.alias("grams"))
    q = g.where(F.col(id_col) == query_doc).select(
        F.col("grams").alias("q_grams")
    )
    return (
        g.where(F.col(id_col) != query_doc)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(
                F.size(F.array_intersect("grams", "q_grams"))
                / F.size(F.array_union("grams", "q_grams")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), F.col(id_col).asc())
        .limit(k)
    )


SMALL_PAIRS_DRIVER_LIMIT = 200_000  # below this, driver union-find is faster


def dedup_clusters(pairs_df: DataFrame, docs: DataFrame,
                   id_col: str = "doc_id",
                   driver_limit: int = SMALL_PAIRS_DRIVER_LIMIT) -> DataFrame:
    """Resolve near-dup pairs into clusters and pick canonical survivors:
    (doc_id, keep_doc) for every doc in a cluster, keep_doc = min id.

    At web scale, near-dup pair sets are billions of rows (Common-Crawl
    near-dup rates are tens of percent), so the transitive closure runs as
    DISTRIBUTED min-label propagation: each node starts labeled with the
    smallest direct neighbor (or itself), then labels propagate across edges
    (join pairs↔labels, take min) until a fixpoint.  Rounds needed = graph
    diameter — near-dup clusters are dense (most pairs connect directly to
    the cluster minimum via LSH), so this converges in a handful of rounds.
    Each round is one equi-join + one map-side-combinable min-aggregation.

    A small pair set (< `driver_limit`) short-circuits to driver union-find
    — one collect of an already-small frame, no iterative jobs.
    """
    spark = pairs_df.sparkSession
    pairs = pairs_df.select(
        F.col("doc_a").cast("long"), F.col("doc_b").cast("long")
    )
    n_pairs = pairs.limit(driver_limit + 1).count()
    if n_pairs == 0:
        return spark.createDataFrame([], f"{id_col} long, keep_doc long")
    if n_pairs <= driver_limit:
        return _driver_union_find(spark, pairs.collect(), id_col)

    # symmetric edge list (each edge both directions) so one join direction
    # suffices per round
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).persist()
    # label(x) = min(x, min direct neighbor) — one aggregation seed
    labels = (
        edges.groupBy("doc_a")
        .agg(F.least(F.min("doc_b"), F.col("doc_a")).alias("label"))
        .select(F.col("doc_a").alias("node"), "label")
        .persist()
    )
    while True:
        # candidate label for x: min over neighbors y of label(y)
        neigh = (
            edges.join(
                labels.select(
                    F.col("node").alias("doc_b"),
                    F.col("label").alias("nlabel"),
                ),
                "doc_b",
            )
            .groupBy("doc_a")
            .agg(F.min("nlabel").alias("nmin"))
            .select(F.col("doc_a").alias("node"), "nmin")
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.withColumnRenamed("label", "old"), "node")
            .where(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("keep_doc")
    )


def _driver_union_find(spark, rows, id_col: str) -> DataFrame:
    """Small-N fast path: classic union-find over collected pairs."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in rows:
        a, b = find(r["doc_a"]), find(r["doc_b"])
        if a != b:
            if b < a:
                a, b = b, a
            parent[b] = a
    nodes = set(parent) | {r["doc_a"] for r in rows} | {r["doc_b"] for r in rows}
    mapping = sorted({(x, find(x)) for x in nodes})
    if not mapping:
        return spark.createDataFrame([], f"{id_col} long, keep_doc long")
    return spark.createDataFrame(
        [(int(d), int(k)) for d, k in mapping], f"{id_col} long, keep_doc long"
    )


def dedup_corpus(docs: DataFrame, pairs_df: DataFrame,
                 id_col: str = "doc_id") -> DataFrame:
    """Drop every near-duplicate except each cluster's canonical doc —
    the end-to-end training-data dedup operation."""
    clusters = dedup_clusters(pairs_df, docs, id_col)
    drop = clusters.where(F.col(id_col) != F.col("keep_doc")).select(id_col)
    # no broadcast hint: at web scale the drop set is a large fraction of the
    # corpus; AQE picks broadcast when it is actually small
    return docs.join(drop, id_col, "left_anti")
