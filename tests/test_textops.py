"""Behavioral tests for training-pipeline text ops on constructed data
(the driver testdata has no exact duplicates, so build some)."""

import pytest
from pyspark.sql import functions as F

from whoosh_reloaded_spark.textops import (
    cosine_topk,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
)
from whoosh_reloaded_spark.textops.similarity import cosine_topk_lsh


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
        (3, "completely different text about spark query engines and shuffles"),
        (4, "another unrelated document mentioning joins aggregates and windows"),
        (5, ""),  # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(dup_docs):
    groups = exact_dup_groups(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2
    assert groups[0]["keep_doc"] == 0


def test_minhash_identical_signatures(dup_docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(dup_docs).collect()}
    assert sigs[0] == sigs[1]          # identical docs -> identical signature
    assert sigs[0] != sigs[3]
    # near-dup shares most minhashes
    shared = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    assert shared >= 8, shared


def test_minhash_lsh_finds_near_dups(dup_docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in minhash_lsh_pairs(dup_docs, threshold=0.2).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught by a band
    assert all(a < 3 and b < 3 for a, b in pairs)  # unrelated docs not paired


def test_simhash_near_dup_distance(dup_docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(dup_docs).collect()}
    assert sh[0] == sh[1]
    ham = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham < ham_far  # near dup closer in hamming space than unrelated


def test_cosine_topk_and_lsh(spark):
    import math

    rows = []
    for i in range(50):
        # deterministic vectors on a ring; vec 0's nearest is vec 1
        ang = i * 0.1
        rows.append((i, [math.cos(ang), math.sin(ang), 0.1, -0.2]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[0][1]
    top = cosine_topk(emb, q, k=3, exclude_id=0).collect()
    assert top[0]["vec_id"] == 1
    assert top[0]["cosine"] > top[-1]["cosine"]
    # LSH variant returns a subset of the exact ranking, same scoring
    lsh = cosine_topk_lsh(emb, q, k=3, n_planes=3, exclude_id=0).collect()
    exact_scores = {r["vec_id"]: r["cosine"]
                    for r in cosine_topk(emb, q, k=50, exclude_id=0).collect()}
    for r in lsh:
        assert r["cosine"] == exact_scores[r["vec_id"]]


def test_dedup_clusters_and_corpus(spark, dup_docs):
    from whoosh_reloaded_spark.textops.dedup import dedup_clusters, dedup_corpus

    pairs = minhash_lsh_pairs(dup_docs, threshold=0.2)
    clusters = {r["doc_id"]: r["keep_doc"] for r in
                dedup_clusters(pairs, dup_docs).collect()}
    # docs 0,1,2 form one cluster with canonical 0
    assert clusters[0] == 0 and clusters[1] == 0 and clusters[2] == 0
    kept = {r["doc_id"] for r in dedup_corpus(dup_docs, pairs).collect()}
    assert kept == {0, 3, 4, 5}


def test_dedup_clusters_distributed_path(spark):
    """driver_limit=0 forces the min-label-propagation path; must equal the
    union-find result on a multi-hop chain graph (worst case: cluster min
    only reachable transitively)."""
    from whoosh_reloaded_spark.textops.dedup import dedup_clusters

    # chain 10-11-12-13-14 (diameter 4), triangle 20-21-22, pair 30-31
    edges = [(11, 10), (12, 11), (13, 12), (14, 13),
             (20, 21), (21, 22), (20, 22), (30, 31)]
    pairs = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "doc_a long, doc_b long, jaccard double"
    )
    got = {
        r["doc_id"]: r["keep_doc"]
        for r in dedup_clusters(pairs, None, driver_limit=0).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def test_minhash_bucket_cap(spark):
    """max_bucket drops mega-buckets before the self-join: identical docs in
    an oversized bucket produce no pairs; normal-size buckets unaffected."""
    from whoosh_reloaded_spark.textops.dedup import minhash_lsh_pairs

    boiler = [(i, "the same boilerplate text repeated") for i in range(10)]
    pair = [(100, "unique snowflake document alpha beta"),
            (101, "unique snowflake document alpha beta")]
    docs = spark.createDataFrame(boiler + pair, "doc_id long, text string")

    capped = minhash_lsh_pairs(docs, threshold=0.2, max_bucket=5).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert (100, 101) in got
    assert all(a >= 100 for a, _ in got)  # boilerplate bucket (size 10) dropped

    uncapped = minhash_lsh_pairs(docs, threshold=0.2).collect()
    assert len(uncapped) > len(capped)


def test_ann_saved_index_partition_pruning(spark, tmp_path):
    """save_ann_index materializes the bucket-partitioned layout; a probe
    reads ONLY matching bucket directories and its results are a subset of
    the exact ranking with identical scores."""
    import math

    from whoosh_reloaded_spark.textops.similarity import (
        ann_query,
        cosine_topk,
        save_ann_index,
    )

    rows = []
    for i in range(400):
        ang = i * 0.05
        rows.append((i, [math.cos(ang), math.sin(ang), 0.3, -0.1]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ann")
    meta = save_ann_index(emb, path, n_planes=4)
    assert meta["dims"] == 4

    q = rows[7][1]
    probe = ann_query(spark, path, q, k=5, exclude_id=7)
    # partition pruning: the bucket predicate must be a PartitionFilter on
    # the scan (pruned at the source, not post-read)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*bucket[^\]]*)\]", plan)
    assert m, plan[:800]

    exact = {r["vec_id"]: r["cosine"]
             for r in cosine_topk(emb, q, k=400, exclude_id=7).collect()}
    got = probe.collect()
    assert len(got) > 0
    for r in got:
        assert r["cosine"] == exact[r["vec_id"]]
    # multiprobe widens the scan (more buckets -> at least as many rows
    # pass the bucket filter)
    wide = ann_query(spark, path, q, k=400, n_probe_bits=1, exclude_id=7)
    narrow = ann_query(spark, path, q, k=400, exclude_id=7)
    assert wide.count() >= narrow.count()
