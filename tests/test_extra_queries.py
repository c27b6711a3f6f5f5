"""Semantics tests for the session-3 operators (intervals, filtered KNN,
significant terms). Oracle parity for every row is covered by
test_driver_contract; these pin the operator semantics on hand-built
fixtures where the SQL oracle alone would under-specify them."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.operators import ann
from lucene_solr_spark.plans.extra_queries import minimal_interval_count_col

from pyspark.sql import functions as F


def _brute_minimal_intervals(tokens, a, b, maxgaps):
    """Reference implementation of Intervals.maxgaps(g, ordered(a, b)):
    candidate (i, j) with j = first b after a at i; minimal iff no a'
    strictly inside (i, j); keep gap <= maxgaps. 1-based positions."""
    apos = [i + 1 for i, t in enumerate(tokens) if t == a]
    bpos = [i + 1 for i, t in enumerate(tokens) if t == b]
    n = 0
    for i in apos:
        js = [j for j in bpos if j > i]
        if not js:
            continue
        j = min(js)
        if any(i < a2 < j for a2 in apos):
            continue
        if j - i - 1 <= maxgaps:
            n += 1
    return n


INTERVAL_CASES = [
    ["a", "b"],                           # adjacent -> 1
    ["a", "x", "x", "x", "x", "b"],       # gap 4 > maxgaps 3 -> 0
    ["a", "a", "b"],                      # (a@2,b@3) minimal; (a@1,b@3) contains a@2 -> 1
    ["a", "b", "a", "b"],                 # two disjoint minimal intervals
    ["b", "a"],                           # unordered -> 0
    ["a", "x", "b", "x", "a", "x", "x", "b"],
    ["a", "a", "x", "b", "b", "a", "b"],
]


def test_minimal_intervals_match_reference(spark):
    rows = [(i, toks) for i, toks in enumerate(INTERVAL_CASES)]
    df = spark.createDataFrame(rows, "doc_id: long, tokens: array<string>")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id",
            minimal_interval_count_col(F.col("tokens"), "a", "b", 3).alias("n"),
        ).collect()
    }
    for i, toks in enumerate(INTERVAL_CASES):
        assert got[i] == _brute_minimal_intervals(toks, "a", "b", 3), (i, toks)


def test_minimal_intervals_random_vs_reference(spark):
    rng = np.random.default_rng(7)
    cases = [
        [str(x) for x in rng.choice(["a", "b", "x", "y"], size=rng.integers(1, 30))]
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id: long, tokens: array<string>"
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id",
            minimal_interval_count_col(F.col("tokens"), "a", "b", 2).alias("n"),
        ).collect()
    }
    for i, toks in enumerate(cases):
        assert got[i] == _brute_minimal_intervals(toks, "a", "b", 2), (i, toks)


def test_filtered_knn_is_exact_over_filtered_set(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probe = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    got = ann.cosine_topk(emb.filter(F.col("label").isin(1, 2)), probe, k=5).collect()
    # numpy reference over the filtered subset
    rows = emb.filter(F.col("label").isin(1, 2)).collect()
    p = np.array(probe)
    sims = sorted(
        (
            (
                round(
                    float(
                        np.dot(v, p) / (np.linalg.norm(v) * np.linalg.norm(p))
                    ),
                    6,
                ),
                r["vec_id"],
            )
            for r in rows
            for v in [np.array(r["embedding"], dtype=np.float64)]
        ),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r["vec_id"]) for r in got] == [vid for _, vid in sims]
    # every hit satisfies the filter (pre-filter, not post-filter)
    labels = {r["vec_id"]: r["label"] for r in rows}
    assert all(labels[r["vec_id"]] in (1, 2) for r in got)


def test_significant_terms_score_monotone_in_rarity(spark):
    from lucene_solr_spark.plans.extra_queries import significant_terms

    out = significant_terms(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    # same fg_df -> rarer background term must not score lower
    by_fg = {}
    for r in out:
        by_fg.setdefault(r["fg_df"], []).append((r["bg_df"], r["score"]))
    for pairs in by_fg.values():
        pairs.sort()
        for (bg1, s1), (bg2, s2) in zip(pairs, pairs[1:]):
            if bg1 < bg2:
                assert s1 >= s2


def test_ivfpq_trained_recall_and_compression(spark, tmp_path):
    """IVF-PQ with TRAINED codebooks (sampled k-means per subspace):
    ADC-ranked + exact-reranked top-k must recover most of the brute-force
    top-k (recall gate), candidate scan must shrink, and codes must be a
    fraction of the vector bytes."""
    from lucene_solr_spark.operators.ann import (
        cosine_topk,
        ivfpq_index,
        ivfpq_topk,
        pq_encode,
        train_centroids,
        train_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    probe = [float(x) for x in emb.filter("vec_id = 3").collect()[0]["embedding"]]

    cents = train_centroids(emb, n_cells=4, iters=5)
    books = train_pq_codebooks(emb, m=8, ksub=16, iters=5)
    path = str(tmp_path / "ivfpq")
    ivfpq_index(emb, cents, books, path)

    truth = [r["vec_id"] for r in cosine_topk(emb, probe, k=10).collect()]
    got = [
        r["vec_id"]
        for r in ivfpq_topk(
            spark, path, cents, books, probe, k=10, nprobe=2, rerank=50
        ).collect()
    ]
    recall = len(set(truth) & set(got)) / 10
    assert recall >= 0.6, (recall, truth, got)

    # candidate shrink: nprobe=2 of 4 cells reads < the full table
    scanned = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(ann.nearest_cells(probe, cents, 2)))
        .count()
    )
    assert scanned < n

    # compression: m=8 int codes vs 64 float32 lanes
    code = pq_encode(emb, books).select("code").first()["code"]
    assert len(code) == 8 and all(0 <= c < 16 for c in code)

    # nprobe = n_cells + rerank >= n degenerates to exact brute force
    full = [
        r["vec_id"]
        for r in ivfpq_topk(
            spark, path, cents, books, probe, k=10, nprobe=4, rerank=n
        ).collect()
    ]
    assert full == truth
