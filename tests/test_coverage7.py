"""Semantics pins for the coverage7 rows on tiny hand-computed corpora.

The driver-contract mirror proves Spark==DuckDB on the testdata; these
tests pin the SEMANTICS against hand-derived expectations — the wildcard
slot matching multiple distinct terms in one doc, ancestor-chain facet
counts, the external-boost ranking flip, scoreNodes tf-idf, and the
stopword-gram vocabulary.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

import lucene_solr_spark.plans.coverage7_queries as c7
from lucene_solr_spark.plans.driver_queries import _TOK_CACHE


@pytest.fixture()
def tiny_sf(spark, tmp_path):
    """3 docs where 's*'-prefixed terms (sort, spark, slow, stream) precede
    'order' at hand-countable positions."""
    rows = [
        (0, "sort order spark order a the table", "en", "s0", 33),
        (1, "slow order the a stream order order", "en", "s0", 35),
        (2, "merge the a a window", "de", "s1", 21),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    yield d
    _TOK_CACHE.pop(d, None)


def test_complex_phrase_counts_every_wildcard_adjacency(spark, tiny_sf):
    out = [tuple(r) for r in c7.complex_phrase_wildcard(spark, tiny_sf).collect()]
    # doc0: sort+order, spark+order -> 2; doc1: slow+order, stream+order -> 2
    # (order+order in doc1 does NOT match: 'order' lacks the 's' prefix)
    assert out == [(0, 2), (1, 2)]


def test_path_hierarchy_emits_all_ancestors(spark, tiny_sf):
    out = [tuple(r) for r in c7.path_hierarchy_facet(spark, tiny_sf).collect()]
    assert out == [
        ("s0", 2),
        ("s0/en", 2),
        ("s0/en/b0", 1),
        ("s0/en/b1", 1),
        ("s1", 1),
        ("s1/de", 1),
        ("s1/de/b2", 1),
    ]


def test_external_boost_reranks_across_langs(spark, tiny_sf):
    out = [tuple(r) for r in c7.external_file_boost(spark, tiny_sf).collect()]
    # en boost 1.5: doc1 35*1.5=52.5 > doc0 33*1.5=49.5; de 1.25: 21*1.25=26.25
    assert out == [(1, 52.5), (0, 49.5), (2, 26.25)]


def test_common_grams_vocabulary(spark, tiny_sf):
    out = [tuple(r) for r in c7.common_grams_tokens(spark, tiny_sf).collect()]
    assert out[0] == ("the_a", 2)
    assert set(out[1:]) == {
        ("a_a", 1),
        ("a_stream", 1),
        ("a_the", 1),
        ("a_window", 1),
        ("merge_the", 1),
        ("order_a", 1),
        ("order_the", 1),
        ("the_table", 1),
    }


def test_sweetspot_plateau_and_decay(spark, tmp_path):
    # doc0 len 5 (inside [3,10] -> norm 1); doc1 len 2 (below min ->
    # norm 1/sqrt(0.5*(|2-3|+|2-10|-7)+1) = 1/sqrt(2)); 'order' in both.
    rows = [
        (0, "order a b c d", "en", "s0", 13),
        (1, "order order", "en", "s0", 11),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    try:
        out = {r["doc_id"]: r["score"] for r in c7.sim_sweetspot_topk(spark, d).collect()}
    finally:
        _TOK_CACHE.pop(d, None)
    idf2 = (1 + math.log((2 + 1) / (2 + 1))) ** 2  # dft=2, n=2 -> idf=1
    assert out[0] == round(math.sqrt(1) * idf2 / 1.0, 6)
    assert out[1] == round(math.sqrt(2) * idf2 / math.sqrt(2), 6)


def test_diversified_caps_hits_per_key(spark, tmp_path):
    rows = [
        (0, "x", "en", "s0", 50),
        (1, "x", "en", "s0", 40),
        (2, "x", "en", "s0", 30),  # third-best en: evicted by the cap
        (3, "x", "de", "s0", 10),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = [tuple(r) for r in c7.diversified_topk(spark, d).collect()]
    assert out == [(0, "en", 50), (1, "en", 40), (3, "de", 10)]


def test_subquery_transformer_related_sets(spark, tiny_sf):
    out = [tuple(r) for r in c7.subquery_transformer(spark, tiny_sf).collect()]
    # s0 related = doc1(35),doc0(33) in rank order; en parents = doc1, doc0
    assert out == [(1, "s0", 35, "1,0"), (0, "s0", 33, "1,0")]


def test_facet_range_other_buckets(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame(
        [(5.0,), (25.0,), (45.0,), (85.0,)], "value double"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    out = [tuple(r) for r in c7.facet_range_other(spark, d).collect()]
    assert out == [
        ("after", 1),
        ("before", 1),
        ("between", 2),
        ("bucket_20", 1),
        ("bucket_40", 1),
    ]


def test_mlt_interesting_terms_gates_and_ranking(spark, tmp_path):
    rows = [
        (0, "spark spark join", "en", "s0", 16),
        (1, "spark merge", "en", "s0", 11),
        (2, "join merge", "en", "s0", 10),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    try:
        out = [tuple(r) for r in c7.mlt_interesting_terms(spark, d).collect()]
    finally:
        _TOK_CACHE.pop(d, None)
    idf = math.log(3 / 2)  # df=2 for both seed terms, N=3
    assert out == [
        ("spark", np.float32(2 * idf)),
        ("join", np.float32(1 * idf)),
    ]


def test_group_percentile_interpolates_per_bucket(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], "event_type string, value double"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    out = [tuple(r) for r in c7.group_percentile_agg(spark, d).collect()]
    assert out == [("a", 2.0, 2), ("b", 5.0, 1)]


def test_text_tagger_longest_match_suppression(spark, tmp_path):
    rows = [
        # 'data' at pos 2 and 6 are tails of 'big data' (suppressed);
        # pos 4 follows 'spark' (kept)
        (0, "big data spark data big data", "en", "s0", 28),
        (1, "data table", "en", "s0", 10),  # doc-initial 'data' is kept
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    try:
        out = [tuple(r) for r in c7.text_tagger(spark, d).collect()]
    finally:
        _TOK_CACHE.pop(d, None)
    assert out == [("big data", 2), ("data", 2), ("spark", 1)]


def test_mg_merge_prunes_and_lower_bounds():
    from lucene_solr_spark.operators.sketches import _mg_merge
    import pandas as pd

    c = _mg_merge({}, pd.Series({"x": 10, "y": 3, "z": 2, "w": 1}), k=2)
    # (k+1)-th largest = 2 -> subtract 2 everywhere, drop <= 0
    assert c == {"x": 8, "y": 1}
    # merging more mass into a survivor keeps accumulating
    c = _mg_merge(c, pd.Series({"x": 5}), k=2)
    assert c == {"x": 13, "y": 1}


def test_misra_gries_guarantees_on_skewed_partitions(spark):
    from lucene_solr_spark.operators.sketches import misra_gries_candidates

    rows = [("x",)] * 60 + [(f"t{i}",) for i in range(30)] + [("y",)] * 12
    df = spark.createDataFrame(rows, "term string").repartition(4)
    k = 5
    sketch = {r["term"]: r["bound"] for r in misra_gries_candidates(df, "term", k).collect()}
    n = len(rows)
    exact = {"x": 60, "y": 12, **{f"t{i}": 1 for i in range(30)}}
    thr = n / (k + 1)  # 17.0
    for t, cnt in exact.items():
        if cnt > thr:
            assert t in sketch, f"heavy hitter {t} missing"
        if t in sketch:
            assert sketch[t] <= cnt
            assert sketch[t] >= cnt - thr


def test_heavy_hitters_row_detects_skew(spark, tmp_path):
    # pure-letter filler terms: the tokenizer splits letter/digit runs
    filler = [chr(ord("a") + i) + chr(ord("a") + i) for i in range(20)]  # aa..tt
    text0 = " ".join(["x"] * 40 + filler)
    d = str(tmp_path)
    spark.createDataFrame(
        [(0, text0, "en", "s0", len(text0))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    try:
        (row,) = c7.heavy_hitters_sketch(spark, d).collect()
    finally:
        _TOK_CACHE.pop(d, None)
    # N=60, k=8 -> thr=6.67: only 'x' (40) is heavy
    assert row["n_heavy"] == 1
    assert row["covers_heavy"] is True and row["bounds_valid"] is True
    assert (row["top_term"], row["top_cnt"]) == ("x", 40)


def test_quantile_sketch_exact_values_and_budget(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "value double"
    ).repartition(4).write.parquet(f"{d}/events.parquet")
    out = [tuple(r) for r in c7.quantile_sketch_agg(spark, d).collect()]
    # interpolated exact: p50 = 50.5, p95 = 95.05; budget = N/acc = 1 rank
    assert out == [(50.5, 95.05, True)]


@pytest.fixture()
def tiny_graph_sf(spark, tmp_path):
    """Minimal TPC-H slice: GERMANY customer c1 owns o10,o11; FRANCE c2
    owns o20; suppliers s1..s3 appear on hand-counted lineitems."""
    d = str(tmp_path)
    spark.createDataFrame(
        [(0, "GERMANY"), (1, "FRANCE")], "n_nationkey long, n_name string"
    ).coalesce(1).write.parquet(f"{d}/nation.parquet")
    spark.createDataFrame(
        [(1, 0), (2, 1)], "c_custkey long, c_nationkey long"
    ).coalesce(1).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(10, 1), (11, 1), (20, 2)], "o_orderkey long, o_custkey long"
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (20, 2), (20, 3)],
        "l_orderkey long, l_suppkey long",
    ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
    return d


def test_score_nodes_tfidf(spark, tiny_graph_sf):
    out = [tuple(r) for r in c7.graph_score_nodes(spark, tiny_graph_sf).collect()]
    # GERMANY -> c1 -> o10,o11 -> hits: s1 x2, s2 x1; df: s1=2, s2=2; N=5
    idf = math.log(1 + 5 / 2)
    assert out == [
        (1, 2, np.float32(2 * idf)),
        (2, 1, np.float32(1 * idf)),
    ]
