"""Semantic pins for the coverage8 batch (cross-engine parity is covered by
the driver-contract mirror; these pin semantics that parity alone wouldn't
catch): per-doc covering thresholds, payload-check recompute, NB score-table
shape, TTL/tolerant conservation, and the time-routed alias partition-
pruning plan guard."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

from lucene_solr_spark.functions.analysis import tokenize_text

from .conftest import SF_DIR

Q = entry_mod.queries()


def test_covering_query_per_doc_threshold(spark):
    rows = Q["covering_query"](spark, SF_DIR).collect()
    assert rows, "covering query should match at sf0.001"
    for r in rows:
        assert r.min_match == 1 + r.doc_id % 3
        assert r.n_matched >= r.min_match


def test_payload_check_recompute(spark):
    rows = {r.doc_id: r.freq for r in Q["payload_check_query"](spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    expected = {}
    for d in docs:
        toks = tokenize_text(d.text)
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "spark" and toks[i + 1] == "join" and i % 2 == 0
        )
        if n:
            expected[d.doc_id] = n
    # engine returns top-10 by freq desc, doc_id asc
    want = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert rows == dict(want)


def test_naive_bayes_score_table_shape(spark):
    rows = Q["classify_naive_bayes"](spark, SF_DIR).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == {"q1", "q2", "q3"}
    for qid, rs in by_query.items():
        assert len(rs) == 5, (qid, rs)  # all five langs scored
        assert all(r.score < 0 for r in rs)  # log-probabilities
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)  # ranked per query


def test_knn_votes_sum_to_k(spark):
    rows = Q["classify_knn"](spark, SF_DIR).collect()
    assert sum(r.votes for r in rows) == 25


def test_ttl_and_tolerant_conservation(spark):
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    ttl = Q["ttl_expire_sweep"](spark, SF_DIR).collect()
    assert sum(r.n_expired + r.n_live for r in ttl) == n_orders

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    tol = Q["tolerant_update_errors"](spark, SF_DIR).collect()[0]
    assert tol.n_indexed + tol.n_errors == n_docs
    assert tol.first_error_id == 3
    assert tol.n_errors == sum(1 for i in range(n_docs) if i % 7 == 3)


def test_info_gain_bounds(spark):
    rows = Q["features_info_gain"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # IG is bounded by the class entropy (binary: <= ln 2)
        assert -1e-9 <= r.ig <= math.log(2) + 1e-9


def test_dfi_only_scores_above_expectation(spark):
    # Every contributing (doc, term) has freq > expected by construction;
    # a doc whose every query-term freq is at-or-below expectation must not
    # appear. Sanity: all scores strictly positive and descending.
    rows = Q["sim_dfi_chisq_topk"](spark, SF_DIR).collect()
    assert rows
    scores = [r.score for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_time_routed_partition_pruning(spark, tmp_path):
    """Writing month-routed partitions and querying one month must prune:
    the scan's partition filters restrict to the routed collection, the
    TimeRoutedAlias read path."""
    out = str(tmp_path / "orders_routed")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    (
        o.withColumn("route", F.date_format("o_orderdate", "yyyy-MM"))
        .write.partitionBy("route")
        .parquet(out)
    )
    routed = spark.read.parquet(out).filter(F.col("route") == "1997-03")
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1997-03" in plan, plan
    # and the result only contains that month
    months = [r.m for r in routed.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("m")).distinct().collect()]
    assert months == ["1997-03"]
